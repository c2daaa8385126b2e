"""Pallas block-local CCL kernel: parity with the flood-fill oracle
(interpreted on the CPU test mesh; compiled on real TPU)."""

import numpy as np
import jax.numpy as jnp

from pyshepseg_tpu.ops.clump import clump, _clump_jit
from pyshepseg_tpu.ops.pallas_ccl import local_ccl_blocks
from oracle import oracle_clump


def _random_clusters(rng, shape, nclusters=4, null_frac=0.1):
    clusters = rng.integers(1, nclusters + 1, size=shape).astype(np.uint32)
    clusters[rng.random(shape) < null_frac] = 0
    return clusters


def test_pallas_seeded_clump_matches_oracle(rng):
    for shape in [(32, 32), (40, 56)]:
        for fourConnected in (True, False):
            clusters = _random_clusters(rng, shape)
            seg, nxt = clump(clusters, 0, fourConnected=fourConnected)
            ref, refnxt = oracle_clump(clusters, 0,
                                       fourConnected=fourConnected)
            assert nxt == refnxt
            np.testing.assert_array_equal(seg, ref)


def test_pallas_vs_plain_xla_path(rng):
    clusters = _random_clusters(rng, (48, 48), nclusters=3)
    img = jnp.asarray(clusters.astype(np.int32))
    seg_p, n_p, _ = _clump_jit(img, 0, four_connected=True,
                               use_pallas=True)
    seg_x, n_x, _ = _clump_jit(img, 0, four_connected=True,
                               use_pallas=False)
    assert int(n_p) == int(n_x)
    np.testing.assert_array_equal(np.asarray(seg_p), np.asarray(seg_x))


def test_local_ccl_blocks_multi_block(rng):
    # Components crossing block boundaries stay split locally but must be
    # locally minimal inside each block; after the global loop (via clump)
    # they merge. Exercise a 2x2 block grid explicitly.
    shape = (64, 64)
    clusters = np.ones(shape, dtype=np.int32)  # one global component
    lab = np.asarray(local_ccl_blocks(jnp.asarray(clusters), 0, True,
                                      block=32))
    # each block's labels all equal the block's top-left flat index
    for by in range(2):
        for bx in range(2):
            blockvals = lab[by * 32:(by + 1) * 32, bx * 32:(bx + 1) * 32]
            assert (blockvals == (by * 32) * 64 + bx * 32).all()
    # and the full clump merges them into a single segment
    seg, nxt = clump(clusters, 0, fourConnected=True)
    assert nxt == 2
    assert (seg == 1).all()
