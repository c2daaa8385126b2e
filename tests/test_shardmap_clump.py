"""Halo-exchange sharded clump (single image spread across the mesh by
rows) must match the flood-fill oracle and the single-device kernel."""

import numpy as np
import jax

from pyshepseg_tpu.parallel.shardmap_clump import clump_sharded
from pyshepseg_tpu.ops.clump import clump
from oracle import oracle_clump


def _case(rng, shape, nclusters=4, null_frac=0.08):
    img = rng.integers(1, nclusters + 1, size=shape).astype(np.int32)
    img[rng.random(shape) < null_frac] = 0
    return img


def test_sharded_matches_oracle(rng):
    assert len(jax.devices()) == 8
    for shape in [(64, 48), (40, 32)]:       # 64 rows = 8 per stripe
        for fourConnected in (True, False):
            img = _case(rng, shape)
            seg, num = clump_sharded(img, 0, fourConnected)
            ref, refNext = oracle_clump(img, 0, fourConnected)
            assert num == refNext - 1
            np.testing.assert_array_equal(seg, ref)


def test_sharded_uneven_rows(rng):
    # height not divisible by the device count -> internal padding
    img = _case(rng, (30, 40))
    seg, num = clump_sharded(img, 0, True)
    ref, refNext = oracle_clump(img, 0, True)
    assert num == refNext - 1
    np.testing.assert_array_equal(seg, ref)


def test_sharded_component_spanning_all_stripes(rng):
    # one vertical component through every stripe (worst-case propagation)
    img = np.zeros((64, 16), dtype=np.int32)
    img[:, :] = 2
    img[:, 8] = 1   # a full-height stripe-crossing line
    seg, num = clump_sharded(img, 0, True)
    ref, refNext = oracle_clump(img, 0, True)
    assert num == refNext - 1
    np.testing.assert_array_equal(seg, ref)
