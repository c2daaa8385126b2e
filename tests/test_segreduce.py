"""Tests for segment reductions, relabelling and CSR locations."""

import numpy as np

from pyshepseg_tpu.ops.segreduce import (
    makeSegSize, buildSegmentSpectra, relabelSegments,
    makeSegmentLocations)
from oracle import oracle_seg_size, oracle_relabel


def test_seg_size(rng):
    seg = rng.integers(0, 50, size=(30, 30)).astype(np.uint32)
    np.testing.assert_array_equal(makeSegSize(seg), oracle_seg_size(seg))


def test_spectral_sums(rng):
    seg = rng.integers(0, 20, size=(16, 16)).astype(np.uint32)
    img = rng.integers(0, 100, size=(3, 16, 16)).astype(np.int32)
    got = buildSegmentSpectra(seg, img, int(seg.max()))
    want = np.zeros((seg.max() + 1, 3), dtype=np.float32)
    for i in range(16):
        for j in range(16):
            want[seg[i, j]] += img[:, i, j]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_relabel(rng):
    seg = rng.integers(0, 30, size=(20, 20)).astype(np.uint32)
    # Knock out some IDs to create gaps
    for gone in (3, 7, 8, 15):
        seg[seg == gone] = 1
    segSize = makeSegSize(seg)
    ref = seg.copy()
    oracle_relabel(ref, segSize.copy(), 1)
    got = seg.copy()
    relabelSegments(got, segSize, 1)
    np.testing.assert_array_equal(got, ref)
    # labels contiguous
    used = np.unique(got[got > 0])
    np.testing.assert_array_equal(used, np.arange(1, len(used) + 1))


def _coherent_labels(rng, h, w, ncells=9):
    """Spatially-coherent label image (Voronoi cells), like real clump
    output — the structure the run-length reduction exploits."""
    centres = rng.uniform(0, [h, w], size=(ncells, 2))
    yy, xx = np.mgrid[0:h, 0:w]
    d = ((yy[..., None] - centres[:, 0]) ** 2 +
         (xx[..., None] - centres[:, 1]) ** 2)
    return (d.argmin(axis=-1) + 1).astype(np.uint32)


def test_runlength_sums_match_planes(rng):
    """The run-length compacted reduction must be bit-identical to the
    per-pixel scatter path while segment totals stay integer-exact in
    float32 (its gated regime)."""
    import jax.numpy as jnp
    from pyshepseg_tpu.ops.segreduce import (
        seg_sizes_and_spectral_sums_planes,
        seg_sizes_and_spectral_sums_runlength)
    h, w = 48, 64
    seg = _coherent_labels(rng, h, w)
    img = rng.integers(0, 256, size=(3, h, w)).astype(np.uint8)
    planes = tuple(jnp.asarray(img[b].astype(np.float32))
                   for b in range(3))
    seg_j = jnp.asarray(seg)
    capacity = 16
    want_size, want_spect = seg_sizes_and_spectral_sums_planes(
        seg_j, planes, capacity)
    got_size, got_spect, runs_max = seg_sizes_and_spectral_sums_runlength(
        seg_j, planes, capacity, run_cap=32)
    true_runs_max = max(1 + int((r[1:] != r[:-1]).sum()) for r in seg)
    assert int(runs_max) == true_runs_max
    assert true_runs_max <= 32, "test labels should fit the cap"
    np.testing.assert_array_equal(np.asarray(got_size),
                                  np.asarray(want_size))
    np.testing.assert_array_equal(np.asarray(got_spect),
                                  np.asarray(want_spect))


def test_runlength_sums_detects_row_overflow(rng):
    """A row with more runs than run_cap must be reported via the
    returned row max (the caller folds it into its overflow flag)."""
    import jax.numpy as jnp
    from pyshepseg_tpu.ops.segreduce import (
        seg_sizes_and_spectral_sums_runlength)
    h, w = 8, 64
    seg = ((np.arange(w)[None, :] + np.zeros((h, 1), int)) % 2 + 1)
    seg = seg.astype(np.uint32)        # alternating 1,2: w runs per row
    planes = (jnp.asarray(np.ones((h, w), np.float32)),)
    _, _, runs_max = seg_sizes_and_spectral_sums_runlength(
        jnp.asarray(seg), planes, 4, run_cap=16)
    assert int(runs_max) == w and w > 16


def test_runlength_reduce_and_remap(rng):
    """The fused clump-run reduction: sizes/sums keyed by the POST ids
    must match the plain scatter path, and the clump->post remap must
    match the full-image scatter construction it replaces."""
    import jax.numpy as jnp
    from pyshepseg_tpu.ops.segreduce import (
        seg_sizes_and_spectral_sums_planes, seg_reduce_and_remap_runlength)
    h, w = 48, 64
    seg_clump = _coherent_labels(rng, h, w, ncells=9)
    # a post-single-pixel-elim image: per-clump remap (some clumps
    # "absorbed" into others), constant across each clump
    true_map = np.arange(16, dtype=np.uint32)
    true_map[4] = 2
    true_map[7] = 1
    seg_post = true_map[seg_clump]
    img = rng.integers(0, 256, size=(2, h, w)).astype(np.uint8)
    planes = tuple(jnp.asarray(img[b].astype(np.float32))
                   for b in range(2))
    capacity = 16
    want_size, want_spect = seg_sizes_and_spectral_sums_planes(
        jnp.asarray(seg_post), planes, capacity)
    got_size, got_spect, remap0, runs_max = seg_reduce_and_remap_runlength(
        jnp.asarray(seg_clump), jnp.asarray(seg_post), planes, capacity,
        run_cap=32)
    np.testing.assert_array_equal(np.asarray(got_size),
                                  np.asarray(want_size))
    np.testing.assert_array_equal(np.asarray(got_spect),
                                  np.asarray(want_spect))
    want_remap = np.arange(capacity, dtype=np.uint32)
    present = np.unique(seg_clump)
    want_remap[present] = true_map[present]
    np.testing.assert_array_equal(np.asarray(remap0), want_remap)
    assert int(runs_max) <= 32


def test_runlength_gate():
    """The static dtype/width gate: exact int32 row cumsums only."""
    from pyshepseg_tpu.ops.segreduce import runlength_sums_ok
    assert runlength_sums_ok(np.uint8, 1024)
    assert runlength_sums_ok(np.uint16, 1024)
    assert runlength_sums_ok(np.int16, 1024)
    assert not runlength_sums_ok(np.uint32, 1024)   # may overflow int32
    assert not runlength_sums_ok(np.float32, 1024)  # not integer-exact
    assert not runlength_sums_ok(np.uint16, 1 << 16)  # row total overflow


def test_rl_cap_effective_gating():
    """_rlCapEffective: bucket passes through only when the dtype is
    exact AND the compaction shrinks the scatter (cap <= W/2)."""
    from pyshepseg_tpu.shepseg import _rlCapEffective
    assert _rlCapEffective(64, np.dtype(np.uint16), 1024) == 64
    assert _rlCapEffective(0, np.dtype(np.uint16), 1024) == 0
    assert _rlCapEffective(64, np.dtype(np.float32), 1024) == 0
    # cap > W/2: run path degenerates, use the direct scatter
    assert _rlCapEffective(512, np.dtype(np.uint8), 256) == 0


def test_segment_locations(rng):
    seg = rng.integers(0, 10, size=(12, 12)).astype(np.uint32)
    loc = makeSegmentLocations(seg)
    for sid in range(1, 10):
        rows, cols = loc.getSegmentIndices(sid)
        want_rows, want_cols = np.nonzero(seg == sid)
        np.testing.assert_array_equal(np.sort(rows), np.sort(want_rows))
        # scan order: nonzero already returns row-major order
        np.testing.assert_array_equal(rows, want_rows.astype(np.uint32))
        np.testing.assert_array_equal(cols, want_cols.astype(np.uint32))
        assert (sid in loc) == (len(rows) > 0)
