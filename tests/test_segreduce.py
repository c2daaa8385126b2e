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
