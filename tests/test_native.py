"""Native C++ host kernels: flood-fill clump (incl. MAX_CLUMP_SIZE cap
parity) and first-encounter subset recode."""

import numpy as np

from pyshepseg_tpu import native
from pyshepseg_tpu.ops.clump import clump
from oracle import oracle_clump


def test_native_library_builds():
    # The environment ships g++, so the native tier must actually build;
    # the pure-Python fallback is for end-user machines without it.
    assert native.available()


def test_flood_fill_matches_oracle_uncapped(rng):
    img = rng.integers(0, 4, size=(37, 53)).astype(np.int32)
    img[rng.random(img.shape) < 0.1] = -1
    for fourConnected in (True, False):
        got, gotNext = native.flood_fill_clump(img, -1, fourConnected)
        ref, refNext = oracle_clump(img, -1, fourConnected)
        assert gotNext == refNext
        np.testing.assert_array_equal(got, ref)


def test_flood_fill_cap_matches_oracle(rng):
    # One big uniform area must split identically under the cap
    img = np.zeros((40, 40), dtype=np.int32)
    got, gotNext = native.flood_fill_clump(img, -1, True, maxClumpSize=100)
    ref, refNext = oracle_clump(img, -1, True, maxClumpSize=100)
    assert gotNext == refNext
    assert gotNext > 2  # the cap actually split it
    np.testing.assert_array_equal(got, ref)


def test_clump_host_api_cap_kwarg(rng):
    img = rng.integers(0, 3, size=(24, 24)).astype(np.int32)
    seg, nxt = clump(img, -1, fourConnected=True, maxClumpSize=50)
    ref, refNext = oracle_clump(img, -1, True, maxClumpSize=50)
    assert nxt == refNext
    np.testing.assert_array_equal(seg, ref)


def test_python_fallback_matches_native(rng):
    img = rng.integers(0, 3, size=(20, 20)).astype(np.int32)
    gotN, nextN = native.flood_fill_clump(img, -1, True, maxClumpSize=30)
    out = np.zeros(img.shape, dtype=np.uint32)
    gotP, nextP = native._flood_fill_py(img, -1, True, 30, 1, out)
    assert nextN == nextP
    np.testing.assert_array_equal(gotN, gotP)


def test_subset_recode_first_encounter(rng):
    tile1 = np.array([[5, 5, 9], [0, 9, 2]], dtype=np.uint32)
    tile2 = np.array([[2, 7, 5], [7, 0, 0]], dtype=np.uint32)
    lut = np.zeros(16, dtype=np.uint32)
    hist = np.zeros(16, dtype=np.uint64)
    out1, nxt = native.subset_recode(tile1, None, lut, 1, hist)
    out2, nxt = native.subset_recode(tile2, None, lut, nxt, hist)
    # first-encounter order across tiles: 5 -> 1, 9 -> 2, 2 -> 3, 7 -> 4
    np.testing.assert_array_equal(out1, [[1, 1, 2], [0, 2, 3]])
    np.testing.assert_array_equal(out2, [[3, 4, 1], [4, 0, 0]])
    assert nxt == 5
    assert hist[1] == 3 and hist[2] == 2 and hist[3] == 2 and hist[4] == 2


def test_subset_recode_mask(rng):
    tile = np.array([[4, 4], [6, 6]], dtype=np.uint32)
    mask = np.array([[1, 0], [0, 1]], dtype=np.uint8)
    lut = np.zeros(8, dtype=np.uint32)
    hist = np.zeros(8, dtype=np.uint64)
    out, nxt = native.subset_recode(tile, mask, lut, 1, hist)
    np.testing.assert_array_equal(out, [[1, 0], [0, 2]])
    assert nxt == 3


def test_missing_source_falls_back(monkeypatch, rng):
    # Installed environments without the .cpp (or without g++) must get
    # the pure-Python fallback, not a crash.
    monkeypatch.setattr(native, "_SRC", "/nonexistent/ccl.cpp")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_error", None)
    assert native.available() is False
    img = rng.integers(0, 3, size=(12, 12)).astype(np.int32)
    got, nxt = native.flood_fill_clump(img, -1, True, maxClumpSize=20)
    ref, refNext = oracle_clump(img, -1, True, maxClumpSize=20)
    assert nxt == refNext
    np.testing.assert_array_equal(got, ref)
    # subset_recode fallback too
    lut = np.zeros(8, dtype=np.uint32)
    hist = np.zeros(8, dtype=np.uint64)
    out, nid = native.subset_recode(
        np.array([[2, 2], [1, 0]], dtype=np.uint32), None, lut, 1, hist)
    np.testing.assert_array_equal(out, [[1, 1], [2, 0]])
    assert nid == 3
