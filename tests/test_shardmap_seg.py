"""Tests for the full row-sharded segmentation pipeline
(parallel/shardmap_seg): output must be bit-identical to the single-chip
pipeline on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyshepseg_tpu.parallel import shardmap_seg
from pyshepseg_tpu.parallel.pipeline import (segment_tile_jit,
                                             default_capacity)


def make_image(h, w, nbands, ncells, rng, salt=0.02, nullval=None,
               nullmargin=0):
    """Voronoi palette image + per-pixel salt so single-pixel and
    small-segment elimination both have work to do."""
    centres = rng.uniform(0, [h, w], size=(ncells, 2))
    yy, xx = np.mgrid[0:h, 0:w]
    d = ((yy[..., None] - centres[:, 0]) ** 2 +
         (xx[..., None] - centres[:, 1]) ** 2)
    cells = d.argmin(axis=-1)
    saltmask = rng.random((h, w)) < salt
    cells = np.where(saltmask, rng.integers(0, ncells, (h, w)), cells)
    palette = rng.integers(10, 900, size=(ncells, nbands))
    img = palette[cells].transpose(2, 0, 1).astype(np.uint16)
    centers = palette.astype(np.float32)
    if nullval is not None and nullmargin:
        img[:, :nullmargin, :] = nullval
        img[:, :, -nullmargin:] = nullval
    return img, centers


def run_single_chip(img, centers, nullval, maxdiff, min_seg_size,
                    four_connected):
    h, w = img.shape[1:]
    has_null = nullval is not None
    seg, maxid = segment_tile_jit(
        jnp.asarray(img), jnp.asarray(centers),
        jnp.float32(nullval if has_null else 0), jnp.float32(maxdiff),
        min_seg_size=min_seg_size, four_connected=four_connected,
        has_null=has_null, capacity=default_capacity(h, w))
    return np.asarray(seg), int(maxid)


def test_sharded_matches_single_chip_4conn(rng):
    img, centers = make_image(96, 80, 3, 25, rng)
    want, want_max = run_single_chip(img, centers, None, 1e9, 12, True)
    got, got_max = shardmap_seg.segment_image_sharded(
        img, centers, imgNullVal=None, maxSpectralDiff=1e9,
        minSegmentSize=12, fourConnected=True)
    np.testing.assert_array_equal(want, got)
    assert want_max == got_max


def test_sharded_matches_single_chip_8conn_nulls_and_limit(rng):
    # 90 rows does not divide the 8-device mesh: exercises null-row
    # padding; the tight maxSpectralDiff blocks some merges on both paths
    img, centers = make_image(90, 64, 4, 20, rng, nullval=9999,
                              nullmargin=4)
    want, want_max = run_single_chip(img, centers, 9999, 150.0, 10, False)
    got, got_max = shardmap_seg.segment_image_sharded(
        img, centers, imgNullVal=9999, maxSpectralDiff=150.0,
        minSegmentSize=10, fourConnected=False)
    np.testing.assert_array_equal(want, got)
    assert want_max == got_max


def test_sharded_unbounded_merge_default(rng):
    # maxSpectralDiff=None must behave as "no limit" (reference's
    # None -> 10x max semantics are unbounded in practice)
    img, centers = make_image(96, 48, 3, 12, rng)
    want, _ = run_single_chip(img, centers, None, 1e12, 8, True)
    got, _ = shardmap_seg.segment_image_sharded(
        img, centers, imgNullVal=None, maxSpectralDiff=None,
        minSegmentSize=8, fourConnected=True)
    np.testing.assert_array_equal(want, got)


def test_sharded_rejects_nondividing_height_without_null(rng):
    img, centers = make_image(90, 48, 3, 10, rng)
    with pytest.raises(ValueError):
        shardmap_seg.segment_image_sharded(
            img, centers, imgNullVal=None, maxSpectralDiff=1e9,
            minSegmentSize=8, fourConnected=True)


@pytest.mark.parametrize("seed,fourconn,withnull,maxdiff", [
    (101, True, False, 1e9),
    (102, False, False, 1e9),
    (103, True, True, 1e9),
    (104, False, True, 200.0),
    (105, True, False, 120.0),
    (106, False, False, 250.0),
])
def test_sharded_differential_sweep(seed, fourconn, withnull, maxdiff):
    """Multi-seed sweep of the row-sharded pipeline against the
    single-chip program: random Voronoi content, both connectivities,
    nulls, bounded and unbounded spectral limits. The shape is held
    fixed so the sweep reuses two compiled program pairs."""
    rng = np.random.default_rng(seed)
    nullval = 7777 if withnull else None
    img, centers = make_image(96, 64, 3, 25, rng, nullval=nullval,
                              nullmargin=3 if withnull else 0)
    want, want_max = run_single_chip(img, centers, nullval, maxdiff,
                                     10, fourconn)
    got, got_max = shardmap_seg.segment_image_sharded(
        img, centers, imgNullVal=nullval, maxSpectralDiff=maxdiff,
        minSegmentSize=10, fourConnected=fourconn)
    np.testing.assert_array_equal(want, got)
    assert want_max == got_max


def test_sharded_driver_matches_single_chip_driver(rng):
    """doShepherdSegmentationSharded vs shepseg.doShepherdSegmentation:
    the full drop-in driver incl. the k-means fit (fixed init -> both
    drivers fit identical centres) and the SegmentationResult fields."""
    from pyshepseg_tpu import shepseg
    img, _ = make_image(96, 64, 3, 18, rng)
    want = shepseg.doShepherdSegmentation(
        img, numClusters=12, clusterSubsamplePcnt=100, minSegmentSize=10,
        maxSpectralDiff='auto', fourConnected=True, fixedKMeansInit=True)
    got = shardmap_seg.doShepherdSegmentationSharded(
        img, numClusters=12, clusterSubsamplePcnt=100, minSegmentSize=10,
        maxSpectralDiff='auto', fourConnected=True, fixedKMeansInit=True)
    np.testing.assert_array_equal(want.segimg, got.segimg)
    assert want.maxSpectralDiff == got.maxSpectralDiff
    assert want.singlePixelsEliminated == got.singlePixelsEliminated
    assert want.smallSegmentsEliminated == got.smallSegmentsEliminated
    assert want.elimPasses == got.elimPasses
