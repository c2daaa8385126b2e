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
