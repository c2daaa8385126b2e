"""
Fully-fused on-device segmentation pipeline.

The host-orchestrated path (pyshepseg_tpu.shepseg.doShepherdSegmentation)
syncs between stages so it can bucket per-segment array capacities from the
observed clump count. This module instead compiles the ENTIRE per-tile
pipeline — cluster assignment -> connected-component clumping ->
single-pixel elimination -> small-segment elimination -> relabel — into one
XLA program with a static segment capacity, eliminating every host
round-trip. This is the unit of work the CONC_MESH backend runs on each
chip of a TPU mesh, and what __graft_entry__ exposes for compile checks.

Mirrors reference behaviour end to end
(reference: pyshepseg/shepseg.py:130-249).
"""

import functools

import jax
import jax.numpy as jnp

from ..ops.constants import SEGNULLVAL, MINSEGID
from ..ops.kmeans import _assign_scores
from ..ops.clump import clump_labels
from ..ops.segreduce import (seg_sizes, seg_spectral_sums_planes,
                             band_planes)
from ..ops.elim_single import eliminate_single_pixels_device
from ..ops.elim_small import eliminate_small_segments_device, round_capacity


def assign_clusters(img_f, centers, img_null_val, has_null: bool):
    """
    Device: per-pixel nearest-centre cluster IDs starting at 1; pixels with
    the null value in any band become SEGNULLVAL
    (reference: shepseg.py:317-361).

    img_f: (nBands, H, W) float32; centers: (K, nBands) float32.
    """
    nbands, h, w = img_f.shape
    x = img_f.reshape(nbands, h * w).T
    labels = jnp.argmin(_assign_scores(x, centers), axis=1).astype(
        jnp.uint32) + MINSEGID
    labels = labels.reshape(h, w)
    if has_null:
        nullmask = jnp.any(img_f == img_null_val, axis=0)
        labels = jnp.where(nullmask, jnp.uint32(SEGNULLVAL), labels)
    return labels


def segment_tile(img_f, centers, img_null_val, max_spectral_diff,
                 min_seg_size: int, four_connected: bool, has_null: bool,
                 capacity: int):
    """
    Device: the full Shepherd pipeline on one tile, one XLA program.

    Parameters (static: min_seg_size, four_connected, has_null, capacity)
    ----------
    img_f : (nBands, H, W) float32
    centers : (K, nBands) float32 fitted cluster centres
    img_null_val : float32 scalar (ignored when has_null is False)
    max_spectral_diff : float32 scalar (resolve 'auto' on host via
        shepseg.autoMaxSpectralDiff before calling)
    capacity : static upper bound on segment count + 1 (use
        round_capacity(H*W+1) when unsure)

    Returns (seg uint32 (H, W), maxSegId uint32).
    """
    clusters = assign_clusters(img_f, centers, img_null_val, has_null)
    seg, _ = clump_labels(clusters.astype(jnp.int32), SEGNULLVAL,
                          four_connected=four_connected)
    # per-band planes: avoids band-minor layout copies on large tiles
    planes = band_planes(img_f)
    size = seg_sizes(seg, capacity)
    seg, _ = eliminate_single_pixels_device(planes, seg, size,
                                            four_connected)
    size = seg_sizes(seg, capacity)
    spect = seg_spectral_sums_planes(seg, planes, capacity)
    # e_cap = 8 * capacity can never overflow here: capacity is bucketed
    # from H*W+1 and unique adjacencies are bounded by 4*H*W
    seg, _, _ = eliminate_small_segments_device(
        seg, size, spect, min_seg_size, max_spectral_diff, four_connected)
    return seg, jnp.max(seg)


segment_tile_jit = jax.jit(
    segment_tile,
    static_argnames=("min_seg_size", "four_connected", "has_null",
                     "capacity"))


def default_capacity(h: int, w: int) -> int:
    """Safe static capacity for a tile of the given shape."""
    return round_capacity(h * w + 1)


@functools.partial(
    jax.jit,
    static_argnames=("min_seg_size", "four_connected", "has_null",
                     "capacity"))
def segment_tiles_vmapped(imgs_f, centers, img_null_val, max_spectral_diff,
                          min_seg_size: int, four_connected: bool,
                          has_null: bool, capacity: int):
    """
    Device: a batch of tiles (B, nBands, H, W) through the full pipeline
    with vmap — used per device inside the mesh backend (the while-loops
    run lock-step until every tile in the batch converges).

    Returns (segs uint32 (B, H, W), maxSegIds uint32 (B,)).
    """

    def one(img_f):
        return segment_tile(img_f, centers, img_null_val,
                            max_spectral_diff, min_seg_size,
                            four_connected, has_null, capacity)

    return jax.vmap(one)(imgs_f)
