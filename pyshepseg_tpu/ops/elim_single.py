"""
Single-pixel elimination on TPU.

Replaces the reference's per-pixel scalar scan
(reference: pyshepseg/shepseg.py:572-736) with whole-image masked
neighbour-shift sweeps. The reference semantics are preserved exactly:

- a pass first *finds* all merges against a frozen snapshot of segSize,
  then applies them (mergeSinglePixels is find-all-then-apply, so one pass
  is embarrassingly parallel);
- a single pixel merges into the spectrally-nearest neighbouring *pixel*
  whose segment has size > 1, scanning the 3x3 window in row-major order
  and keeping the first strict minimum — reproduced here by stacking
  neighbour distances in the same scan order and taking the first argmin;
- passes repeat until no pixel is eliminated (a failed pixel can succeed
  later once a neighbouring singleton has grown).

Documented deviation: spectral distances are computed in float32 on device
(the reference's numba code uses int64/float64); argmin choices can differ
only when two neighbours are within float32 rounding of each other.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .constants import SegIdType, MINSEGID
from .shifts import shift, offsets_for
from .segreduce import relabel, band_planes


def _one_pass(band_planes, seg, seg_size, four_connected: bool):
    """One find-all-then-apply merge pass. Returns (seg', seg_size', nElim).

    ``band_planes`` is a tuple of 2D (H, W) float32 planes, NOT a
    (nBands, H, W) array: with the 3D form XLA's layout assignment can
    materialise a rematerialised copy with the nBands dim as the padded
    lane dimension (4 -> 128 lanes = 32x memory), which OOM'd large grown
    edge tiles. Neighbour distances are a RUNNING strict-< minimum
    (keeping the FIRST minimum in the reference's 3x3 scan order) instead
    of (K, H, W) stacks, bounding the pass to a few (H, W) buffers.
    """
    capacity = seg_size.shape[0]
    offsets = offsets_for(four_connected)
    inf = jnp.float32(jnp.inf)

    sizes_at = seg_size[seg.astype(jnp.int32)]   # the pass's only big gather
    single = sizes_at == 1

    best_d = jnp.full(seg.shape, inf)
    new_seg = jnp.zeros_like(seg)
    for dy, dx in offsets:
        nbr_seg = shift(seg, dy, dx, 0)
        # Neighbour's segment size as a shift of the gathered field; the
        # 0 fill keeps out-of-image neighbours ineligible (size 0 < 2).
        nbr_ok = shift(sizes_at, dy, dx, jnp.uint32(0)) > 1
        d2 = jnp.zeros(seg.shape, jnp.float32)
        for plane in band_planes:
            diff = plane - shift(plane, dy, dx, 0.0)
            d2 = d2 + diff * diff
        d2 = jnp.where(nbr_ok, d2, inf)
        better = d2 < best_d          # strict <: first minimum wins
        best_d = jnp.where(better, d2, best_d)
        new_seg = jnp.where(better, nbr_seg, new_seg)

    elim = single & jnp.isfinite(best_d)
    seg_out = jnp.where(elim, new_seg, seg)

    elim_flat = elim.ravel().astype(jnp.uint32)
    old_flat = seg.ravel().astype(jnp.int32)
    new_flat = seg_out.ravel().astype(jnp.int32)
    dec = jax.ops.segment_sum(elim_flat, old_flat, num_segments=capacity)
    inc = jax.ops.segment_sum(elim_flat, new_flat, num_segments=capacity)
    seg_size_out = seg_size - dec + inc
    return seg_out, seg_size_out, elim_flat.sum()


def eliminate_single_pixels_device(img_f, seg, seg_size,
                                   four_connected: bool):
    """
    Device: run merge passes to fixpoint, then relabel to contiguous IDs
    (the reference's eliminateSinglePixels driver, shepseg.py:572-615).
    ``img_f`` may be a (nBands, H, W) array or a tuple of (H, W) planes
    (preferred for large tiles — see _one_pass).

    Returns (relabelled seg, total number of pixels eliminated).
    """
    planes = band_planes(img_f)

    def cond(carry):
        return carry[3] > 0

    def body(carry):
        seg_c, size_c, total, _ = carry
        seg_n, size_n, n = _one_pass(planes, seg_c, size_c,
                                     four_connected)
        return seg_n, size_n, total + n, n

    seg, seg_size, total, _ = jax.lax.while_loop(
        cond, body, (seg, seg_size, jnp.uint32(0), jnp.uint32(1)))
    seg = relabel(seg, seg_size, MINSEGID)
    return seg, total


_elim_single_jit = jax.jit(eliminate_single_pixels_device,
                           static_argnames=("four_connected",))


def eliminateSinglePixels(img, seg, segSize, minSegId=MINSEGID,
                          maxSegId=None, fourConnected=True):
    """
    Host API matching the reference signature (reference: shepseg.py:572).
    Modifies ``seg`` (numpy) in place; ``segSize`` becomes stale, as in the
    reference. Returns the number of pixels eliminated.
    """
    seg_j = jnp.asarray(seg)
    img_f = jnp.asarray(np.ascontiguousarray(img)).astype(jnp.float32)
    size_j = jnp.asarray(np.asarray(segSize, dtype=np.uint32))
    seg_out, total = _elim_single_jit(img_f, seg_j, size_j,
                                      four_connected=bool(fourConnected))
    seg[...] = np.asarray(seg_out).astype(SegIdType)
    return int(total)
