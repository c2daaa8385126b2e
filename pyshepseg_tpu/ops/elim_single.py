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
from .segreduce import seg_sizes, relabel


def _spectral_dist_fields(img_f, four_connected: bool):
    """
    (K, H, W) squared spectral distances to each 3x3 neighbour in scan
    order. Pass-invariant (the image never changes), so the fixpoint loop
    hoists this out and each pass only recomputes the masks.
    """
    dists = []
    for dy, dx in offsets_for(four_connected):
        d2 = jnp.zeros(img_f.shape[1:], jnp.float32)
        for b in range(img_f.shape[0]):
            diff = img_f[b] - shift(img_f[b], dy, dx, 0.0)
            d2 = d2 + diff * diff
        dists.append(d2)
    return jnp.stack(dists)


def _one_pass(dist_all, seg, seg_size, four_connected: bool):
    """One find-all-then-apply merge pass. Returns (seg', seg_size', nElim)."""
    capacity = seg_size.shape[0]
    offsets = offsets_for(four_connected)
    inf = jnp.float32(jnp.inf)

    sizes_at = seg_size[seg.astype(jnp.int32)]   # the pass's only big gather
    single = sizes_at == 1

    dists = []
    nbr_segs = []
    for k, (dy, dx) in enumerate(offsets):
        nbr_seg = shift(seg, dy, dx, 0)
        # Neighbour's segment size as a shift of the gathered field; the
        # 0 fill keeps out-of-image neighbours ineligible (size 0 < 2).
        nbr_ok = shift(sizes_at, dy, dx, jnp.uint32(0)) > 1
        dists.append(jnp.where(nbr_ok, dist_all[k], inf))
        nbr_segs.append(nbr_seg)

    dist_stack = jnp.stack(dists)        # (K, H, W), scan order
    seg_stack = jnp.stack(nbr_segs)      # (K, H, W)
    best_k = jnp.argmin(dist_stack, axis=0)   # first minimum wins (scan order)
    best_d = jnp.take_along_axis(dist_stack, best_k[None], axis=0)[0]
    new_seg = jnp.take_along_axis(seg_stack, best_k[None], axis=0)[0]

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

    Returns (relabelled seg, total number of pixels eliminated).
    """

    dist_all = _spectral_dist_fields(img_f, four_connected)

    def cond(carry):
        return carry[3] > 0

    def body(carry):
        seg_c, size_c, total, _ = carry
        seg_n, size_n, n = _one_pass(dist_all, seg_c, size_c, four_connected)
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
