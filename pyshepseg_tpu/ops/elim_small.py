"""
Small-segment elimination on TPU — the algorithm's hot loop.

Replaces the reference's sequential merge machinery
(reference: pyshepseg/shepseg.py:918-1123) with per-pass data-parallel
segment reductions. This relies on a structural property of the reference
algorithm: within one pass at a given targetSize,

- merge *decisions* (findMergeSegment) are all taken against a frozen
  snapshot of segSize/spectSum (shepseg.py:983-986), and
- a merge target must be strictly larger than the merging segment
  (shepseg.py:1052), so the candidate set (size == targetSize) and target
  set (size > targetSize) are disjoint — no merge chains exist inside a
  pass, and applying the merges is commutative in seg/segSize/spectSum.

The sequential application order in the reference (shepseg.py:989-994)
therefore only affects the pixel ordering inside the merged segment's
location list, which in turn can only influence later tie-breaks between
exactly-equal spectral distances. We document two deviations:

1. ties between equal-distance neighbours are broken by smallest neighbour
   segment ID (the reference breaks them by pixel scan order of the
   segment's location list);
2. distances use float32 on device (the reference's numba code promotes to
   float64).

Both only matter on exact floating-point ties.

Per pass the kernel does: ONE gather of per-pixel segment means/sizes ->
shift-based (pad+slice, gather-free) 3x3 neighbour distance fields reduced
to a per-pixel minimum -> two per-segment min reductions (distance, then
tie-resolved neighbour ID) -> spectral-difference threshold -> gather remap
of labels + segment-sum updates of sizes/spectral sums. TPU scatters
(segment_min/_sum over megapixel index vectors) are the expensive
primitive, so the pixel-level pre-reduction that cuts them from 8 per pass
to 2 is the key optimisation; neighbour values come from shifts of the
already-gathered per-pixel fields rather than fresh gathers. Everything is
statically shaped (capacity = padded max segment count), so the whole
targetSize x pass loop nest compiles to one XLA program, and target sizes
with no candidate segments short-circuit in the while-loop condition.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .constants import SegIdType, SEGNULLVAL, MINSEGID
from .shifts import shift, offsets_for
from .segreduce import seg_sizes, seg_spectral_sums, relabel


def _merge_pass(seg, seg_size, spect_sum, target, max_diff_sqr,
                four_connected: bool):
    """One find+apply pass for segments of exactly ``target`` pixels."""
    h, w = seg.shape
    capacity = seg_size.shape[0]
    offsets = offsets_for(four_connected)
    inf = jnp.float32(jnp.inf)
    big_id = jnp.uint32(0xFFFFFFFF)

    ids = jnp.arange(capacity, dtype=jnp.uint32)
    is_cand = (seg_size == target) & (ids >= MINSEGID)

    # Per-segment mean spectra (frozen snapshot for the whole pass)
    safe_size = jnp.maximum(seg_size, 1).astype(jnp.float32)
    mean = spect_sum / safe_size[:, None]              # (capacity, nBands)

    seg_i = seg.astype(jnp.int32)
    mean_at = mean[seg_i]                              # (H, W, nBands)
    size_at = seg_size[seg_i]                          # (H, W)
    cand_at = (size_at == target) & (seg != SEGNULLVAL)

    # Per-pixel minimum over the neighbour offsets. Neighbour mean/size
    # fields are shifts (pad+slice) of the gathered per-pixel fields — no
    # further gathers. A given (seg, nbr) pair produces bit-identical d2 at
    # every pixel (same float expression on the same mean rows), so exact
    # equality against the per-segment minimum below recovers the full
    # (pixel, offset) argmin set.
    d2_fields = []
    nbr_fields = []
    for dy, dx in offsets:
        nbr = shift(seg, dy, dx, SEGNULLVAL)
        nbr_size = shift(size_at, dy, dx, jnp.uint32(0))
        nbr_mean = shift(mean_at, dy, dx, 0.0)
        ok = (cand_at & (nbr != seg) & (nbr != SEGNULLVAL) &
              (nbr_size > size_at))
        diff = mean_at - nbr_mean
        d2 = jnp.sum(diff * diff, axis=-1)
        d2_fields.append(jnp.where(ok, d2, inf))
        nbr_fields.append(jnp.where(ok, nbr, big_id))
    d2_px = functools.reduce(jnp.minimum, d2_fields)   # (H, W)
    nb_px = jnp.full((h, w), big_id, jnp.uint32)
    for d2, nbr in zip(d2_fields, nbr_fields):
        nb_px = jnp.minimum(nb_px, jnp.where(d2 == d2_px, nbr, big_id))

    # Two per-segment reductions: min distance, then smallest neighbour ID
    # among the (pixel, offset) pairs achieving it.
    flat_seg = seg_i.ravel()
    d_best = jax.ops.segment_min(d2_px.ravel(), flat_seg,
                                 num_segments=capacity)
    d_best_at = d_best[seg_i]
    nb_hit = jnp.where(d2_px == d_best_at, nb_px, big_id)
    best_nbr = jax.ops.segment_min(nb_hit.ravel(), flat_seg,
                                   num_segments=capacity)

    # Spectral-difference limit (reference: shepseg.py:1060-1061, strict >)
    merge_to = jnp.where(
        is_cand & (best_nbr != big_id) & (d_best <= max_diff_sqr),
        best_nbr, jnp.uint32(SEGNULLVAL)).astype(jnp.uint32)

    # Apply all merges at once (commutative: targets are never candidates)
    move = merge_to != SEGNULLVAL
    merge_map = jnp.where(move, merge_to, ids)
    seg_new = merge_map[seg_i]

    tgt = merge_to.astype(jnp.int32)
    moved_size = jnp.where(move, seg_size, 0).astype(jnp.uint32)
    inc_size = jax.ops.segment_sum(moved_size, tgt, num_segments=capacity)
    seg_size_new = seg_size - moved_size + inc_size

    moved_spect = jnp.where(move[:, None], spect_sum, 0.0)
    inc_spect = jax.ops.segment_sum(moved_spect, tgt, num_segments=capacity)
    spect_sum_new = spect_sum - moved_spect + inc_spect

    n_merged = move.sum().astype(jnp.uint32)
    return seg_new, seg_size_new, spect_sum_new, n_merged


def eliminate_small_segments_device(seg, img_f, seg_size, spect_sum,
                                    min_seg_size: int, max_spectral_diff,
                                    four_connected: bool):
    """
    Device: the full targetSize sweep (reference: shepseg.py:918-1000).

    For targetSize = 1 .. min_seg_size-1, run find+apply passes until the
    count of segments at that size stops changing (max 10 passes, matching
    the reference's MAXPASSES), then relabel to contiguous IDs.

    ``min_seg_size`` is static; ``max_spectral_diff`` is a traced float.
    Returns (relabelled seg, numEliminated).
    """
    capacity = seg_size.shape[0]
    max_diff_sqr = (jnp.float32(max_spectral_diff) ** 2)

    def count_at(seg_size, target):
        return jnp.count_nonzero(seg_size == target).astype(jnp.int32)

    def per_target(target, carry):
        seg, seg_size, spect_sum, num_elim = carry
        target_u = target.astype(jnp.uint32)

        def cond(c):
            _, _, _, count, prev, passes, _ = c
            # count == 0 short-circuit: a pass with no candidate segments is
            # the identity, so skipping it cannot change the result (the
            # reference would run the no-op pass; same fixpoint).
            return (count > 0) & (count != prev) & (passes < 10)

        def body(c):
            seg_c, size_c, spect_c, count, prev, passes, elim = c
            seg_n, size_n, spect_n, n = _merge_pass(
                seg_c, size_c, spect_c, target_u, max_diff_sqr,
                four_connected)
            return (seg_n, size_n, spect_n, count_at(size_n, target_u),
                    count, passes + 1, elim + n)

        init = (seg, seg_size, spect_sum, count_at(seg_size, target_u),
                jnp.int32(-1), jnp.int32(0), num_elim)
        seg, seg_size, spect_sum, _, _, _, num_elim = jax.lax.while_loop(
            cond, body, init)
        return seg, seg_size, spect_sum, num_elim

    seg, seg_size, spect_sum, num_elim = jax.lax.fori_loop(
        1, min_seg_size, per_target,
        (seg, seg_size, spect_sum, jnp.uint32(0)))

    seg = relabel(seg, seg_size, MINSEGID)
    return seg, num_elim


_elim_small_jit = jax.jit(
    eliminate_small_segments_device,
    static_argnames=("min_seg_size", "four_connected"))


def round_capacity(n: int) -> int:
    """Round a segment-count capacity up to a bucket to limit recompiles."""
    cap = 1024
    while cap < n:
        cap *= 2
    return cap


def eliminateSmallSegments(seg, img, maxSegId, minSegSize, maxSpectralDiff,
                           fourConnected=True, minSegId=MINSEGID):
    """
    Host API matching the reference signature (reference: shepseg.py:918).
    Modifies ``seg`` (numpy) in place; returns the number of segments
    eliminated.
    """
    if minSegSize <= 1:
        return 0
    capacity = round_capacity(int(maxSegId) + 1)
    seg_j = jnp.asarray(seg)
    img_f = jnp.asarray(np.ascontiguousarray(img)).astype(jnp.float32)
    seg_size = seg_sizes(seg_j, capacity)
    spect_sum = seg_spectral_sums(seg_j, img_f, capacity)
    seg_out, num_elim = _elim_small_jit(
        seg_j, img_f, seg_size, spect_sum,
        min_seg_size=int(minSegSize),
        max_spectral_diff=float(maxSpectralDiff),
        four_connected=bool(fourConnected))
    seg[...] = np.asarray(seg_out).astype(SegIdType)
    return int(num_elim)
