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

TPU-native formulation — GRAPH space, not image space
-----------------------------------------------------
The reference rescans segment pixels and their 3x3 windows every pass. A
dense whole-image pass on TPU costs O(H*W) regardless of how few candidate
segments exist, and the targetSize x fixpoint loop nest runs hundreds of
passes. Key observation: segments only ever merge, so the *current*
segment adjacency is the image's original adjacency pushed through an
id-remap (orig id -> current id). We therefore:

1. extract the unique segment-adjacency edge list from the image ONCE
   (shift comparisons -> lexicographic sort -> run-length dedupe), sized
   by a host-bucketed edge capacity;
2. run every find+apply pass purely on (numEdges,) and (capacity,) arrays:
   remap edge endpoints, per-edge mean distances, two segment_min
   reductions, merge application as capacity-sized scatter-adds, and a
   remap composition (remap = mergeMap[remap]);
3. rewrite the segment image with a single gather at the very end,
   followed by the contiguous relabel.

Per-pass cost goes from O(H*W) to O(E) with E ~ 6 * numSegments (grid
adjacency is near-planar), independent of tile size.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .constants import SegIdType, SEGNULLVAL, MINSEGID
from .shifts import shift, offsets_for
from .segreduce import seg_sizes, seg_spectral_sums, relabel


def round_capacity(n: int) -> int:
    """Round a segment-count capacity up to a bucket to limit recompiles."""
    cap = 1024
    while cap < n:
        cap *= 2
    return cap


def round_capacity_fine(n: int) -> int:
    """
    Quarter-step capacity buckets: {1, 1.25, 1.5, 1.75} x 2^k. The
    elimination loop's per-pass cost is ~linear in the EDGE capacity
    (every pass gathers ~12 edge-sized vectors), so power-of-two buckets
    waste up to 2x gather volume where quarter-steps waste at most 1.25x
    — at the price of up to 4x more distinct compiled programs (paid
    once per bucket, persistently cached).
    """
    cap = 1024
    while cap < n:
        cap *= 2
    if cap == 1024:
        return cap
    # frac=4 (cap/2) can never satisfy fine >= n: the doubling loop
    # exits only once cap >= n with cap/2 < n.
    for frac in (5, 6, 7):
        fine = (cap // 8) * frac
        if fine >= n:
            return fine
    return cap


def edge_sort_keys(seg, four_connected: bool):
    """
    Device: sorted canonical (min id, max id) segment-adjacency pairs from
    a segment image, one per adjacent pixel pair (duplicates included),
    plus the number of unique pairs. Padding/invalid slots sort to the
    end as (0xFFFFFFFF, 0xFFFFFFFF).
    """
    offsets = [(dy, dx) for dy, dx in offsets_for(four_connected)
               if (dy, dx) in ((0, 1), (1, 0), (1, 1), (1, -1))]
    pad = jnp.uint32(0xFFFFFFFF)
    a_parts, b_parts = [], []
    for dy, dx in offsets:
        nbr = shift(seg, dy, dx, SEGNULLVAL)
        ok = (seg != SEGNULLVAL) & (nbr != SEGNULLVAL) & (nbr != seg)
        lo = jnp.minimum(seg, nbr)
        hi = jnp.maximum(seg, nbr)
        a_parts.append(jnp.where(ok, lo, pad).ravel())
        b_parts.append(jnp.where(ok, hi, pad).ravel())
    a = jnp.concatenate(a_parts)
    b = jnp.concatenate(b_parts)
    a, b = jax.lax.sort((a, b), num_keys=2)
    first = (a != pad) & ((jnp.arange(a.shape[0]) == 0) |
                          (a != jnp.roll(a, 1)) | (b != jnp.roll(b, 1)))
    n_unique = jnp.sum(first.astype(jnp.uint32))
    return a, b, first, n_unique


_edge_sort_jit = jax.jit(edge_sort_keys, static_argnames=("four_connected",))


def edge_sort_keys_compact(seg, four_connected: bool, b_cap: int,
                           id_bound: int):
    """
    Device: edge_sort_keys with the valid boundary pairs scatter-compacted
    into a static (b_cap,) buffer BEFORE sorting. The O(H*W)-key sort —
    the most expensive single op in the one-shot pipeline (~14 ms per
    Mpix on a v5e, two-key over 2 (4-conn) or 4 (8-conn) candidates per
    pixel, almost all of them padding) — becomes an O(b_cap) sort plus a
    cumsum and one full-size scatter, both bandwidth-priced.

    ``b_cap`` (static) is a speculative bucket for the boundary-pair
    count (pairs of adjacent pixels in DIFFERENT non-null segments,
    duplicates included — the segments' total shared perimeter). The
    measured count comes back as ``n_pairs``; n_pairs > b_cap means
    pairs were dropped and the caller MUST treat every output as
    overflowed (the one-shot dispatch folds this into its overflow flag
    and falls back to the measured path, exactly like the capacity and
    e_cap buckets).

    When ``id_bound`` <= 2^16 each canonical (lo, hi) pair packs into
    one uint32 (lo < hi strictly, so the 0xFFFFFFFF padding can never
    collide with a real pair) and the scatter and sort run single-key;
    otherwise the endpoints compact separately and sort two-key.

    Returns (a, b, first, n_unique, n_pairs) with a/b/first of length
    b_cap — same contract as edge_sort_keys plus the pair count.
    """
    offsets = [(dy, dx) for dy, dx in offsets_for(four_connected)
               if (dy, dx) in ((0, 1), (1, 0), (1, 1), (1, -1))]
    pad = jnp.uint32(0xFFFFFFFF)
    packed = id_bound <= (1 << 16)
    a_parts, b_parts = [], []
    for dy, dx in offsets:
        nbr = shift(seg, dy, dx, SEGNULLVAL)
        ok = (seg != SEGNULLVAL) & (nbr != SEGNULLVAL) & (nbr != seg)
        lo = jnp.minimum(seg, nbr)
        hi = jnp.maximum(seg, nbr)
        if packed:
            a_parts.append(jnp.where(ok, (lo << 16) | hi, pad).ravel())
        else:
            a_parts.append(jnp.where(ok, lo, pad).ravel())
            b_parts.append(jnp.where(ok, hi, pad).ravel())
    a = jnp.concatenate(a_parts)
    valid = a != pad
    n_pairs = jnp.sum(valid.astype(jnp.uint32))
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    # invalid slots -> index b_cap (sliced off); valid slots past the
    # bucket scatter out of range and drop — n_pairs > b_cap flags it
    pos = jnp.where(valid, pos, b_cap)
    if packed:
        keys = jnp.full((b_cap + 1,), pad, jnp.uint32).at[pos].set(
            a, mode="drop")[:b_cap]
        keys = jax.lax.sort(keys)
        ca, cb = keys >> 16, keys & jnp.uint32(0xFFFF)
        ok_row = keys != pad
        neq = keys != jnp.roll(keys, 1)
    else:
        b = jnp.concatenate(b_parts)
        ca = jnp.full((b_cap + 1,), pad, jnp.uint32).at[pos].set(
            a, mode="drop")[:b_cap]
        cb = jnp.full((b_cap + 1,), pad, jnp.uint32).at[pos].set(
            b, mode="drop")[:b_cap]
        ca, cb = jax.lax.sort((ca, cb), num_keys=2)
        ok_row = ca != pad
        neq = (ca != jnp.roll(ca, 1)) | (cb != jnp.roll(cb, 1))
    first = ok_row & ((jnp.arange(b_cap) == 0) | neq)
    n_unique = jnp.sum(first.astype(jnp.uint32))
    return ca, cb, first, n_unique, n_pairs


def compact_edges(a, b, first, e_cap: int, id_bound: int = None):
    """
    Device: scatter the flagged unique pairs into fixed-size (e_cap,)
    endpoint arrays (undirected, canonical lo/hi order). Unused slots are
    (0, 0), which the pass masks out via the null-segment check.

    ``id_bound`` (static, optional): a bound on the endpoint IDs. When
    it fits 16 bits the two endpoints pack into ONE uint32 scatter
    instead of two — the scatter runs over the full-size sorted arrays
    (O(H*W) elements), so halving it saves real milliseconds per tile.
    """
    pos = jnp.cumsum(first.astype(jnp.int32)) - 1
    pos = jnp.where(first, pos, e_cap)  # dump non-unique past the end
    if id_bound is not None and id_bound <= (1 << 16):
        packed = (a << 16) | (b & jnp.uint32(0xFFFF))
        keys = jnp.zeros(e_cap + 1, jnp.uint32).at[pos].set(
            packed, mode="drop")[:e_cap]
        return keys >> 16, keys & jnp.uint32(0xFFFF)
    ea = jnp.zeros(e_cap + 1, jnp.uint32).at[pos].set(
        a, mode="drop").astype(jnp.uint32)[:e_cap]
    eb = jnp.zeros(e_cap + 1, jnp.uint32).at[pos].set(
        b, mode="drop")[:e_cap]
    return ea, eb


def _merge_pass_edges(ids2, remap, seg_size, spect_bm, target,
                      max_diff_sqr):
    """
    One find+apply pass for segments of exactly ``target`` pixels, on the
    segment-adjacency graph. ``ids2`` is the pre-concatenated (2E,)
    ORIGINAL endpoint vector [ea | eb] (hoisted out of the loop by the
    caller); remap maps original id -> current id. Mirrors reference
    findMergeSegment + doMerge (shepseg.py:1003-1123) semantics on frozen
    per-pass state.

    Gather economy is the whole game here (each pass runs ~40+ times per
    tile and a gather's fixed cost dominates at these sizes — measured):

    - ONE (2E,) gather maps both endpoints through remap;
    - ONE stacked gather reads size + every band sum for both endpoints:
      the per-segment state is stacked as a (nBands+1, capacity) table
      (big dim minor, lane-friendly) and gathered along the minor axis —
      a multi-row gather costs the same as a single-row one (measured:
      2.9 vs 2.7 ms at 16K indices for 8 rows vs 1);
    - ONE more (2E,) gather reads back the per-segment best distance.

    Sizes ride the float32 table: candidacy (size == target) stays exact
    for ANY size (an integer < 2^24 is exactly representable; one >= 2^24
    can never round to a small target), and the strictly-larger test
    compares a candidate's exact small size with a neighbour whose
    rounded size only moves toward other >= 2^24 values. The mean
    arithmetic (sum / size in float32) is bit-identical to before.
    """
    capacity = seg_size.shape[0]
    E2 = ids2.shape[0]
    E = E2 // 2
    inf = jnp.float32(jnp.inf)
    big_id = jnp.uint32(0xFFFFFFFF)
    ids = jnp.arange(capacity, dtype=jnp.uint32)

    is_cand = (seg_size == target) & (ids >= MINSEGID)
    ftarget = target.astype(jnp.float32)

    cur2 = remap[ids2].astype(jnp.int32)                # (2E,) gather #1
    cur_a, cur_b = cur2[:E], cur2[E:]
    live = (cur_a != cur_b) & (cur_a != SEGNULLVAL) & (cur_b != SEGNULLVAL)

    # Stacked per-segment state table: row 0 = size (f32), rows 1.. =
    # band sums. One gather serves every per-endpoint read.
    table = jnp.stack((seg_size.astype(jnp.float32),) + spect_bm)
    g2 = table[:, cur2]                                 # gather #2
    size2 = g2[0]
    size_a, size_b = size2[:E], size2[E:]
    cand_a = (size_a == ftarget) & (cur_a >= MINSEGID)
    cand_b = (size_b == ftarget) & (cur_b >= MINSEGID)
    # division (not reciprocal-multiply) keeps the arithmetic identical
    # to the original mean = sum/size formulation
    fsize2 = jnp.maximum(size2, 1.0)
    means = g2[1:] / fsize2                             # (nBands, 2E)
    diff = means[:, :E] - means[:, E:]
    d2u = jnp.sum(diff * diff, axis=0)

    ok_ab = live & cand_a & (size_b > size_a)        # a merges into b
    ok_ba = live & cand_b & (size_a > size_b)        # b merges into a
    d2 = jnp.concatenate([jnp.where(ok_ab, d2u, inf),
                          jnp.where(ok_ba, d2u, inf)])
    nbr = jnp.concatenate([
        jnp.where(ok_ab, cur_b.astype(jnp.uint32), big_id),
        jnp.where(ok_ba, cur_a.astype(jnp.uint32), big_id)])

    d_best = jax.ops.segment_min(d2, cur2, num_segments=capacity)
    nb_hit = jnp.where(d2 == d_best[cur2], nbr, big_id)  # gather #3
    best_nbr = jax.ops.segment_min(nb_hit, cur2, num_segments=capacity)

    # Spectral-difference limit (reference: shepseg.py:1060-1061, strict >)
    merge_to = jnp.where(
        is_cand & (best_nbr != big_id) & (d_best <= max_diff_sqr),
        best_nbr, jnp.uint32(SEGNULLVAL)).astype(jnp.uint32)

    # Apply all merges at once (commutative: targets are never candidates)
    move = merge_to != SEGNULLVAL
    merge_map = jnp.where(move, merge_to, ids)
    remap_new = merge_map[remap.astype(jnp.int32)]

    tgt = merge_to.astype(jnp.int32)
    moved_size = jnp.where(move, seg_size, 0).astype(jnp.uint32)
    inc_size = jax.ops.segment_sum(moved_size, tgt, num_segments=capacity)
    seg_size_new = seg_size - moved_size + inc_size

    # one multi-channel capacity-sized scatter updates every band sum
    moved_bm = jnp.where(move[None, :], jnp.stack(spect_bm), 0.0)
    inc_bm = jax.ops.segment_sum(moved_bm.T, tgt,
                                 num_segments=capacity).T
    spect_stack = jnp.stack(spect_bm) - moved_bm + inc_bm
    spect_bm_new = tuple(spect_stack[i] for i in range(len(spect_bm)))

    n_merged = move.sum().astype(jnp.uint32)
    return remap_new, seg_size_new, spect_bm_new, n_merged


def eliminate_small_segments_graph(ea, eb, seg_size, spect_sum,
                                   min_seg_size: int, max_spectral_diff,
                                   remap_init=None):
    """
    Device: the full targetSize sweep (reference: shepseg.py:918-1000) on
    the adjacency graph. For targetSize = 1 .. min_seg_size-1, run
    find+apply passes until the count of segments at that size stops
    changing (max 10 passes, matching the reference's MAXPASSES); target
    sizes with no candidates short-circuit (a candidate-free pass is the
    identity, so the fixpoint is unchanged).

    Returns (remap original->current id, seg_size, numEliminated,
    totalPasses) — totalPasses counts every executed find+apply pass
    across all target sizes (each pass streams the edge arrays ~10x;
    the perf-relevant loop count, reported by bench).
    """
    capacity = seg_size.shape[0]
    max_diff_sqr = (jnp.float32(max_spectral_diff) ** 2)
    # ``remap_init`` lets the caller run the loop on a PRE-CONTRACTION
    # edge list: ea/eb may be adjacencies of an earlier labelling (e.g.
    # the raw clump image) with remap_init mapping those ids to current
    # ones — contracted duplicate pairs are harmless (the pass min-
    # reduces per pair). seg_size/spect_sum are indexed by CURRENT ids.
    remap0 = (jnp.arange(capacity, dtype=jnp.uint32)
              if remap_init is None else remap_init.astype(jnp.uint32))
    # band-major tuple of (capacity,) vectors for lane-friendly gathers
    # in the pass (see _merge_pass_edges)
    spect_bm = tuple(spect_sum[:, i] for i in range(spect_sum.shape[1]))
    # both endpoint vectors concatenated ONCE, outside every pass
    ids2 = jnp.concatenate([ea, eb]).astype(jnp.int32)

    def count_at(seg_size, target):
        return jnp.count_nonzero(seg_size == target).astype(jnp.int32)

    def per_target(target, carry):
        remap, seg_size, spect_bm, num_elim, total_passes = carry
        target_u = target.astype(jnp.uint32)

        def cond(c):
            _, _, _, count, prev, passes, _ = c
            return (count > 0) & (count != prev) & (passes < 10)

        def body(c):
            remap_c, size_c, spect_c, count, prev, passes, elim = c
            remap_n, size_n, spect_n, n = _merge_pass_edges(
                ids2, remap_c, size_c, spect_c, target_u, max_diff_sqr)
            return (remap_n, size_n, spect_n, count_at(size_n, target_u),
                    count, passes + 1, elim + n)

        init = (remap, seg_size, spect_bm, count_at(seg_size, target_u),
                jnp.int32(-1), jnp.int32(0), num_elim)
        (remap, seg_size, spect_bm, _, _, passes,
         num_elim) = jax.lax.while_loop(cond, body, init)
        return remap, seg_size, spect_bm, num_elim, total_passes + passes

    remap, seg_size, spect_bm, num_elim, total_passes = jax.lax.fori_loop(
        1, min_seg_size, per_target,
        (remap0, seg_size, spect_bm, jnp.uint32(0), jnp.int32(0)))
    return remap, seg_size, num_elim, total_passes


def _remap_and_relabel(seg, remap, seg_size_out):
    """
    Device: apply the orig->current id remap and the contiguous relabel
    with ONE full-image gather. relabel subtracts per *current* id, so
    the two maps compose into a single capacity-sized table:
    table[orig] = remap[orig] - sub[remap[orig]].
    """
    from .segreduce import relabel_subtract
    sub = relabel_subtract(seg_size_out, MINSEGID)
    table = (remap - sub[remap.astype(jnp.int32)]).astype(jnp.uint32)
    return table[seg.astype(jnp.int32)]


def eliminate_small_segments_device(seg, seg_size, spect_sum,
                                    min_seg_size: int, max_spectral_diff,
                                    four_connected: bool,
                                    e_cap: int = None):
    """
    Device: edge extraction + graph elimination + final image rewrite.
    ``e_cap`` (static) bounds the unique adjacency count; when None it
    defaults to 8x capacity (grid adjacency is near-planar, so the true
    count is ~6x segment count; callers with a measured count should
    bucket it — see eliminateSmallSegments).

    Returns (relabelled seg, numEliminated, overflowed). ``overflowed``
    is True when the unique adjacency count exceeded e_cap (results are
    then unreliable and the caller must re-run with a larger bucket —
    only possible for pathologically interleaved segmentations, since
    4-connected adjacency graphs are planar with E <= 3V).
    """
    capacity = seg_size.shape[0]
    if e_cap is None:
        e_cap = 8 * capacity
    if min_seg_size <= 1:
        return (relabel(seg, seg_size, MINSEGID), jnp.uint32(0),
                jnp.bool_(False))
    a, b, first, n_unique = edge_sort_keys(seg, four_connected)
    overflow = n_unique > jnp.uint32(e_cap)
    ea, eb = compact_edges(a, b, first, e_cap, id_bound=capacity)
    remap, seg_size_out, num_elim, _ = eliminate_small_segments_graph(
        ea, eb, seg_size, spect_sum, min_seg_size, max_spectral_diff)
    seg = _remap_and_relabel(seg, remap, seg_size_out)
    return seg, num_elim, overflow


_elim_small_jit = jax.jit(
    eliminate_small_segments_device,
    static_argnames=("min_seg_size", "four_connected", "e_cap"))


def _elim_small_from_sorted(seg, a, b, first, seg_size, spect_sum,
                            min_seg_size: int, max_spectral_diff,
                            e_cap: int):
    """
    Device: graph elimination + image rewrite from ALREADY-SORTED edge
    keys — the host API measures n_unique with the same sort, so reusing
    its output avoids paying the dominant full-image sort twice.
    """
    ea, eb = compact_edges(a, b, first, e_cap,
                           id_bound=seg_size.shape[0])
    remap, seg_size_out, num_elim, _ = eliminate_small_segments_graph(
        ea, eb, seg_size, spect_sum, min_seg_size, max_spectral_diff)
    seg = _remap_and_relabel(seg, remap, seg_size_out)
    return seg, num_elim


_elim_small_from_sorted_jit = jax.jit(
    _elim_small_from_sorted, static_argnames=("min_seg_size", "e_cap"))


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
    # Measure the true unique-adjacency count, then bucket the edge
    # capacity statically (one scalar sync, mirroring the clump-count
    # sync); the sorted keys are reused so the sort only runs once.
    a, b, first, n_unique = _edge_sort_jit(
        seg_j, four_connected=bool(fourConnected))
    e_cap = round_capacity_fine(int(n_unique) + 1)
    seg_out, num_elim = _elim_small_from_sorted_jit(
        seg_j, a, b, first, seg_size, spect_sum,
        min_seg_size=int(minSegSize),
        max_spectral_diff=float(maxSpectralDiff), e_cap=e_cap)
    seg[...] = np.asarray(seg_out).astype(SegIdType)
    return int(num_elim)
