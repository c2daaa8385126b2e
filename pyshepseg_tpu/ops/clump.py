"""
Connected-component labelling ("clumping") on TPU.

Replaces the reference's scan-order flood fill
(reference: pyshepseg/shepseg.py:452-541) with an iterative data-parallel
formulation: every valid pixel starts labelled with its own flat index and
labels only ever decrease, via three complementary mechanisms per sweep:

1. neighbour min over the connectivity offsets (cheap pad+slice shifts;
   for 8-connectivity this is what carries labels across diagonals),
2. segmented min-scans along rows and columns (Hillis-Steele doubling
   over pad+slice shifts, with run breaks where the pixel value changes)
   — a label crosses an entire same-value run in one log-depth sweep with
   NO gather traffic,
3. one pointer-jumping step (label = label[label]) that collapses long
   label chains so spiral-shaped components converge in O(log) sweeps.

At the fixpoint every component carries the flat index of its first pixel
in row-major scan order, which is exactly the order in which the reference's
flood fill seeds new clumps — so the final scan-order relabel reproduces the
reference's clump ID assignment bit-for-bit.

Deviation from the reference (documented): the reference caps flood-fill
growth at MAX_CLUMP_SIZE=10000 pixels purely as a CPU performance guard,
splitting larger uniform areas into multiple clumps with stack-order
dependent geometry (shepseg.py:477-481, 502). The TPU propagation has no
such pathology, so by default clumps are exact connected components. For
inputs where every component is below the cap (>99.9% of segments in the
reference's own testing) the outputs are identical.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .constants import SegIdType, SEGNULLVAL
from .shifts import shift, offsets_for


def _run_min(labels, conn_prev, axis, sentinel):
    """
    Min of each label over its whole same-value run along ``axis``.
    ``conn_prev[..i..]`` is True when element i is connected to element i-1
    along the axis.

    Implemented as Hillis-Steele doubling over plain pad+slice shifts
    (after step k each element holds the min over the 2^k elements of its
    run behind/ahead of it). NOT lax.associative_scan: its recursive
    odd/even interleaving makes XLA compile time explode on large 2D
    arrays (~20 minutes at 2048x2048 vs seconds for this form — measured).
    """

    def sweep(lab, conn, sign):
        reach = conn
        d = 1
        size = lab.shape[axis]
        while d < size:
            off = (sign * d, 0) if axis == 0 else (0, sign * d)
            lab_s = shift(lab, *off, sentinel)
            reach_s = shift(reach, *off, False)
            lab = jnp.where(reach, jnp.minimum(lab, lab_s), lab)
            reach = reach & reach_s
            d *= 2
        return lab

    fwd = sweep(labels, conn_prev, -1)          # take from predecessors
    conn_next = shift(conn_prev, *((1, 0) if axis == 0 else (0, 1)), False)
    bwd = sweep(labels, conn_next, 1)           # take from successors
    return jnp.minimum(fwd, bwd)


def _pallas_seed_labels(img, ignore_val, four_connected, valid, sentinel):
    """
    Seed the global loop with block-locally converged labels from the
    Pallas VMEM kernel (ops/pallas_ccl.py). The kernel works on an image
    padded to block multiples; returned flat indices are translated from
    padded to unpadded coordinates (both row-major, so lexicographic
    (y, x) order — and with it the min-index root rule — is preserved).
    """
    from .pallas_ccl import local_ccl_blocks, block_shape_for

    h, w = img.shape
    blk, (hp, wp) = block_shape_for(h, w)
    img_p = jnp.pad(img, ((0, hp - h), (0, wp - w)), mode="constant",
                    constant_values=ignore_val)
    lab_p = local_ccl_blocks(img_p, ignore_val, four_connected, block=blk)
    lab = lab_p[:h, :w]
    ly = lab // wp
    lx = lab % wp
    return jnp.where(valid, ly * w + lx, sentinel)


def _boundary_edges(labels, img, ignore_val, by, bx, four_connected,
                    sentinel):
    """
    Label pairs of adjacent same-value pixels that straddle a block
    boundary of the (by, bx) block grid, as two flat (E,) arrays
    (invalid slots hold ``sentinel``). STATIC strided slices — the block
    grid is known at trace time — so extraction costs a handful of thin
    (h/by, w)-ish streaming compares, no sort and no compaction. Pairs
    wholly inside one block are unnecessary (their labels are already
    equal after local convergence) but harmless if included (self-edges
    are no-ops in the merge), so the slices don't bother excluding the
    image-edge corner duplicates.
    """
    ea_parts, eb_parts = [], []

    def add(lab_lo, lab_hi, img_lo, img_hi):
        m = min(lab_lo.shape[0], lab_hi.shape[0])
        n = min(lab_lo.shape[1], lab_hi.shape[1])
        lab_lo, lab_hi = lab_lo[:m, :n], lab_hi[:m, :n]
        ok = ((img_lo[:m, :n] == img_hi[:m, :n]) &
              (img_lo[:m, :n] != ignore_val) &
              (img_hi[:m, :n] != ignore_val))
        ea_parts.append(jnp.where(ok, lab_lo, sentinel).ravel())
        eb_parts.append(jnp.where(ok, lab_hi, sentinel).ravel())

    # vertical pairs across horizontal block boundaries
    add(labels[by - 1::by], labels[by::by],
        img[by - 1::by], img[by::by])
    # horizontal pairs across vertical block boundaries
    add(labels[:, bx - 1::bx], labels[:, bx::bx],
        img[:, bx - 1::bx], img[:, bx::bx])
    if not four_connected:
        # diagonals across horizontal boundaries
        add(labels[by - 1::by, :-1], labels[by::by, 1:],
            img[by - 1::by, :-1], img[by::by, 1:])
        add(labels[by - 1::by, 1:], labels[by::by, :-1],
            img[by - 1::by, 1:], img[by::by, :-1])
        # diagonals across vertical boundaries (interior rows)
        add(labels[:-1, bx - 1::bx], labels[1:, bx::bx],
            img[:-1, bx - 1::bx], img[1:, bx::bx])
        add(labels[:-1, bx::bx], labels[1:, bx - 1::bx],
            img[:-1, bx::bx], img[1:, bx - 1::bx])
    return jnp.concatenate(ea_parts), jnp.concatenate(eb_parts)


def _merge_boundary_roots(ea, eb, sentinel):
    """
    Connected components of the CONTRACTED boundary-root graph: nodes
    are the block-local root labels appearing in the edge lists, values
    converge to each contracted component's minimum label (= the global
    component's min flat index, since a component's global min root is
    reachable from every one of its block roots through boundary
    edges). Min-hooking over the edges plus one value-chasing hop per
    iteration (m <- m[id(m)], ids by binary search over the sorted
    unique node labels) converges in O(log) iterations; every array is
    edge-sized (thousands), so the whole solve costs microseconds.

    Returns (uniq (2E,) sorted node labels padded with ``sentinel``,
    m (2E,) final min label per node).
    """
    keys = jnp.sort(jnp.concatenate([ea, eb]))
    two_e = keys.shape[0]
    first = ((jnp.arange(two_e) == 0) | (keys != jnp.roll(keys, 1)))
    first = first & (keys != sentinel)
    uniq = jnp.sort(jnp.where(first, keys, sentinel))
    ca = jnp.searchsorted(uniq, ea).astype(jnp.int32)
    cb = jnp.searchsorted(uniq, eb).astype(jnp.int32)
    ca = jnp.minimum(ca, two_e - 1)
    cb = jnp.minimum(cb, two_e - 1)

    def body(carry):
        m, _, it = carry
        em = jnp.minimum(m[ca], m[cb])
        m2 = m.at[ca].min(em).at[cb].min(em)
        j = jnp.minimum(jnp.searchsorted(uniq, m2).astype(jnp.int32),
                        two_e - 1)
        m3 = jnp.minimum(m2, m2[j])
        return m3, jnp.any(m3 != m), it + jnp.int32(1)

    m, _, _ = jax.lax.while_loop(
        lambda c: c[1], body, (uniq, jnp.bool_(True), jnp.int32(0)))
    return uniq, m


def clump_labels(img, ignore_val, four_connected=True, use_pallas=None,
                 jump_every=8, two_level=None):
    """
    Device kernel: label connected components of equal-valued pixels.

    Parameters
    ----------
    img : int array (nRows, nCols)
        Values to clump; pixels equal to ``ignore_val`` are null.
    ignore_val : int
        Null value in ``img``.
    four_connected : bool (static)
        4-way vs 8-way connectedness.
    use_pallas : bool or None (static)
        Seed the global loop with the Pallas block-local CCL kernel
        (None = yes; interpreted off-TPU).
    two_level : bool or None (static)
        Merge block-local labels through the contracted boundary-root
        graph (verified, with a lax.cond fallback into the global
        sweeps) instead of always sweeping. None = backend-dependent:
        ON for CPU/interpret backends, OFF for TPU. Measured A/B on the
        config-1 scene (same labels asserted): on a v5e the plain
        sweeps path is 8.9 ms vs two-level's 20.1 ms — the merge's
        fixed costs (boundary extraction, the edge-graph while_loop's
        serialized tiny ops, the full-image verify) dwarf the 5 run-scan
        sweeps it saves; on XLA:CPU the same A/B is 536 ms vs 1996 ms
        in two-level's favour (each sweep streams the image ~40x, which
        the CPU pays at memory speed serially). Callers that ``vmap``
        this function should pass False: under vmap a cond runs BOTH
        branches, so the sweeps execute anyway and the fast path's
        verify/gather become pure overhead.
    jump_every : int (static)
        Run the pointer-jumping hop on every ``jump_every``-th sweep.
        The hop is a full-image gather (~7 ms/Mpix on a v5e — by far
        the costliest op in the sweep), while a plain sweep is ~1.2 ms
        of streaming run scans; typical scenes converge from the Pallas
        block-local seeds in 3-4 sweeps WITHOUT ever jumping, so a
        sparse schedule wins. Measured on the config-1 scene (v5e,
        identical labels asserted): every-2nd-sweep 16.5 ms / 3 sweeps,
        every-4th 16.3 ms / 4 sweeps (the jump still fired once),
        every-8th 9.1 ms / 4 sweeps (never fired). Spiral-shaped label
        chains still collapse multiplicatively, just starting sweeps
        later — 8 keeps that backstop at zero typical-case cost.

    Returns
    -------
    seg : uint32 array (nRows, nCols)
        Scan-order component labels starting at 1; null pixels are 0.
    num_clumps : uint32 scalar
        Number of components found.
    num_sweeps : int32 scalar
        Global propagation sweeps until the fixpoint (each sweep streams
        the whole image ~40x through the run scans — the dominant
        memory-bound cost, see BASELINE.md's roofline notes).
    """
    h, w = img.shape
    n = h * w
    sentinel = jnp.int32(n)
    valid = img != ignore_val
    if use_pallas is None:
        use_pallas = True
    if use_pallas:
        labels0 = _pallas_seed_labels(img, ignore_val, four_connected,
                                      valid, sentinel)
    else:
        idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
        labels0 = jnp.where(valid, idx, sentinel)

    # Connectivity along rows/cols (pass-invariant)
    def conn(dy, dx):
        # valid-shift masks both out-of-image and null neighbours, so the
        # fill value of the img shift never reaches the comparison result
        return (valid & shift(valid, dy, dx, False) &
                (img == shift(img, dy, dx, ignore_val)))

    conn_row = conn(0, -1)   # connected to left neighbour
    conn_col = conn(-1, 0)   # connected to upper neighbour

    # Diagonal offsets only — horizontal/vertical propagation is handled
    # (much further per sweep) by the run scans.
    diag_offsets = [(dy, dx) for dy, dx in offsets_for(four_connected)
                    if dy != 0 and dx != 0]
    nbr_same = [(dy, dx, conn(dy, dx)) for dy, dx in diag_offsets]

    def slow(labels_in):
        """The global fixpoint loop, the correctness anchor: converges
        from ANY monotone label state. Returns the scan-order rank
        table, the flat labels to gather it with, the sweep count, and
        the clump count."""

        def body(carry):
            labels, _, sweep = carry
            new = labels
            for dy, dx, same in nbr_same:
                new = jnp.minimum(new,
                                  jnp.where(same,
                                            shift(new, dy, dx, sentinel),
                                            sentinel))
            new = _run_min(new, conn_row, 1, sentinel)
            new = _run_min(new, conn_col, 0, sentinel)

            # One pointer-jumping hop collapses label chains
            # multiplicatively, but costs a full-image gather — by far
            # the most expensive op in the sweep. Typical inputs
            # converge in a handful of sweeps from the block-local
            # seeds without it, so only pay for it sparsely;
            # pathological spiral components still converge in O(log)
            # sweeps.
            def jump(x):
                flat = x.ravel()
                flat_ext = jnp.concatenate(
                    [flat, jnp.array([sentinel], flat.dtype)])
                return flat_ext[flat].reshape(x.shape)

            new = jax.lax.cond(sweep % jump_every == jump_every - 1,
                               jump, lambda x: x, new)
            new = jnp.where(valid, new, sentinel)
            changed = jnp.any(new != labels)
            return new, changed, sweep + 1

        labels, _, num_sweeps = jax.lax.while_loop(
            lambda c: c[1], body, (labels_in, jnp.bool_(True),
                                   jnp.int32(0)))
        flat = labels.ravel()
        is_root = (flat == jnp.arange(n, dtype=jnp.int32)) & valid.ravel()
        rank = jnp.cumsum(is_root.astype(jnp.uint32))
        rank_ext = jnp.concatenate([rank, jnp.zeros(1, jnp.uint32)])
        return rank_ext, flat, num_sweeps, rank[-1]

    # TWO-LEVEL fast path: the Pallas seed already solved each block
    # locally, so the only remaining work is merging roots ACROSS block
    # boundaries — a contracted graph of boundary-straddling label
    # pairs, solved in edge-sized arrays (microseconds), instead of
    # 3-4 global sweeps that each stream the whole image ~40x. Local
    # convergence isn't guaranteed (the kernel caps its iterations), so
    # the result is VERIFIED by one cheap streaming check — every
    # connected pixel pair must share a final label, which for
    # min-propagated labels is exactly component correctness — with a
    # lax.cond fallback into the global loop on failure.
    if two_level is None:
        # backend-dependent default — see the docstring's measured A/B.
        # Prefer the platform the computation actually targets (the
        # input's committed device) over the process-global default:
        # on a TPU host running CPU-placed work, default_backend()
        # still says 'tpu' and would pick the path that the A/B
        # measured ~4x slower on XLA:CPU. Tracers (calls under an
        # outer jit) carry no device — fall back to default_backend().
        platform = None
        try:
            sharding = getattr(img, "sharding", None)
            if sharding is not None and sharding.device_set:
                platform = next(iter(sharding.device_set)).platform
        except Exception:
            platform = None
        if platform is None:
            platform = jax.default_backend()
        two_level = platform != "tpu"
    fast_edges = None
    if use_pallas and two_level:
        from .pallas_ccl import block_shape_for
        (by, bx), _ = block_shape_for(h, w)
        ea, eb = _boundary_edges(labels0, img, ignore_val, by, bx,
                                 four_connected, sentinel)
        if ea.shape[0] > 0:   # static: >1 block in some axis
            fast_edges = (ea, eb)

    if fast_edges is not None:
        uniq, m = _merge_boundary_roots(*fast_edges, sentinel)
        flat0 = labels0.ravel()
        is_root = ((flat0 == jnp.arange(n, dtype=jnp.int32)) &
                   valid.ravel())
        # block roots whose contracted component has a smaller root
        # are demoted (their pixels' final rank comes via F below)
        demote = jnp.where(m < uniq, uniq, sentinel)
        is_root = is_root.at[demote].set(False, mode="drop")
        rank = jnp.cumsum(is_root.astype(jnp.uint32))
        rank_ext = jnp.concatenate([rank, jnp.zeros(1, jnp.uint32)])
        # F = rank table with merged roots redirected to their final
        # root's rank (uniq pads write slot n with its existing 0)
        F = rank_ext.at[jnp.minimum(uniq, sentinel)].set(
            rank_ext[jnp.minimum(m, sentinel)])
        seg_fast = F[flat0].reshape(h, w)
        bad = jnp.bool_(False)
        for dy, dx in offsets_for(four_connected):
            bad = bad | jnp.any(conn(dy, dx) &
                                (seg_fast != shift(seg_fast, dy, dx,
                                                   jnp.uint32(0))))
        F, flat, num_sweeps, num_clumps = jax.lax.cond(
            bad,
            lambda: slow(labels0),
            lambda: (F, flat0, jnp.int32(0), rank[-1]))
    else:
        F, flat, num_sweeps, num_clumps = slow(labels0)

    # Scan-order relabel: component root = min flat index = first pixel
    # the reference's raster scan would have seeded from.
    seg = jnp.where(valid.ravel(), F[flat], SEGNULLVAL)
    return seg.reshape(h, w).astype(jnp.uint32), num_clumps, num_sweeps


_clump_jit = jax.jit(clump_labels,
                     static_argnames=("four_connected", "use_pallas",
                                      "jump_every", "two_level"))


def clump(img, ignoreVal, fourConnected=True, clumpId=1, maxClumpSize=None):
    """
    Host API matching the reference signature
    (reference: pyshepseg/shepseg.py:452-541).

    Returns ``(clumpimg, nextClumpId)`` where clumpimg has IDs starting at
    ``clumpId`` in scan order and nextClumpId is the highest ID used + 1.

    ``maxClumpSize`` opts into the reference's MAX_CLUMP_SIZE cap
    semantics (splitting big clumps in flood-fill stack order,
    shepseg.py:477-481). The cap's geometry is inherently sequential, so
    that path runs the native C++ flood fill on the host
    (pyshepseg_tpu/native/ccl.cpp); the default (None) is the exact
    TPU label-propagation kernel.
    """
    if maxClumpSize is not None:
        from ..native import flood_fill_clump
        return flood_fill_clump(img, ignoreVal, fourConnected,
                                maxClumpSize, clumpId)
    img = jnp.asarray(np.ascontiguousarray(img))
    seg, num, _ = _clump_jit(img, int(ignoreVal),
                             four_connected=bool(fourConnected))
    seg = np.asarray(seg)
    num = int(num)
    if clumpId != 1:
        seg = np.where(seg != SEGNULLVAL, seg + SegIdType(clumpId - 1), seg)
    return seg.astype(SegIdType), clumpId + num
