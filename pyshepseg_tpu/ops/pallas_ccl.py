"""
Pallas TPU kernel: block-local connected-component label propagation.

The global CCL loop in ops/clump.py converges in O(iterations) full-image
sweeps, each of which streams the whole label/image state through HBM. The
hot part of that convergence is *local* propagation, which this kernel
solves entirely in VMEM: the image is tiled into BLOCK x BLOCK blocks, and
each grid step loads one block, initialises every valid pixel's label to
its global flat index, and iterates

    diagonal neighbour-min (8-conn)  ->  segmented min-scans along rows
    and columns (Hillis-Steele doubling over same-value runs)

to a local fixpoint without touching HBM. The outer XLA loop then only has
to merge labels across block boundaries, which takes a handful of sweeps
instead of tens.

Correctness does not depend on local convergence: labels only ever
decrease toward the component minimum and always hold the flat index of a
same-component pixel, so the kernel is a pure accelerator for the global
fixpoint iteration (hence the bounded MAX_LOCAL_ITERS). Scan-order parity
with the reference flood fill (reference: pyshepseg/shepseg.py:452-541) is
inherited from ops/clump.py's min-flat-index root rule.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block edge; 256x256 int32 keeps the working set (labels + image + masks,
# scan temporaries, and the pipeline's double buffers) inside the ~16 MB of
# VMEM — 512x512 overflows it by ~0.5 MB.
BLOCK = 256
MAX_LOCAL_ITERS = 64


def _shift(a, dy: int, dx: int, fill):
    """b[y, x] = a[y + dy, x + dx] with ``fill`` outside the block.

    pltpu.roll only accepts non-negative shifts, so the circular shift
    amount is taken mod the axis size; wrapped lanes are masked to fill.
    Mosaic's rotate only handles 32-bit lanes, so bool arrays round-trip
    through int32.
    """
    if a.dtype == jnp.bool_:
        return _shift(a.astype(jnp.int32), dy, dx,
                      jnp.int32(bool(fill))) != 0
    h, w = a.shape
    out = a
    if dy != 0:
        out = pltpu.roll(out, (-dy) % h, 0)
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        out = jnp.where((yy + dy >= 0) & (yy + dy < h), out, fill)
    if dx != 0:
        out = pltpu.roll(out, (-dx) % w, 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        out = jnp.where((xx + dx >= 0) & (xx + dx < w), out, fill)
    return out


def _scan_min(labels, conn_prev, axis: int, sentinel):
    """
    Min of each label over its whole same-value run along ``axis``.
    ``conn_prev`` marks elements connected to their predecessor along the
    axis. Hillis-Steele doubling: after step k each element has taken the
    min over the 2^k-prefix of its run; a forward and a backward sweep
    together cover the full run.
    """
    size = labels.shape[axis]

    def sweep(lab, conn, sign):
        reach = conn
        d = 1
        while d < size:
            off = (sign * d, 0) if axis == 0 else (0, sign * d)
            lab_s = _shift(lab, *off, sentinel)
            reach_s = _shift(reach, *off, False)
            lab = jnp.where(reach, jnp.minimum(lab, lab_s), lab)
            reach = reach & reach_s
            d *= 2
        return lab

    fwd = sweep(labels, conn_prev, -1)        # take from predecessors
    conn_next = _shift(conn_prev, *((1, 0) if axis == 0 else (0, 1)), False)
    bwd = sweep(labels, conn_next, 1)         # take from successors
    return jnp.minimum(fwd, bwd)


def _local_ccl_kernel(ignore_ref, img_ref, out_ref, *, width: int,
                      four_connected: bool):
    """One BLOCK x BLOCK tile: labels <- local component minima."""
    img = img_ref[...]
    h, w = img.shape
    ignore = ignore_ref[0]
    valid = img != ignore
    sentinel = jnp.int32(2147483647)

    base_y = pl.program_id(0) * h
    base_x = pl.program_id(1) * w
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + base_y
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + base_x
    labels0 = jnp.where(valid, yy * width + xx, sentinel)

    def conn(dy, dx):
        return (valid & _shift(valid, dy, dx, False) &
                (img == _shift(img, dy, dx, ignore)))

    conn_row = conn(0, -1)
    conn_col = conn(-1, 0)
    diag = [] if four_connected else [
        (dy, dx, conn(dy, dx)) for dy, dx in
        ((-1, -1), (-1, 1), (1, -1), (1, 1))]

    def body(carry):
        lab, _, it = carry
        new = lab
        for dy, dx, same in diag:
            new = jnp.minimum(
                new, jnp.where(same, _shift(new, dy, dx, sentinel),
                               sentinel))
        new = _scan_min(new, conn_row, 1, sentinel)
        new = _scan_min(new, conn_col, 0, sentinel)
        changed = jnp.any(new != lab)
        return new, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < MAX_LOCAL_ITERS)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
    out_ref[...] = labels


def block_shape_for(h: int, w: int):
    """
    Per-axis block sizes honouring the Mosaic tiling rules for int32:
    the lane (last) dimension must be a multiple of 128 and the sublane
    dimension a multiple of 8 (or each equal to the whole padded array).
    Returns ((block_y, block_x), (padded_h, padded_w)).
    """
    block_x = BLOCK if w >= BLOCK else 128
    block_y = BLOCK if h >= BLOCK else max(8, -(-h // 8) * 8)
    hp = -(-h // block_y) * block_y
    wp = -(-w // block_x) * block_x
    return (block_y, block_x), (hp, wp)


def local_ccl_blocks(img, ignore_val, four_connected: bool,
                     block=None, interpret: bool = None):
    """
    Device: per-block locally-converged labels (global flat indices;
    invalid pixels get INT32_MAX). ``img`` must be int32 (H, W) with H, W
    multiples of the block shape — callers pad with ``ignore_val``
    (see block_shape_for).
    """
    h, w = img.shape
    if block is None:
        block = (min(BLOCK, h), min(BLOCK, w))
    elif isinstance(block, int):
        block = (block, block)
    by, bx = block
    assert h % by == 0 and w % bx == 0, (h, w, block)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(_local_ccl_kernel, width=w,
                               four_connected=four_connected)
    grid = (h // by, w // bx)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((by, bx), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((by, bx), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )(jnp.asarray([ignore_val], jnp.int32), img)
