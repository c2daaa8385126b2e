"""
Batched device kernels for the built-in spatial per-segment statistics.

The spatial stats engine accumulates per-segment pixel coordinate lists
and, when a segment completes, evaluates a user function over the
segment's bounding-box tile (reference: pyshepseg/tilingstats.py:
1037-1216, 1846-1932 — numba callbacks invoked one segment at a time).
User-supplied callbacks necessarily stay host-side, but the built-in
functions (variogram, edge-pixel count) vectorize: every segment that
completes in a finalization round is scattered into a padded
bounding-box tile, boxes of one padded shape batch together, and a
vmapped kernel evaluates the whole batch in one dispatch per shape
bucket (the "vmapped user kernels over padded segments" design of
SURVEY.md §2.3 rows 17/22).

Padding uses the null value (variogram) / zero (mask), which both
kernels ignore, so padded results equal the per-segment host results:
bit-for-bit for the integer edge count; to float32 accumulation order
for the variogram (the host path accumulates in float64 — both land in
a float32 RAT column; deviation documented in PARITY.md).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pad_box_shape(h: int, w: int):
    """Bucket a bounding-box shape to powers of two (min 8) so box
    batches share a handful of compiled programs."""
    def up(n):
        b = 8
        while b < n:
            b *= 2
        return b
    return up(h), up(w)


@functools.partial(jax.jit, static_argnames=("four_connected",))
def edge_pixel_counts(masks, four_connected: bool):
    """
    (B, Hb, Wb) 0/1 masks -> (B,) int32 counts of mask pixels with at
    least one missing 4-/8-neighbour (segment edge pixels — reference
    userFuncNumEdgePixels, tilingstats.py:1145-1216). Exact.
    """
    if four_connected:
        offsets = ((-1, 0), (1, 0), (0, -1), (0, 1))
    else:
        offsets = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                   (1, -1), (1, 0), (1, 1))
    m = masks.astype(jnp.bool_)
    inner = m
    for dy, dx in offsets:
        nbr = jnp.roll(m, (dy, dx), axis=(1, 2))
        # roll wraps; wrapped-in rows/cols must read as "missing"
        if dy != 0:
            edge_row = 0 if dy > 0 else m.shape[1] - 1
            nbr = nbr.at[:, edge_row, :].set(False)
        if dx != 0:
            edge_col = 0 if dx > 0 else m.shape[2] - 1
            nbr = nbr.at[:, :, edge_col].set(False)
        inner = inner & nbr
    edge = m & ~inner
    return jnp.sum(edge, axis=(1, 2)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_dist",))
def variogram_sums(vals, valid, max_dist: int):
    """
    (B, Hb, Wb) value boxes + validity masks -> per-distance-bin pair
    counts and squared-difference sums, (B, max_dist) each, over the
    offset lattice (yoffset, xoffset) in 1..max_dist with
    dist = floor(sqrt(yo^2+xo^2)) in 1..max_dist — exactly the
    reference's double offset loop (tilingstats.py:1037-1094). The host
    finishes with sqrt(sumsq/count) per bin.
    """
    b, hb, wb = vals.shape
    v = vals.astype(jnp.float32)
    counts = [jnp.zeros((b,), jnp.int32) for _ in range(max_dist)]
    sums = [jnp.zeros((b,), jnp.float32) for _ in range(max_dist)]
    for yo in range(1, max_dist + 1):
        for xo in range(1, max_dist + 1):
            dist = int(np.sqrt(yo * yo + xo * xo))
            if dist < 1 or dist > max_dist:
                continue
            if yo >= hb or xo >= wb:
                continue
            a = v[:, :hb - yo, :wb - xo]
            c = v[:, yo:, xo:]
            ok = (valid[:, :hb - yo, :wb - xo] &
                  valid[:, yo:, xo:])
            d = jnp.where(ok, a - c, 0.0)
            counts[dist - 1] = counts[dist - 1] + jnp.sum(
                ok, axis=(1, 2)).astype(jnp.int32)
            sums[dist - 1] = sums[dist - 1] + jnp.sum(d * d, axis=(1, 2))
    return (jnp.stack(counts, axis=1), jnp.stack(sums, axis=1))


def scatter_boxes(ptsList, fill, dtype, valueOf):
    """
    Host: scatter each segment's points into its padded bounding-box
    tile. ``ptsList`` holds recarrays with fields x, y (whole-image
    coords); all boxes in the list share ONE padded shape (group before
    calling). ``valueOf(pts)`` gives the per-point values (or None for a
    0/1 mask). Returns the (B, Hb, Wb) numpy array.
    """
    shapes = [(int(p['y'].max() - p['y'].min() + 1),
               int(p['x'].max() - p['x'].min() + 1)) for p in ptsList]
    hb, wb = pad_box_shape(max(s[0] for s in shapes),
                           max(s[1] for s in shapes))
    out = np.full((len(ptsList), hb, wb), fill, dtype=dtype)
    for i, p in enumerate(ptsList):
        ys = (p['y'] - p['y'].min()).astype(np.int64)
        xs = (p['x'] - p['x'].min()).astype(np.int64)
        out[i, ys, xs] = 1 if valueOf is None else valueOf(p)
    return out
