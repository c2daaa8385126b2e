"""
Pallas TPU kernel: full-image gather from a SMALL lookup table.

The pipeline's id-remap steps (`_remap_and_relabel`'s ``table[seg]``,
reference relabelSegments — pyshepseg/shepseg.py:739-777) are gathers of
~1M indices from a table of at most ``capacity`` (typically 4-64K)
entries. XLA lowers them to the TPU's generic gather, which costs ~7
cycles/element (~7 ms per Mpix measured on a v5e) — the single most
expensive op class left in the one-shot pipeline after the graph loop.

This kernel exploits the small table: the table lives in VMEM reshaped
to (C/128, 128), and each index splits into (row = idx >> 7,
lane = idx & 127). The kernel loops over table rows, broadcasting one
row across the block and picking lanes with ``tpu.dynamic_gather``
(via ``jnp.take_along_axis`` along the lane axis — the one gather shape
Mosaic lowers natively), accumulating ``where(row_of(idx) == r, ...)``.
Work is O(pixels x C/128) vectorized lane ops with NO serial gather:
~0.5 ms per Mpix at C=4096 vs ~7 ms for the XLA gather (measured).

Worth using when C/128 is small; the crossover against the 7-cycle
XLA gather is around C ~ 64K. Callers gate on capacity (see
LUT_MAX_TABLE).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Above this table size the O(C/128) row loop loses to XLA's generic
# gather (~7 cycles/elem); 32K rows keep the loop <= 256 iterations.
LUT_MAX_TABLE = 32768

# Rows per block: (BLOCK_ROWS, 128) int32 = 256 KB of VMEM for idx +
# out + accumulator, far under budget; bigger blocks amortise grid
# overhead.
BLOCK_ROWS = 512


def _lut_kernel(table_ref, idx_ref, out_ref, *, rows: int):
    idx = idx_ref[...].astype(jnp.int32)
    lo = idx & 127
    hi = idx >> 7

    def body(r, acc):
        row = table_ref[pl.ds(r, 1), :]             # (1, 128)
        rowb = jnp.broadcast_to(row, idx.shape)
        g = jnp.take_along_axis(rowb, lo, axis=1,
                                mode="promise_in_bounds")
        return jnp.where(hi == r, g, acc)

    out_ref[...] = jax.lax.fori_loop(
        0, rows, body, jnp.zeros_like(idx), unroll=False)


# Trace-time switch for the wired path (_remap_and_relabel): tests
# monkeypatch this to exercise the kernel through the interpreter on
# CPU; set to False to force the XLA gather everywhere.
ENABLE = True


def use_lut(table_size: int) -> bool:
    """Whether _remap_and_relabel should route its full-image gather
    through this kernel: small enough table, TPU backend (off-TPU the
    interpreter would be pathologically slow), not disabled. Called at
    trace time — all inputs are static."""
    return (ENABLE and table_size <= LUT_MAX_TABLE and
            jax.default_backend() == "tpu")


def lut_gather_flat(idx, table, interpret: bool = None):
    """``table[idx]`` for a 1D index vector — the in-loop form used by
    the elimination graph passes (ops/elim_small.py), where XLA's
    generic gather at ~7 cycles/element is the measured per-pass
    bottleneck (83 us vs 12 us for this kernel at 12K indices from a
    4K table, on-chip)."""
    n = idx.shape[0]
    return lut_gather(idx.reshape(1, n), table, interpret).reshape(n)


def lut_gather(idx, table, interpret: bool = None):
    """
    Device: ``table[idx]`` for int indices (H, W) in [0, len(table))
    from a small 1D table. Returns the table's dtype reinterpreted
    through int32 lanes (uint32/int32 tables supported).

    ``interpret`` defaults to True off-TPU (tests run the same code
    path through the Pallas interpreter).
    """
    h, w = idx.shape
    c = table.shape[0]
    assert c <= LUT_MAX_TABLE, c
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows = -(-c // 128)
    pad = rows * 128 - c
    tab2 = jnp.pad(table.astype(jnp.int32).reshape(1, c),
                   ((0, 0), (0, pad))).reshape(rows, 128)

    # lane dim must be 128 for the in-kernel take_along_axis; fold the
    # image into (N/128, 128) blocks, padding the tail AND padding the
    # row count up to a multiple of the block size (pad indices are 0,
    # always in range; the result slice drops them)
    n = h * w
    nrows = -(-n // 128)
    block_rows = min(BLOCK_ROWS, nrows)
    nrows_p = -(-nrows // block_rows) * block_rows
    tail = nrows_p * 128 - n
    idx_flat = idx.ravel().astype(jnp.int32)
    if tail:
        idx_flat = jnp.concatenate(
            [idx_flat, jnp.zeros((tail,), jnp.int32)])
    idx2 = idx_flat.reshape(nrows_p, 128)

    kernel = functools.partial(_lut_kernel, rows=rows)
    out = pl.pallas_call(
        kernel,
        grid=(nrows_p // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole table
            pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows_p, 128), jnp.int32),
        interpret=interpret,
    )(tab2, idx2)
    out = out.reshape(-1)[:n].reshape(h, w)
    return out.astype(table.dtype)
