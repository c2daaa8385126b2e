"""Parity tests of the Pallas LUT-gather kernel (ops/lut.py) against the
plain XLA gather, through the Pallas interpreter (CI has no TPU), plus
the wired _remap_and_relabel route."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyshepseg_tpu.ops import lut


@pytest.mark.parametrize("shape,c", [
    ((8, 128), 16),         # single block, tiny table
    ((64, 128), 128),       # exact lane-width table
    ((128, 200), 4096),     # non-128-multiple width (tail pad)
    ((100, 100), 1000),     # nothing aligned
    ((513, 128), 32768),    # max table, row count not divisible by 8/512
])
def test_lut_gather_matches_xla(rng, shape, c):
    idx = rng.integers(0, c, size=shape).astype(np.uint32)
    table = rng.integers(0, 2 ** 31 - 1, size=(c,)).astype(np.uint32)
    got = np.asarray(lut.lut_gather(jnp.asarray(idx), jnp.asarray(table),
                                    interpret=True))
    np.testing.assert_array_equal(got, table[idx])
    assert got.dtype == table.dtype


def test_lut_gather_1000x1000_smoke(rng):
    """The exact case the round-3 advisor flagged: nrows=7813 is neither
    a multiple of 512 nor of 8 — must pad, not assert."""
    c = 512
    idx = rng.integers(0, c, size=(1000, 1000)).astype(np.uint32)
    table = rng.integers(0, 2 ** 20, size=(c,)).astype(np.uint32)
    got = np.asarray(lut.lut_gather(jnp.asarray(idx), jnp.asarray(table),
                                    interpret=True))
    np.testing.assert_array_equal(got, table[idx])


def test_lut_gather_rejects_oversize_table(rng):
    idx = jnp.zeros((8, 128), jnp.uint32)
    table = jnp.zeros((lut.LUT_MAX_TABLE + 1,), jnp.uint32)
    with pytest.raises(AssertionError):
        lut.lut_gather(idx, table, interpret=True)


def test_use_lut_gate():
    """Off-TPU the gate must be closed (the interpreter is too slow for
    production images); the size gate must close above LUT_MAX_TABLE."""
    assert not lut.use_lut(4096)          # CI runs on CPU
    # the other clauses, independent of backend:
    assert lut.LUT_MAX_TABLE >= 4096
    saved = lut.ENABLE
    try:
        lut.ENABLE = False
        assert not lut.use_lut(4096)
    finally:
        lut.ENABLE = saved


def test_remap_and_relabel_lut_route_matches_xla(rng, monkeypatch):
    """Force the wired LUT route through the interpreter on a small
    image: _remap_and_relabel must produce the identical segment raster
    either way."""
    from pyshepseg_tpu.ops import elim_small

    capacity = 1024
    h, w = 64, 96
    # a plausible post-elimination state: remap maps orig ids onto a
    # subset of survivors, sizes nonzero exactly for survivors
    seg = rng.integers(0, 200, size=(h, w)).astype(np.uint32)
    remap = rng.integers(0, 150, size=(capacity,)).astype(np.uint32)
    sizes = np.zeros(capacity, np.uint32)
    survivors = np.unique(remap)
    sizes[survivors] = rng.integers(1, 50, size=len(survivors))

    args = (jnp.asarray(seg), jnp.asarray(remap), jnp.asarray(sizes))
    baseline = np.asarray(elim_small._remap_and_relabel(*args))

    monkeypatch.setattr(lut, "use_lut", lambda c: True)
    # off-TPU lut_gather auto-selects interpret mode
    routed = np.asarray(elim_small._remap_and_relabel(*args))
    np.testing.assert_array_equal(routed, baseline)
