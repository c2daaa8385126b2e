"""
On-chip primitive-cost anchors for the segmentation pipeline's hot ops.

Measures, with K back-to-back iterations per sync so the link RTT
amortizes out (tunnel-insensitive device-side figures):

- 2M-key lexicographic sort (the edge-extraction sort)
- gathers/scatters at the sizes the elimination passes use
- cumsum at compaction sizes
- fixed per-op overhead (chain of dependent trivial ops on tiny arrays)

Run on the TPU:  python scripts/bench_primitives.py
"""

import os
import sys
import time
import json
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pyshepseg_tpu import utils  # noqa: E402

utils.setupCompilationCache(
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

K = 20


def timeit_amortized(fn, repeats=3):
    """Time K chained iterations inside one jit, sync once; returns
    per-iteration seconds (min over repeats)."""
    fn()  # warm/compile
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts) / K


def chain(body, x0):
    @jax.jit
    def run(x):
        def step(i, x):
            return body(x, i)
        return jax.lax.fori_loop(0, K, step, x0)
    def call():
        r = run(x0)
        jax.tree_util.tree_map(
            lambda a: np.asarray(a.ravel()[0]), r)
    return call


def main():
    out = {}
    rng = np.random.default_rng(0)
    N = 2 * 1024 * 1024

    # --- 2M two-key sort (the edge sort)
    a = jnp.asarray(rng.integers(0, 2000, N).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 2000, N).astype(np.uint32))

    def sort_body(x, i):
        aa, bb = jax.lax.sort((x[0] + i.astype(jnp.uint32), x[1]),
                              num_keys=2)
        return aa, bb
    out["sort_2M_2key_ms"] = round(
        timeit_amortized(chain(sort_body, (a, b))) * 1e3, 3)

    # --- single-key 2M sort
    def sort1_body(x, i):
        return jax.lax.sort(x + i.astype(jnp.uint32))
    out["sort_2M_1key_ms"] = round(
        timeit_amortized(chain(sort1_body, a)) * 1e3, 3)

    # --- gathers: table (cap,) f32, E indices
    for cap, E in ((2048, 16384), (2048, 2 * 1024 * 1024),
                   (65536, 2 * 1024 * 1024)):
        table = jnp.asarray(rng.random(cap).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, cap, E).astype(np.int32))

        def g_body(x, i, idx=idx):
            t, s = x
            v = t[(idx + i) % cap]
            return t, s + v.sum()
        out[f"gather_{E>>10}K_from_{cap}_ms"] = round(
            timeit_amortized(chain(g_body, (table, jnp.float32(0)))) * 1e3,
            3)

    # --- stacked gather: (8, cap) table, E indices, one op
    cap, E = 2048, 16384
    table8 = jnp.asarray(rng.random((8, cap)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, cap, E).astype(np.int32))

    def g8_body(x, i):
        t, s = x
        v = t[:, (idx + i) % cap]          # (8, E)
        return t, s + v.sum()
    out["gather8x_16K_from_2048_ms"] = round(
        timeit_amortized(chain(g8_body, (table8, jnp.float32(0)))) * 1e3, 3)

    # --- scatter-set with drop: E values into (cap,)
    for cap, E in ((65536, 2 * 1024 * 1024), (16384, 16384)):
        vals = jnp.asarray(rng.random(E).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, cap, E).astype(np.int32))

        def s_body(x, i, idx=idx, cap=cap, vals=vals):
            return x.at[(idx + i) % cap].set(vals, mode="drop")
        x0 = jnp.zeros(cap, jnp.float32)
        out[f"scatter_set_{E>>10}K_into_{cap}_ms"] = round(
            timeit_amortized(chain(s_body, x0)) * 1e3, 3)

    # --- segment_sum 2M -> 2048 (the image-space reductions)
    segs = jnp.asarray(rng.integers(0, 2048, N).astype(np.int32))
    ones = jnp.ones(N, jnp.float32)

    def ss_body(x, i):
        return x + jax.ops.segment_sum(ones, (segs + i) % 2048,
                                       num_segments=2048)
    out["segsum_2M_to_2048_ms"] = round(
        timeit_amortized(chain(ss_body, jnp.zeros(2048, jnp.float32)))
        * 1e3, 3)

    # --- segment_min 32K -> 2048 (the per-pass reduction)
    E = 32768
    d = jnp.asarray(rng.random(E).astype(np.float32))
    sidx = jnp.asarray(rng.integers(0, 2048, E).astype(np.int32))

    def sm_body(x, i):
        return jnp.minimum(x, jax.ops.segment_min(
            d + i.astype(jnp.float32), sidx, num_segments=2048))
    out["segmin_32K_to_2048_ms"] = round(
        timeit_amortized(chain(sm_body, jnp.full(2048, jnp.inf))) * 1e3, 3)

    # --- cumsum 2M
    u = jnp.asarray(rng.integers(0, 2, N).astype(np.uint32))

    def cs_body(x, i):
        return jnp.cumsum(u + x[:1] * 0) + x * 0
    out["cumsum_2M_ms"] = round(
        timeit_amortized(chain(cs_body, u)) * 1e3, 3)

    # --- per-op fixed overhead: 100 dependent adds on a tiny array,
    # inside the fori chain (so K*100 ops per sync)
    tiny = jnp.zeros((8, 128), jnp.float32)

    def ops_body(x, i):
        for _ in range(100):
            x = x + 1.0
        return x
    per_chain = timeit_amortized(chain(ops_body, tiny))
    out["tiny_op_overhead_us"] = round(per_chain / 100 * 1e6, 2)

    # --- elementwise 2M masked where (boundary masking cost anchor)
    seg2d = jnp.asarray(
        rng.integers(0, 2000, (1024, 1024)).astype(np.uint32))

    def where_body(x, i):
        y = jnp.where(x != jnp.roll(x, 1, axis=1), x, x + 1)
        return y
    out["roll_where_1Mpix_ms"] = round(
        timeit_amortized(chain(where_body, seg2d)) * 1e3, 3)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
