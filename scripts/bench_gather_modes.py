"""
Microbench: alternative lowerings for the elimination pass's hot gathers.

The graph-elimination pass gathers ~10 E-sized vectors per pass from
capacity-sized tables (remap, size, per-band spectral sums). At the
measured ~9 ms per million gathered elements this is the loop's dominant
cost. Candidate reformulations, all bit-exact:

  a) sep:    5 separate 1D gathers  table_i[idx]            (baseline)
  b) packed: one (5, cap)[:, idx] minor-dim gather -> (5, E)
  c) onehot: (E, cap) bf16 one-hot @ (cap, 5) f32 table at HIGHEST
             precision. Exact because each one-hot row has exactly one
             nonzero: the 3-way bf16 split of a f32 is exact and the
             split parts re-sum exactly (disjoint bit ranges), so no
             cross-term rounding exists.

Run on the TPU:  python scripts/bench_gather_modes.py [E cap]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, repeats=20):
    fn()
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    C = 5
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, cap, E).astype(np.int32))
    tables = [jnp.asarray(rng.random(cap).astype(np.float32))
              for _ in range(C)]
    packed = jnp.stack(tables)            # (C, cap)
    packed_t = packed.T                   # (cap, C)

    # chain R repeats inside one jit so per-dispatch overhead amortizes
    R = 20

    @jax.jit
    def sep(idx):
        acc = jnp.zeros(E, jnp.float32)
        for r in range(R):
            ix = (idx + r) % cap
            for t in tables:
                acc = acc + t[ix]
        return acc

    @jax.jit
    def packed_gather(idx):
        acc = jnp.zeros(E, jnp.float32)
        for r in range(R):
            ix = (idx + r) % cap
            acc = acc + packed[:, ix].sum(0)
        return acc

    @jax.jit
    def onehot(idx):
        acc = jnp.zeros(E, jnp.float32)
        for r in range(R):
            ix = (idx + r) % cap
            oh = (ix[:, None] == jnp.arange(cap)[None, :]).astype(
                jnp.bfloat16)
            g = jax.lax.dot(oh, packed_t,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            acc = acc + g.sum(1)
        return acc

    ref = np.asarray(sep(idx))
    for name, fn in [("sep", sep), ("packed", packed_gather),
                     ("onehot", onehot)]:
        out = np.asarray(fn(idx))
        exact = bool((out == ref).all())
        t = timeit(lambda: np.asarray(fn(idx)[0]))
        per_m = t / (R * C * E) * 1e9
        print(f"{name:7s} E={E} cap={cap}: {t * 1000:7.2f} ms "
              f"({per_m:6.1f} ms/Melem)  exact={exact}", flush=True)


if __name__ == "__main__":
    main()
