"""
Measure device-resident throughput of the fused per-tile pipeline as a
function of the tile-batch factor B (tiles vmapped into one dispatch).

Motivation (BASELINE.md roofline): at 1024^2 the fused programs are
~200 ops and a large slice of device time is fixed per-op overhead plus
the dispatch/sync round trips. Batching B tiles multiplies the work per
op without changing op count, so overheads amortize ~B-fold until the
sort/gather costs dominate. This is what CONC_MESH does across chips;
here we measure the same effect WITHIN one chip to size a
tiles-per-device knob.

Usage: python scripts/bench_tile_batch.py [B ...]   (default 1 2 4)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pyshepseg_tpu import utils  # noqa: E402
utils.setupCompilationCache(".jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_image  # noqa: E402
from pyshepseg_tpu.parallel.mesh import segment_tile_batch  # noqa: E402
from pyshepseg_tpu.ops.kmeans import TPUKMeans  # noqa: E402
from pyshepseg_tpu.shepseg import diagonalClusterCentres  # noqa: E402


def main():
    factors = [int(x) for x in sys.argv[1:]] or [1, 2, 4]
    H = W = 1024
    nb = 4
    # distinct tiles so per-tile capacities differ realistically
    tiles = [make_image(H, W, nb, seed=100 + i) for i in range(max(factors))]

    sample = tiles[0].reshape(nb, -1).T[::100].astype(np.float32)
    km = TPUKMeans(n_clusters=60, init=diagonalClusterCentres(sample, 60),
                   n_init=1)
    km.fit(sample)
    centers = jnp.asarray(km.cluster_centers_.astype(np.float32))
    maxDiff = jnp.float32(1e9)

    for B in factors:
        batch = np.stack(tiles[:B])
        batch_j = jax.device_put(batch)

        def run():
            return segment_tile_batch(
                batch_j, centers, jnp.float32(0), maxDiff,
                50, True, True)

        t0 = time.time()
        seg = run()   # compile + warm
        print(f"B={B}: first (compile) {time.time() - t0:.1f}s, "
              f"segments/tile {[int(seg[i].max()) for i in range(B)]}",
              flush=True)
        times = []
        for _ in range(3):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        best = min(times)
        mpix = B * H * W / 1e6 / best
        print(f"B={B}: device-resident best {best * 1000:.0f} ms "
              f"({mpix:.2f} Mpix/s, {best / B * 1000:.0f} ms/tile)",
              flush=True)


if __name__ == "__main__":
    main()
