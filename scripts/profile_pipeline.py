"""
On-chip profile of the three segmentation dispatches (BASELINE config 1).

Times each dispatch separately (value-fetch sync, min over repeats),
reports the clump sweep count and elimination pass count, an achieved-
bandwidth anchor (big elementwise op), and the transfer-bound fraction
(end-to-end vs device-resident). Feeds BASELINE.md's roofline notes.

Run on the TPU:  python scripts/profile_pipeline.py
"""

import os
import sys
import time
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pyshepseg_tpu import shepseg, utils  # noqa: E402
from pyshepseg_tpu.ops.elim_small import (  # noqa: E402
    round_capacity, round_capacity_fine)
from bench import make_image  # noqa: E402

utils.setupCompilationCache(
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))


def timeit(fn, repeats=5):
    fn()  # warm
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    H = W = 1024
    img = make_image(H, W, 4)
    res = shepseg.doShepherdSegmentation(
        img, numClusters=60, clusterSubsamplePcnt=1, minSegmentSize=50,
        maxSpectralDiff='auto', fourConnected=True, fixedKMeansInit=True)
    km = res.kmeans
    centers = jnp.asarray(np.asarray(km.cluster_centers_, np.float32))
    nullVal = jnp.float32(0)
    maxDiff = jnp.float32(res.maxSpectralDiff)
    img_dev = jax.device_put(img)
    np.asarray(img_dev[0, 0, 0])

    out = {"clump_sweeps": res.clumpSweeps, "elim_passes": res.elimPasses,
           "segments": int(res.segimg.max())}

    # bandwidth anchor: chain 50 elementwise ops, sync once — amortizes
    # the link round trip out of the figure. Also report the bare RTT
    # (single trivial op + scalar fetch): on the tunnel the RTT is the
    # story (~25 ms), on a TPU-VM it is ~0.1 ms.
    big = jnp.zeros((8, 1024, 1024), jnp.float32)

    @jax.jit
    def chain(x):
        for _ in range(50):
            x = x + 1.0
        return x

    def bw():
        np.asarray(chain(big)[0, 0, 0])
    t = timeit(bw)
    out["elementwise_GBps"] = round(50 * 2 * big.nbytes / t / 1e9, 1)

    tiny = jnp.zeros((8, 128), jnp.float32)
    bump = jax.jit(lambda x: x + 1.0)

    def rtt():
        np.asarray(bump(tiny)[0, 0])
    out["sync_rtt_ms"] = round(timeit(rtt) * 1000, 2)

    # dispatch 1: cluster + clump + clump-edge sort (production shape)
    def d1():
        planes, seg, a, b, first, sc0 = shepseg._cluster_and_clump_device(
            img_dev, centers, nullVal, has_null=False, four_connected=True)
        np.asarray(sc0)
        return planes, seg, a, b, first, sc0

    out["d1_cluster_clump_edges_ms"] = round(timeit(d1) * 1000, 1)
    planes, seg0, a0, b0, first0, sc0 = d1()
    (numClumps, nUniqueEdges, sweeps, nPairs,
     nRowMax, nRunsMax) = np.asarray(sc0).tolist()
    capacity = round_capacity(int(numClumps) + 1)
    eCap = shepseg._edgeCapForCount(int(nUniqueEdges))
    rlEff = shepseg._rlCapEffective(
        shepseg._runCapForCount(int(nRunsMax)), img_dev.dtype,
        int(img_dev.shape[2]))
    out["b_pairs"] = int(nPairs)
    out["rl_cap"] = rlEff

    # dispatch 2 (production): FUSED single-pixel elim + reductions +
    # graph elimination + relabel
    def d2():
        seg2, sc = shepseg._elim_fused_device(
            planes, seg0, a0, b0, first0, maxDiff, min_seg_size=50,
            four_connected=True, capacity=capacity, e_cap=eCap,
            rl_cap=rlEff)
        np.asarray(sc)

    out["d2_fused_elim_ms"] = round(timeit(d2) * 1000, 1)

    # Breakdown via the split (overflow-fallback) dispatches: single-pixel
    # stage + its own edge sort vs the bare graph loop + relabel.
    sweeps_dev = jnp.uint32(int(sweeps))

    def d2a():
        r = shepseg._elim_single_and_edges_device(
            planes, seg0, sweeps_dev, four_connected=True,
            capacity=capacity)
        np.asarray(r[-1])
        return r

    out["d2a_single_and_edge_sort_ms"] = round(timeit(d2a) * 1000, 1)
    seg1, size, spect, ea, eb, first, sc1 = d2a()
    # quarter-step bucket, matching the production fallback
    # (shepseg.py uses round_capacity_fine for the edge capacity)
    eCap2 = round_capacity_fine(int(np.asarray(sc1)[1]) + 1)

    def d2b():
        seg2, sc2 = shepseg._elim_small_finish_device(
            seg1, size, spect, ea, eb, first, maxDiff,
            min_seg_size=50, e_cap=eCap2, capacity=capacity)
        np.asarray(sc2)

    out["d2b_graph_elim_relabel_ms"] = round(timeit(d2b) * 1000, 1)
    out["capacity"] = capacity
    out["e_cap"] = eCap

    # transfer-bound fraction: end-to-end vs compute-only
    co = shepseg.deviceResidentThroughput(img, km, res.maxSpectralDiff,
                                          minSegmentSize=50, repeats=3)
    out["compute_only_mpix_s"] = round(co, 2)

    def e2e():
        shepseg.doShepherdSegmentation(
            img, numClusters=60, clusterSubsamplePcnt=1,
            minSegmentSize=50, maxSpectralDiff='auto', fourConnected=True,
            kmeansObj=km)
    t = timeit(e2e, repeats=3)
    out["end_to_end_mpix_s"] = round((H * W / 1e6) / t, 2)
    out["transfer_fit_fraction"] = round(
        1 - out["end_to_end_mpix_s"] / out["compute_only_mpix_s"], 3)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
