"""
A/B: single-chip tiled segmentation — CONC_THREADS vs CONC_MESH with
tilesPerDevice batching. All variants run warm in ONE process/window so
the numbers are comparable despite the tunnel's drift (BASELINE.md
hygiene notes). Usage:

    nohup python -u scripts/ab_mesh_batch.py > /tmp/ab_mesh.log 2>&1 &
"""

import os
import sys
import time
import json
import tempfile
import shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyshepseg_tpu import tiling, utils  # noqa: E402

utils.setupCompilationCache(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

import bench  # noqa: E402


def run_variant(name, imgfile, tempDir, cfg, repeats=2):
    segfile = os.path.join(tempDir, "seg_{}.npseg".format(name))
    times = []
    for i in range(repeats):
        t0 = time.time()
        res = tiling.doTiledShepherdSegmentation(
            imgfile, segfile, tileSize=1024, overlapSize=256,
            numClusters=60, minSegmentSize=50, fixedKMeansInit=True,
            fourConnected=True, concurrencyCfg=cfg)
        times.append(time.time() - t0)
        print("  {} run {}: {:.1f}s maxSegId={}".format(
            name, i, times[-1], res.maxSegId), flush=True)
    best = min(times)
    rec = {"variant": name, "best_s": round(best, 2),
           "mpix_s": round(6400 * 6400 / 1e6 / best, 3),
           "maxSegId": int(res.maxSegId)}
    print("AB:", json.dumps(rec), flush=True)
    return rec


def main():
    tempDir = tempfile.mkdtemp(prefix="ab_mesh_")
    try:
        print("building scene...", flush=True)
        imgfile = bench._make_scene(tempDir)

        variants = []
        cfgT = tiling.SegmentationConcurrencyConfig(
            concurrencyType=tiling.CONC_THREADS, numWorkers=3,
            tileCompletionTimeout=900)
        # first run of threads doubles as the whole-process warm-up
        variants.append(run_variant("threads3", imgfile, tempDir, cfgT))

        for tpd in (1, 4, 8):
            cfgM = tiling.SegmentationConcurrencyConfig(
                concurrencyType=tiling.CONC_MESH,
                tileCompletionTimeout=900, tilesPerDevice=tpd)
            variants.append(run_variant(
                "mesh_tpd{}".format(tpd), imgfile, tempDir, cfgM))

        # identical outputs across variants?
        ids = {v["maxSegId"] for v in variants}
        print("RESULT:", json.dumps(
            {"variants": variants, "maxSegIds_agree": len(ids) == 1}),
            flush=True)
    finally:
        shutil.rmtree(tempDir, ignore_errors=True)


if __name__ == "__main__":
    main()
