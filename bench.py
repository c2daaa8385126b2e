"""
Benchmark: all five BASELINE.md configs on the available accelerator.

Prints ONE JSON line. The top-level keys keep the original driver
contract — metric/value/unit/vs_baseline describe the headline config
(#1, doShepherdSegmentation on one in-memory 1024x1024 4-band uint16
tile) — and the "configs" key carries every measured config so each axis
(in-memory, large-tile, tiled, stats, subset) is tracked round-over-round:

  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N,
   "configs": [{"name": ..., "value": N, "unit": ..., "vs_baseline": N},
               ...],
   "pallas_compiled_check": "ok"|"FAILED"|"skipped (not tpu)"}

vs_baseline is measured against REF_BASELINE_MPIX_S, an estimate of the
reference's numba-on-CPU throughput (the reference publishes no numbers —
see BASELINE.md); configs with no meaningful reference estimate report
vs_baseline = null.

Env knobs: BENCH_CONFIGS="1,3" runs a subset (default:
"1,2,3,4,5,golden"). "golden" is the end-to-end oracle at the
reference's own 8000^2 / 101-centre scale (reference runtests.py:27-40)
— ~5-10 min through the tunnelled chip, included by default so the
scale check lands in every recorded BENCH artifact.
"""

import os
import sys
import json
import time
import traceback

os.environ.setdefault("XLA_FLAGS", "")


def _guard(results, label, fn, *args, **kwargs):
    """Run one config measurement; an exception records an error entry
    and the bench CONTINUES — the driver contract is one rc=0 JSON line
    with a record per config even when a config fails (a bench that can
    rc=1 on a data-dependent count is not a benchmark harness — VERDICT
    round-3 item 1). Returns the config's value, or None on failure."""
    try:
        return fn(*args, **kwargs)
    except Exception:
        tb = traceback.format_exc()
        print(f"BENCH-ERROR in {label}:\n{tb}", file=sys.stderr, flush=True)
        results.append({
            "name": f"{label}: FAILED",
            "value": None, "unit": None, "vs_baseline": None,
            "error": tb.strip().splitlines()[-1]})
        return None


def _full_record_path():
    """Repo-resident file that receives the COMPLETE bench record.

    The driver's BENCH_rNN.json artifact keeps only a ~2 KB stdout tail,
    which truncated away every config record in round 4 (VERDICT round-4
    weak #2) — the repo itself must retain the full numbers (the
    reference publishes none, SURVEY §6, so this file IS the published
    record). Override with BENCH_FULL_OUT; BENCH_ROUND picks the round
    stamp (default: the current round of the continuous build).
    """
    explicit = os.environ.get("BENCH_FULL_OUT")
    if explicit:
        return explicit
    rnd = os.environ.get("BENCH_ROUND", "05")
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"BENCH_full_r{rnd}.json")


class _ProgressList(list):
    """Results list that echoes each record to stderr as it lands AND
    checkpoints the full record file, so an interrupted run still leaves
    its completed measurements on record (the driver contract is ONE
    stdout JSON line at the end; the repo contract is a complete
    committed BENCH_full_rNN.json)."""

    def append(self, rec):
        print("BENCH-PARTIAL:", json.dumps(rec), file=sys.stderr,
              flush=True)
        super().append(rec)
        try:
            _write_full_record({"partial": True, "configs": list(self)})
        except Exception:
            pass


def _run_context():
    """Host-load / backend context recorded alongside every run, so a
    number can be discounted when the box or the tunnel was contended
    (BASELINE.md hygiene notes: identical code swings 2-5x by window)."""
    ctx = {"backend": None, "loadavg_1m": None, "ncpu": os.cpu_count(),
           "time": time.strftime("%Y-%m-%dT%H:%M:%S")}
    try:
        ctx["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    try:
        ctx["backend"] = jax.default_backend()
    except Exception:
        pass
    return ctx


def _write_full_record(out):
    """Persist the record, refusing to CLOBBER a completed artifact with
    a lesser one: checkpoint/error records divert to <path>.inprogress
    when the target already holds a finished (partial=false, no error)
    run — the committed BENCH_full_rNN.json that BASELINE.md cites must
    survive a later partial or tunnel-outage run. A new COMPLETE run
    replaces the old record (and clears its .inprogress checkpoint)."""
    path = _full_record_path()
    complete = not out.get("partial", False) and "error" not in out
    if not complete and os.path.exists(path):
        try:
            with open(path) as f:
                existing = json.load(f)
            if (not existing.get("partial", False) and
                    "error" not in existing):
                path = path + ".inprogress"
        except (ValueError, OSError):
            pass
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    os.replace(tmp, path)
    if complete:
        try:
            os.remove(_full_record_path() + ".inprogress")
        except OSError:
            pass

import numpy as np  # noqa: E402

import jax  # noqa: E402

# A backend site customization can override JAX_PLATFORMS from the
# environment; honour an explicit platform request (e.g. a CPU smoke
# run of this script) through the config API, which wins.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from pyshepseg_tpu import shepseg, utils  # noqa: E402

# Persistent compile cache (the k-means fit bypasses it on the dev
# tunnel, where loading its cached executable is slower than a fresh
# compile — see _backend_quirks.setupCompilationCache).
utils.setupCompilationCache(
    os.path.join(os.path.dirname(__file__), ".jax_cache"))

# Estimated reference (numba CPU) throughput for the segmentation
# configs, in Mpix/s. The reference repo publishes no benchmark numbers
# (BASELINE.md); this figure is a generous estimate for numba-parallel
# CPU on this workload.
REF_BASELINE_MPIX_S = 0.7

# Scene edge for configs 3-5 (must be a multiple of the 1600-px base
# pattern). The default is the BASELINE config; a smaller value (e.g.
# BENCH_SCENE_SIZE=1600) makes the whole bench smokable on a CPU host.
SCENE_SIZE = int(os.environ.get("BENCH_SCENE_SIZE", "6400"))


def make_image(h, w, nbands, ncells=400, seed=7):
    """Synthetic Landsat-like tile: Voronoi patches + noise, uint16."""
    rng = np.random.default_rng(seed)
    centres = rng.uniform(0, [h, w], size=(ncells, 2)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cells = np.zeros((h, w), dtype=np.int32)
    best = np.full((h, w), np.inf, dtype=np.float32)
    for start in range(0, ncells, 50):  # nearest centre, bounded memory
        c = centres[start:start + 50]
        d = ((yy[..., None] - c[:, 0]) ** 2 +
             (xx[..., None] - c[:, 1]) ** 2)
        idx = d.argmin(axis=-1)
        val = d.min(axis=-1)
        upd = val < best
        cells[upd] = idx[upd] + start
        best[upd] = val[upd]
    palette = rng.integers(100, 4000, size=(ncells, nbands))
    img = palette[cells].transpose(2, 0, 1)
    img = img + rng.normal(0, 8.0, img.shape)
    return np.clip(img, 0, 65535).astype(np.uint16)


def _run_config1(results):
    """Config 1: 1024^2 4-band in-memory, plus a compute-only figure
    (device-resident, transfers and k-means fit excluded)."""
    H = W = 1024
    img = make_image(H, W, 4)

    def run():
        return shepseg.doShepherdSegmentation(
            img, numClusters=60, clusterSubsamplePcnt=1,
            minSegmentSize=50, maxSpectralDiff='auto',
            fourConnected=True, fixedKMeansInit=True)

    res = run()  # warm-up (compiles)
    assert res.segimg.max() > 0

    times = []
    for _ in range(3):
        t0 = time.time()
        res = run()
        times.append(time.time() - t0)
    mpix_s = (H * W / 1e6) / min(times)
    results.append({
        "name": ("config1: doShepherdSegmentation 1024x1024 4-band uint16 "
                 "(numClusters=60, minSegmentSize=50, 4-connected)"),
        "value": round(mpix_s, 3), "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REF_BASELINE_MPIX_S, 2),
        "clump_sweeps": res.clumpSweeps,
        "elim_graph_passes": res.elimPasses})

    # Compute-only: image already on device, k-means already fitted; time
    # the three fused dispatches + the two capacity-picking scalar syncs,
    # excluding host<->device image transfers (the tunnel's ~40 MB/s is
    # not representative of a directly-attached TPU VM).
    co = shepseg.deviceResidentThroughput(img, res.kmeans,
                                          res.maxSpectralDiff,
                                          minSegmentSize=50, repeats=3)
    results.append({
        "name": "config1-compute-only: device-resident pipeline, "
                "transfers and k-means fit excluded",
        "value": round(co, 3), "unit": "Mpix/s",
        "vs_baseline": round(co / REF_BASELINE_MPIX_S, 2)})

    # TUNNEL-INSENSITIVE tracked metric: per-run device time over 8
    # pipelined one-shot dispatches with the bare sync RTT subtracted —
    # round-over-round deltas of THIS number measure code, not the
    # shared link (see BASELINE.md measurement-hygiene notes).
    dev_s, rtt = shepseg.deviceOnlySeconds(
        img, res.kmeans, res.maxSpectralDiff, minSegmentSize=50, k=8)
    dev_rate = (H * W / 1e6) / dev_s if dev_s > 0 else None
    results.append({
        "name": "config1-device-only: per-run device time, 8 pipelined "
                "one-shot dispatches, sync RTT subtracted "
                "(tunnel-insensitive)",
        "value": round(dev_rate, 3) if dev_rate else None,
        "unit": "Mpix/s",
        "vs_baseline": (round(dev_rate / REF_BASELINE_MPIX_S, 2)
                        if dev_rate else None),
        "device_s": round(dev_s, 4),
        "sync_rtt_ms": round(rtt * 1000, 2)})

    # On-chip A/B of the Pallas LUT-gather kernel (ops/lut.py) against
    # XLA's generic gather, on the exact gather _remap_and_relabel
    # issues in every one-shot dispatch. TPU-only (the kernel is gated
    # off elsewhere); guarded so a Mosaic regression can't lose config1.
    _guard(results, "config1-lut-ab", _lut_gather_ab, results)

    # The row-sharded whole-image pipeline (parallel/shardmap_seg) on the
    # same tile and fitted centres — a 1-device mesh here, so this tracks
    # the shard_map program's Mosaic lowering and single-chip throughput
    # every round (multi-chip scaling is validated on the virtual CPU
    # mesh by dryrun_multichip).
    from pyshepseg_tpu.parallel.shardmap_seg import segment_image_sharded
    centers = np.asarray(res.kmeans.cluster_centers_, dtype=np.float32)

    def run_sharded():
        return segment_image_sharded(
            img, centers, maxSpectralDiff=float(res.maxSpectralDiff),
            minSegmentSize=50, fourConnected=True)

    seg_sh, max_sh = run_sharded()   # warm-up (compiles)
    t0 = time.time()
    seg_sh, max_sh = run_sharded()
    sh_rate = (H * W / 1e6) / (time.time() - t0)
    results.append({
        "name": "config1-sharded: same tile via the row-sharded "
                "whole-image pipeline (1-device mesh)",
        "value": round(sh_rate, 3), "unit": "Mpix/s",
        "vs_baseline": round(sh_rate / REF_BASELINE_MPIX_S, 2),
        "maxSegId_matches_single_chip": max_sh == int(res.segimg.max())})
    return mpix_s


def _lut_gather_ab(results, capacity=4096, k=16):
    """A/B the two lowerings of the full-image id-remap gather at 1024^2
    from a capacity-sized table: XLA generic gather vs the Pallas VMEM
    LUT kernel. k dispatches pipelined per measurement, one sync, bare
    RTT subtracted (tunnel-insensitive)."""
    import jax.numpy as jnp
    from pyshepseg_tpu.ops import lut

    if jax.devices()[0].platform != "tpu":
        return   # kernel is TPU-only; CPU smoke skips the record

    h = w = 1024
    rng = np.random.default_rng(5)
    idx = jnp.asarray(rng.integers(0, capacity, size=(h, w))
                      .astype(np.uint32))
    table = jnp.asarray(rng.integers(0, 1 << 30, size=(capacity,))
                        .astype(np.uint32))
    xla_f = jax.jit(lambda i, t: t[i.astype(jnp.int32)])
    lut_f = jax.jit(lambda i, t: lut.lut_gather(i, t, interpret=False))
    np.asarray(xla_f(idx, table)[0, 0])
    np.asarray(lut_f(idx, table)[0, 0])

    tiny = jnp.zeros((8, 128), jnp.float32)
    bump = jax.jit(lambda x: x + 1.0)
    np.asarray(bump(tiny)[0, 0])
    rtts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(bump(tiny)[0, 0])
        rtts.append(time.time() - t0)
    rtt = min(rtts)

    def per_dispatch_s(f):
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [f(idx, table) for _ in range(k)]
            np.asarray(outs[-1][0, 0])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return max(best - rtt, 1e-9) / k

    xla_s = per_dispatch_s(xla_f)
    lut_s = per_dispatch_s(lut_f)
    results.append({
        "name": "config1-lut-ab: 1024^2 id-remap gather from a "
                f"{capacity}-entry table — Pallas VMEM LUT kernel vs "
                "XLA generic gather (speedup; tunnel-insensitive)",
        "value": round(xla_s / lut_s, 2), "unit": "x",
        "vs_baseline": None,
        "xla_ms_per_mpix": round(xla_s * 1e3 / (h * w / 1e6), 3),
        "lut_ms_per_mpix": round(lut_s * 1e3 / (h * w / 1e6), 3)})


def _run_config2(results):
    """Config 2: 2048^2 6-band, 8-connected, auto maxSpectralDiff."""
    H = W = 2048
    img = make_image(H, W, 6, ncells=1200, seed=11)

    def run():
        return shepseg.doShepherdSegmentation(
            img, numClusters=60, clusterSubsamplePcnt=1,
            minSegmentSize=50, maxSpectralDiff='auto',
            fourConnected=False, fixedKMeansInit=True)

    res = run()  # warm-up
    t0 = time.time()
    run()
    mpix_s = (H * W / 1e6) / (time.time() - t0)
    results.append({
        "name": "config2: doShepherdSegmentation 2048x2048 6-band, "
                "8-connected, auto maxSpectralDiff",
        "value": round(mpix_s, 3), "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REF_BASELINE_MPIX_S, 2)})

    dev_s, rtt = shepseg.deviceOnlySeconds(
        img, res.kmeans, res.maxSpectralDiff, minSegmentSize=50,
        fourConnected=False, k=4)
    dev_rate = (H * W / 1e6) / dev_s if dev_s > 0 else None
    results.append({
        "name": "config2-device-only: per-run device time, 4 pipelined "
                "one-shot dispatches, sync RTT subtracted "
                "(tunnel-insensitive)",
        "value": round(dev_rate, 3) if dev_rate else None,
        "unit": "Mpix/s", "vs_baseline": None,
        "device_s": round(dev_s, 4),
        "sync_rtt_ms": round(rtt * 1000, 2)})


def _make_scene(tempDir, size=6400, nbands=4):
    """A size^2 nbands scene on disk: a 1600^2 Voronoi base image tiled
    out (periodic content — throughput-representative, cheap to build)."""
    from pyshepseg_tpu import io as rio
    base = make_image(1600, 1600, nbands, ncells=900, seed=23)
    reps = size // 1600
    imgfile = os.path.join(tempDir, "scene.npseg")
    ds = rio.create(imgfile, size, size, nbands, np.uint16)
    ds.SetGeoTransform((0, 1, 0, 0, 0, -1))
    for b in range(nbands):
        big = np.tile(base[b], (reps, reps))
        bandobj = ds.GetRasterBand(b + 1)
        bandobj.SetNoDataValue(0)
        bandobj.WriteArray(big)
    ds.FlushCache()
    del ds
    return imgfile


def _run_config3(results, tempDir):
    """Config 3: tiled 6400^2 4-band, tileSize 1024 / overlap 256,
    CONC_THREADS overlapping reads with device compute."""
    from pyshepseg_tpu import tiling

    imgfile = _make_scene(tempDir, size=SCENE_SIZE)
    segfile = os.path.join(tempDir, "seg.npseg")
    # tileCompletionTimeout covers the first tile's one-off XLA compile
    # (minutes through the tunnel when the kernels changed this round)
    cfg = tiling.SegmentationConcurrencyConfig(
        concurrencyType=tiling.CONC_THREADS, numWorkers=3,
        tileCompletionTimeout=900)
    t0 = time.time()
    res = tiling.doTiledShepherdSegmentation(
        imgfile, segfile, tileSize=1024, overlapSize=256,
        numClusters=60, minSegmentSize=50, fixedKMeansInit=True,
        fourConnected=True, concurrencyCfg=cfg)
    elapsed = time.time() - t0
    mpix_s = (SCENE_SIZE * SCENE_SIZE / 1e6) / elapsed
    results.append({
        "name": f"config3-cold: doTiledShepherdSegmentation "
                f"{SCENE_SIZE}x{SCENE_SIZE} "
                "4-band (tileSize=1024, overlap=256, CONC_THREADS x3), "
                "first run in the process — includes one-off XLA "
                "compiles (dominated by the whole-file k-means fit's "
                "~1M-point Lloyd program)",
        "value": round(mpix_s, 3), "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REF_BASELINE_MPIX_S, 2)})

    t0 = time.time()
    res = tiling.doTiledShepherdSegmentation(
        imgfile, segfile, tileSize=1024, overlapSize=256,
        numClusters=60, minSegmentSize=50, fixedKMeansInit=True,
        fourConnected=True, concurrencyCfg=cfg)
    elapsed = time.time() - t0
    mpix_s = (SCENE_SIZE * SCENE_SIZE / 1e6) / elapsed
    summary = res.timings.makeSummaryDict()
    phase_s = {k: round(v["total"], 2) for k, v in summary.items()
               if k in ("reading", "segmentation", "stitchtiles",
                        "stitchwait")}
    # pure host stitch work = stitch loop minus time spent waiting on
    # worker tiles
    if "stitchtiles" in phase_s:
        phase_s["stitchwork"] = round(
            phase_s["stitchtiles"] - phase_s.get("stitchwait", 0.0), 2)
    results.append({
        "name": "config3: same tiled run, warm executables (the "
                "steady-state production figure)",
        "value": round(mpix_s, 3), "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REF_BASELINE_MPIX_S, 2),
        "phase_seconds": phase_s})

    # UNCONTENDED host stitch: the threads run's stitchwork timer shares
    # this box's single CPU with 3 worker threads, inflating it 25-90%
    # run to run (1.46 vs 1.85 s for identical code in adjacent
    # windows). A CONC_NONE run stitches strictly AFTER segmentation, so
    # its stitch phase is the clean figure a multi-core TPU-VM's
    # dedicated stitcher thread sees; the pipelined estimate below uses
    # it. Kept next to the contended number for transparency.
    def serial_stitch():
        segfileS = os.path.join(tempDir, "seg_serial.npseg")
        resS = tiling.doTiledShepherdSegmentation(
            imgfile, segfileS, tileSize=1024, overlapSize=256,
            numClusters=60, minSegmentSize=50, fixedKMeansInit=True,
            fourConnected=True)
        sm = resS.timings.makeSummaryDict()
        final_s = round(sm.get("stitchfinalize", {}).get("total", 0.0), 2)
        # the per-tile stitch LOOP: waits and the one-off epilogue
        # (histogram RAT write + output flush, timed as stitchfinalize)
        # excluded — the loop is what races the device tile loop in a
        # pipelined run; the epilogue runs once after both finish and is
        # reported alongside
        stitch_s = round(sm["stitchtiles"]["total"] -
                         sm.get("stitchwait", {}).get("total", 0.0) -
                         final_s, 2)
        results.append({
            "name": "config3-serial-stitch: per-tile host stitch loop of "
                    "a CONC_NONE run (no worker-thread CPU contention — "
                    "the figure a TPU-VM's dedicated stitcher core sees)",
            "value": stitch_s, "unit": "seconds", "vs_baseline": None,
            "stitchfinalize_s": final_s,
            "maxSegId_matches_threads": resS.maxSegId == res.maxSegId})
        return stitch_s

    stitchSerial = _guard(results, "config3-serial-stitch", serial_stitch)
    if stitchSerial is not None:
        phase_s = dict(phase_s)
        phase_s["stitchwork_threads_contended"] = phase_s.get("stitchwork")
        phase_s["stitchwork"] = stitchSerial

    # TUNNEL-INSENSITIVE tiled metric: the pure device tile loop — the
    # scene resident in HBM (as the production scene cache holds it),
    # every tile's one-shot pipeline dispatched back-to-back with NO
    # per-tile downloads, one sync at the end, bare RTT subtracted —
    # plus the uncontended host stitch time measured above. On a
    # directly-attached TPU VM the production pipeline overlaps the two
    # (the stitcher consumes tiles while workers compute), so the
    # pipelined estimate divides the scene by max(loop, stitch).
    # Guarded individually: a failure here must not lose configs 4/5.
    rec = _guard(results, "config3-device-tile-loop",
                 _config3_device_tile_loop, imgfile, res, phase_s)
    if rec is not None:
        results.append(rec)

    def mesh_run():
        # The multi-chip backend's single-chip health check. CONC_MESH
        # with tilesPerDevice=1 — the measured optimum since the one-shot
        # dispatch path landed (round-3 on-chip A/B: batching multiplies
        # fixpoint convergence to the slowest batch member and competes
        # with the scene cache for HBM; the old tpd=4 guidance predates
        # it). Slower than CONC_THREADS through the tunnel (the thread
        # pool hides link RTTs), but this keeps the mesh path's
        # Mosaic-compiled programs validated and timed.
        # Run it TWICE: the first run carries the backend's one-off
        # Mosaic batch compiles, so only the second (warm) run reflects
        # the steady state (VERDICT round-4 item 7 — the sole recorded
        # mesh number was cold and made the scaling backend look 17x
        # slower than threads).
        segfileM = os.path.join(tempDir, "seg_mesh.npseg")
        cfgM = tiling.SegmentationConcurrencyConfig(
            concurrencyType=tiling.CONC_MESH, tileCompletionTimeout=900,
            tilesPerDevice=1)
        for label, note in (
                ("config3-mesh-cold", "includes the backend's one-off "
                 "Mosaic batch compiles"),
                ("config3-mesh-warm", "steady state — executables warm; "
                 "compare against config3 threads")):
            t0 = time.time()
            resM = tiling.doTiledShepherdSegmentation(
                imgfile, segfileM, tileSize=1024, overlapSize=256,
                numClusters=60, minSegmentSize=50, fixedKMeansInit=True,
                fourConnected=True, concurrencyCfg=cfgM)
            elapsed = time.time() - t0
            mpix_s_m = (SCENE_SIZE * SCENE_SIZE / 1e6) / elapsed
            results.append({
                "name": f"{label}: scene via CONC_MESH tilesPerDevice=1 "
                        f"(the multi-chip backend on one chip; {note})",
                "value": round(mpix_s_m, 3), "unit": "Mpix/s",
                "vs_baseline": round(mpix_s_m / REF_BASELINE_MPIX_S, 2),
                "maxSegId_matches_threads": resM.maxSegId == res.maxSegId})

    _guard(results, "config3-mesh", mesh_run)
    return imgfile, segfile, res


def _config3_device_tile_loop(imgfile, res, phase_s, repeats=2):
    """Device-only throughput of the tiled segmentation's compute: all
    tiles' one-shot pipelines dispatched back-to-back against the
    HBM-resident scene, results left on device, one scalar fetch at the
    end, bare sync RTT subtracted. This is the number a directly-
    attached TPU VM's tile loop approaches; combined with the host
    stitch time (measured above) it bounds the end-to-end figure there."""
    import jax
    import jax.numpy as jnp
    from pyshepseg_tpu import io as rio
    from pyshepseg_tpu import tiling
    from pyshepseg_tpu import shepseg as ss

    inDs = rio.open(imgfile)
    bandNumbers = list(range(1, inDs.RasterCount + 1))
    tileInfo = tiling.getTilesForFile(inDs, 1024, 256)
    imgNullVal = tiling.getImgNullValue(inDs, bandNumbers)
    cache = tiling.DeviceSceneCache(inDs, bandNumbers)
    centers = jnp.asarray(np.asarray(res.kmeans.cluster_centers_,
                                     dtype=np.float32))
    hasNull = imgNullVal is not None
    nullVal = ss.null_scalar(imgNullVal if hasNull else 0,
                             cache.scene.dtype)
    # the tiled result reports the configured setting ('auto' here);
    # resolve it to the numeric threshold the per-tile runs used
    maxDiff = jnp.float32(ss.autoMaxSpectralDiff(
        res.kmeans, res.maxSpectralDiff, 50))
    colRows = sorted(tileInfo.tiles.keys(), key=lambda x: (x[1], x[0]))

    def measure_caps(sample):
        """Exact per-tile counts via the measured (two-dispatch) path."""
        scs = []
        for (col, row) in sample:
            (xpos, ypos, xsize, ysize) = tileInfo.getTile(col, row)
            img = cache.getTile(xpos, ypos, xsize, ysize)
            scs.append(ss._cluster_and_clump_device(
                img, centers, nullVal, has_null=hasNull,
                four_connected=True)[5])
        return np.stack([np.asarray(s) for s in scs])

    # speculative buckets from the first row of tiles x2 margin; a tile
    # that still overflows triggers a refit from an exact measured pass
    # over ALL tiles (the production path's behavior — never an assert)
    sc0s = measure_caps(colRows[:tileInfo.ncols])
    capacity = ss.round_capacity(int(sc0s[:, 0].max()) * 2 + 1)
    eCap = ss._edgeCapForCount(int(sc0s[:, 1].max() * 2))
    bCap = ss._boundaryCapForCount(int(sc0s[:, 3].max() * 2))
    rCap = ss._rowCapForCount(int(sc0s[:, 4].max() * 2))
    rlCap = ss._runCapForCount(int(sc0s[:, 5].max() * 2))

    def loop():
        outs = []
        for (col, row) in colRows:
            (xpos, ypos, xsize, ysize) = tileInfo.getTile(col, row)
            img = cache.getTile(xpos, ypos, xsize, ysize)
            outs.append(ss._segment_one_shot_device(
                img, centers, nullVal, maxDiff, has_null=hasNull,
                four_connected=True, min_seg_size=50,
                capacity=capacity, e_cap=eCap, b_cap=bCap,
                r_cap=rCap,
                rl_cap=ss._rlCapEffective(rlCap, cache.scene.dtype,
                                          xsize)))
        return outs

    outs = loop()  # warm (compile)
    scalars = np.stack([np.asarray(sc) for _, sc in outs])
    refit = False
    if scalars[:, 7].any():
        refit = True
        scs = measure_caps(colRows)   # exact counts, every tile
        capacity = ss.round_capacity(int(scs[:, 0].max()) + 1)
        eCap = ss._edgeCapForCount(int(scs[:, 1].max()))
        bCap = ss._boundaryCapForCount(int(scs[:, 3].max()))
        rCap = ss._rowCapForCount(int(scs[:, 4].max()))
        rlCap = ss._runCapForCount(int(scs[:, 5].max()))
        outs = loop()   # re-warm with the exact buckets
        scalars = np.stack([np.asarray(sc) for _, sc in outs])
    residual_overflow = bool(scalars[:, 7].any())

    tiny = jnp.zeros((8, 128), jnp.float32)
    bump = jax.jit(lambda x: x + 1.0)
    np.asarray(bump(tiny)[0, 0])
    rtts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(bump(tiny)[0, 0])
        rtts.append(time.time() - t0)
    rtt = min(rtts)

    best = None
    for _ in range(repeats):
        t0 = time.time()
        outs = loop()
        np.asarray(outs[-1][1])   # one sync drains the in-order stream
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    loop_s = max(best - rtt, 1e-9)
    del outs, cache

    scene_mpix = SCENE_SIZE * SCENE_SIZE / 1e6
    loop_rate = scene_mpix / loop_s
    stitch_s = phase_s.get("stitchwork", phase_s.get("stitchtiles", 0.0))
    est = scene_mpix / max(loop_s, stitch_s) if stitch_s else None
    return {
        "name": "config3-device-tile-loop: all tiles' one-shot pipelines "
                "back-to-back on the HBM-resident scene, no per-tile "
                "downloads, sync RTT subtracted (tunnel-insensitive)",
        "value": round(loop_rate, 3), "unit": "Mpix/s",
        "vs_baseline": round(loop_rate / REF_BASELINE_MPIX_S, 2),
        "device_loop_s": round(loop_s, 3),
        "host_stitch_s": stitch_s,
        "tpuvm_pipelined_estimate_mpix_s":
            round(est, 3) if est else None,
        "num_tiles": len(colRows),
        "bucket_refit": refit,
        "residual_overflow": residual_overflow}


def _fallback_scene_seg(tempDir):
    """Serial CONC_NONE scene + segmentation for configs 4/5 when
    config 3 failed (they only need the files on disk)."""
    from pyshepseg_tpu import tiling
    imgfile = _make_scene(tempDir, size=SCENE_SIZE)
    segfile = os.path.join(tempDir, "seg_fallback.npseg")
    res = tiling.doTiledShepherdSegmentation(
        imgfile, segfile, tileSize=1024, overlapSize=256,
        numClusters=60, minSegmentSize=50, fixedKMeansInit=True,
        fourConnected=True)
    return imgfile, segfile, res


def _run_config4(results, imgfile, segfile):
    """Config 4: per-segment stats + spatial stats over the scene."""
    from pyshepseg_tpu import tilingstats
    from pyshepseg_tpu import io as rio

    npix = SCENE_SIZE * SCENE_SIZE / 1e6

    def host_engine():
        t0 = time.time()
        tilingstats.calcPerSegmentStatsTiled(
            imgfile, 1, segfile,
            [("b1_mean", "mean"), ("b1_stddev", "stddev"),
             ("b1_p75", "percentile", 75)], engine='host')
        stats_rate = npix / (time.time() - t0)
        results.append({
            "name": "config4: calcPerSegmentStatsTiled mean/stddev/p75 "
                    f"over {npix:.0f} Mpix scene (host engine)",
            "value": round(stats_rate, 3), "unit": "Mpix/s",
            "vs_baseline": None})

    def multiband():
        # Multi-band one-pass vs per-band passes (the reference's only
        # mode): same columns, one read+stream of the segmentation.
        def selFor(b, tag):
            return [(f"mb{b}_mean_{tag}", "mean"),
                    (f"mb{b}_p75_{tag}", "percentile", 75)]

        t0 = time.time()
        tilingstats.calcPerSegmentStatsTiledMultiBand(
            imgfile, [1, 2, 3, 4], segfile,
            [selFor(b, "one") for b in range(1, 5)], engine='host')
        onePass = time.time() - t0
        t0 = time.time()
        for b in range(1, 5):
            tilingstats.calcPerSegmentStatsTiled(
                imgfile, b, segfile, selFor(b, "per"), engine='host')
        perBand = time.time() - t0
        results.append({
            "name": "config4-multiband: mean/p75 of 4 bands, one pass "
                    f"over the {npix:.0f} Mpix segmentation vs 4 "
                    "single-band passes",
            "value": round(4 * npix / onePass, 3), "unit": "Mpix/s",
            "vs_baseline": None,
            "one_pass_s": round(onePass, 2),
            "per_band_s": round(perBand, 2),
            "speedup_vs_per_band": round(perBand / onePass, 2)})

    def device_engine():
        # Device engine: same columns bit-for-bit, compaction on the
        # TPU — exercises the Mosaic-compiled sort path every round.
        # Measured on a small window: through the tunnelled dev chip the
        # per-tile uploads dominate (which is why engine='auto' picks
        # the host there); the figure tracks the device path's health,
        # not its TPU-VM throughput.
        from pyshepseg_tpu import subset as _subset
        winfile = os.path.join(os.path.dirname(segfile), "win.npseg")
        _subset.subsetImage(segfile, winfile, 0, 0, 1600, 1600, None)
        winimg = os.path.join(os.path.dirname(segfile), "winimg.npseg")
        ds = rio.open(imgfile)
        arr = ds.GetRasterBand(1).ReadAsArray(0, 0, 1600, 1600)
        wds = rio.create(winimg, 1600, 1600, 1, arr.dtype)
        # match the subset's geo metadata so the alignment checks pass
        subDs = rio.open(winfile)
        wds.SetGeoTransform(subDs.GetGeoTransform())
        wds.SetProjection(subDs.GetProjection())
        wb = wds.GetRasterBand(1)
        wb.SetNoDataValue(0)
        wb.WriteArray(arr)
        wds.FlushCache()
        del wds
        t0 = time.time()
        tilingstats.calcPerSegmentStatsTiled(
            winimg, 1, winfile,
            [("b1_mean_d", "mean"), ("b1_p75_d", "percentile", 75)],
            engine='device')
        dev_rate = (1600 * 1600 / 1e6) / (time.time() - t0)
        results.append({
            "name": "config4-device: stats via TPU sort-based "
                    "compaction, 1600^2 window, scene-resident HBM feed "
                    "(one upload, windows sliced on device)",
            "value": round(dev_rate, 3), "unit": "Mpix/s",
            "vs_baseline": None})

    def chip_rate():
        # Tunnel-insensitive: the device compaction's ON-CHIP rate — K
        # window compactions back-to-back on a resident scene, one sync,
        # bare RTT subtracted. This is the figure that decides whether
        # the device engine beats the host engine on a directly-attached
        # TPU (VERDICT round-2 item 4 / round-3 item 3).
        results.append(_deviceStatsChipRate(segfile, imgfile))

    def spatial():
        transform = np.array([0, 1, 0, 0, 0, -1], dtype=np.float64)
        t0 = time.time()
        tilingstats.calcPerSegmentSpatialStatsTiled(
            imgfile, 1, segfile,
            [("b1_easting", rio.GFT_Real), ("b1_northing", rio.GFT_Real)],
            tilingstats.userFuncMeanCoord, transform)
        sp_rate = npix / (time.time() - t0)
        results.append({
            "name": "config4b: calcPerSegmentSpatialStatsTiled mean "
                    f"coords over {npix:.0f} Mpix scene (streaming "
                    "bincount-reduction route, no coordinate lists)",
            "value": round(sp_rate, 3), "unit": "Mpix/s",
            "vs_baseline": None})

    def spatial_edge():
        # Edge-pixel counts now stream through the 1-pixel-halo route on
        # the host engine (auto-substituted streamingNumEdgePixels):
        # shifted whole-tile comparisons + one bincount per tile, no
        # point lists.
        t0 = time.time()
        tilingstats.calcPerSegmentSpatialStatsTiled(
            imgfile, 1, segfile, [("b1_edgepix", rio.GFT_Integer)],
            tilingstats.userFuncNumEdgePixels, True, engine='host')
        sp_rate = npix / (time.time() - t0)
        results.append({
            "name": "config4c: calcPerSegmentSpatialStatsTiled edge-pixel "
                    f"counts over {npix:.0f} Mpix scene (streaming "
                    "halo-read route, no coordinate lists)",
            "value": round(sp_rate, 3), "unit": "Mpix/s",
            "vs_baseline": None})

    def spatial_edge_pointlist():
        # The point-list accumulator + per-segment vectorized host
        # kernel stays on record: it is the route every CUSTOM
        # reference-signature callback takes (and the RIOS variant's
        # only route). A wrapper defeats the streaming substitution.
        def pointRoute(pts, imgNullVal, intArr, floatArr, param):
            return tilingstats.userFuncNumEdgePixels(
                pts, imgNullVal, intArr, floatArr, param)
        t0 = time.time()
        tilingstats.calcPerSegmentSpatialStatsTiled(
            imgfile, 1, segfile, [("b1_edgepix_pt", rio.GFT_Integer)],
            pointRoute, True, engine='host')
        sp_rate = npix / (time.time() - t0)
        results.append({
            "name": "config4c-pointlist: same edge-pixel counts via the "
                    "point-list accumulator + host kernel (the custom-"
                    "callback route)",
            "value": round(sp_rate, 3), "unit": "Mpix/s",
            "vs_baseline": None})

    _guard(results, "config4-host", host_engine)
    _guard(results, "config4-multiband", multiband)
    _guard(results, "config4-device", device_engine)
    _guard(results, "config4-device-chip", chip_rate)
    _guard(results, "config4b-spatial", spatial)
    def spatial_variogram():
        # Variograms stream too (halo = maxDist): same-segment pair
        # sums per positive-quadrant offset, no point lists.
        maxDist = 2
        t0 = time.time()
        tilingstats.calcPerSegmentSpatialStatsTiled(
            imgfile, 1, segfile,
            [(f"b1_vario{d}", rio.GFT_Real)
             for d in range(1, maxDist + 1)],
            tilingstats.userFuncVariogram, maxDist, engine='host')
        sp_rate = npix / (time.time() - t0)
        results.append({
            "name": "config4d: calcPerSegmentSpatialStatsTiled "
                    f"variograms (maxDist=2) over {npix:.0f} Mpix scene "
                    "(streaming halo-read route)",
            "value": round(sp_rate, 3), "unit": "Mpix/s",
            "vs_baseline": None})

    _guard(results, "config4c-spatial-edge", spatial_edge)
    _guard(results, "config4c-spatial-edge-pointlist", spatial_edge_pointlist)
    _guard(results, "config4d-spatial-variogram", spatial_variogram)


def _deviceStatsChipRate(segfile, imgfile, k=8):
    """On-chip rate of the device stats compaction (Mpix/s): K window
    compactions (two-dispatch sort + run scatter) enqueued back-to-back
    against a device-resident 1024^2 scene window, one sync at the end,
    bare sync RTT subtracted — tunnel-insensitive."""
    import jax
    import jax.numpy as jnp
    from pyshepseg_tpu import io as rio
    from pyshepseg_tpu.ops import segstats

    n = 1024
    seg = rio.open(segfile).GetRasterBand(1).ReadAsArray(0, 0, n, n)
    img = rio.open(imgfile).GetRasterBand(1).ReadAsArray(0, 0, n, n)
    numSeg = int(seg.max()) + 1
    segDev = jax.device_put(np.ascontiguousarray(seg).astype(np.uint32))
    # native dtype + packed single-key sort when eligible — exactly what
    # the production scene-resident feed runs
    bias = segstats.packBias(img.dtype, numSeg)
    valDev = jax.device_put(np.ascontiguousarray(
        img if bias is not None else img.astype(np.int32)))
    bucket = n * n

    state = segstats._sort_pairs_window(segDev, valDev, 0, 0,
                                        h=n, w=n, bucket=bucket,
                                        bias=bias)
    rCap = segstats.round_capacity(int(state[4]))

    def one():
        st = segstats._sort_pairs_window(segDev, valDev, 0, 0,
                                         h=n, w=n, bucket=bucket,
                                         bias=bias)
        return segstats._compact_runs_jit(st[0], st[1], st[2], st[3],
                                          r_cap=rCap)

    one()  # warm

    tiny = jnp.zeros((8, 128), jnp.float32)
    bump = jax.jit(lambda x: x + 1.0)
    np.asarray(bump(tiny)[0, 0])
    rtts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(bump(tiny)[0, 0])
        rtts.append(time.time() - t0)
    rtt = min(rtts)

    best = None
    for _ in range(3):
        t0 = time.time()
        outs = [one() for _ in range(k)]
        # ONE sync drains the whole in-order stream; per-output asarray
        # calls would each pay a ~25 ms tunnel round trip and count it
        # as device time (k-1 stray RTTs inflated the round-4 record to
        # ~40 ms/window when the compute is single-digit ms)
        np.asarray(outs[-1][0][0])
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    dev_s = max(best - rtt, 1e-9) / k
    return {
        "name": "config4-device-chip: on-chip rate of the device stats "
                f"compaction ({k} pipelined 1024^2 window compactions, "
                "one drain sync, RTT subtracted — tunnel-insensitive)",
        "value": round((n * n / 1e6) / dev_s, 3), "unit": "Mpix/s",
        "vs_baseline": None, "device_s": round(dev_s, 5),
        "run_capacity": rCap}


def _run_config5(results, segfile, tempDir):
    """Config 5: subsetImage + RAT compaction of a 1600^2 window."""
    from pyshepseg_tpu import subset

    subfile = os.path.join(tempDir, "sub.npseg")
    off = max(0, min(1600, SCENE_SIZE - 1600))  # stay inside small scenes
    t0 = time.time()
    subset.subsetImage(segfile, subfile, off, off, 1600, 1600, None,
                       origSegIdColName="orig_segid")
    elapsed = time.time() - t0
    results.append({
        "name": "config5: subsetImage 1600x1600 window + RAT compaction",
        "value": round(elapsed, 3), "unit": "seconds",
        "vs_baseline": None})


def _run_golden8000(results):
    """Golden end-to-end oracle at the reference's own scale knobs
    (8000^2 scene, 101 Voronoi centres — reference runtests.py:27-40),
    run through the real CLI. Opt in with BENCH_CONFIGS=golden (it adds
    ~5-10 min through the tunnelled chip)."""
    import subprocess
    import tempfile
    import shutil
    tmp = tempfile.mkdtemp(prefix="pyshepseg_golden_")
    t0 = time.time()
    proc = subprocess.run(
        [os.sys.executable, "-u", "-m", "pyshepseg_tpu.cmdline.runtests",
         "-d", tmp, "--size", "8000", "--ncentres", "101",
         "--tilesize", "1024", "--overlapsize", "256"],
        capture_output=True, universal_newlines=True)
    elapsed = time.time() - t0
    ok = proc.returncode == 0 and "All tests passed" in proc.stdout
    shutil.rmtree(tmp, ignore_errors=True)
    rec = {
        "name": "golden8000: full pipeline + stats + subset oracle at "
                "the reference's 8000^2 / 101-centre scale",
        "value": round(elapsed, 1), "unit": "seconds",
        "vs_baseline": None, "passed": ok}
    if not ok:
        tail = (proc.stdout + "\n" + proc.stderr).strip().splitlines()
        rec["error"] = " | ".join(tail[-5:])
    results.append(rec)


def _pallas_compiled_check():
    """Validate Mosaic-compiled lowering of the Pallas block-local CCL
    kernel against the pure-XLA path (CI runs it interpreted only)."""
    if jax.devices()[0].platform != "tpu":
        return "skipped (not tpu)"
    from pyshepseg_tpu.ops.clump import clump_labels
    rng = np.random.default_rng(3)
    img = rng.integers(0, 6, size=(1024, 1024)).astype(np.int32)
    f = jax.jit(clump_labels, static_argnames=("four_connected",
                                               "use_pallas"))
    seg_p, n_p, _ = f(img, 0, four_connected=True, use_pallas=True)
    seg_x, n_x, _ = f(img, 0, four_connected=True, use_pallas=False)
    ok = (int(n_p) == int(n_x) and
          np.array_equal(np.asarray(seg_p), np.asarray(seg_x)))
    return "ok" if ok else "FAILED"


def main():
    import tempfile
    import shutil

    # The tunnel has outage phases lasting minutes to hours; wait them
    # out (budget via BENCH_MAX_WAIT_S), but if the device still does not
    # answer, emit a parseable error record rather than hanging in the
    # first dispatch until the caller's timeout silently discards the run.
    waited, deviceOK = utils.awaitDevice(
        maxWaitS=int(os.environ.get("BENCH_MAX_WAIT_S", "3600")))
    if waited > 5:
        print(f"BENCH-WARNING: waited {waited}s for the device tunnel",
              file=sys.stderr, flush=True)
    # independent of the wait duration: a fast-failing probe (small
    # BENCH_MAX_WAIT_S) must still emit the parseable record, not run on
    if not deviceOK:
        rec = {
            "metric": ("doShepherdSegmentation 1024x1024 4-band "
                       "uint16 (numClusters=60, minSegmentSize=50, "
                       "4-connected)"),
            "value": None, "unit": "Mpix/s", "vs_baseline": None,
            "configs": [],
            "context": _run_context(),
            "error": ("device backend unavailable after waiting "
                      f"{waited}s — tunnel outage; see BASELINE.md "
                      "hygiene notes")}
        try:
            _write_full_record(rec)
        except Exception:
            pass
        print(json.dumps(rec))
        return

    # golden8000 (the reference-scale end-to-end oracle) is IN the
    # default set so the scale check lands in every recorded BENCH
    # artifact; trim BENCH_CONFIGS for quick runs.
    which = {x.strip() for x in
             os.environ.get("BENCH_CONFIGS", "1,2,3,4,5,golden").split(",")
             if x.strip()}
    results = _ProgressList()
    headline = None

    if "1" in which:
        headline = _guard(results, "config1", _run_config1, results)
    if "2" in which:
        _guard(results, "config2", _run_config2, results)

    tempDir = None
    try:
        if which & {"3", "4", "5"}:
            tempDir = tempfile.mkdtemp(prefix="pyshepseg_bench_")
            c3 = _guard(results, "config3", _run_config3, results, tempDir)
            if c3 is None and which & {"4", "5"}:
                # configs 4/5 only need a (scene, segmentation) pair on
                # disk; a serial CONC_NONE fallback isolates them from a
                # concurrency-backend failure in config 3
                c3 = _guard(results, "config3-serial-fallback",
                            _fallback_scene_seg, tempDir)
            if c3 is not None:
                imgfile, segfile, _ = c3
                if "4" in which:
                    _guard(results, "config4", _run_config4, results,
                           imgfile, segfile)
                if "5" in which:
                    _guard(results, "config5", _run_config5, results,
                           segfile, tempDir)
            else:
                for c in sorted(which & {"4", "5"}):
                    results.append({
                        "name": f"config{c}: SKIPPED (no segmentation "
                                "available — config 3 and its serial "
                                "fallback both failed)",
                        "value": None, "unit": None, "vs_baseline": None})
    finally:
        if tempDir is not None:
            shutil.rmtree(tempDir, ignore_errors=True)

    if "golden" in which:
        _guard(results, "golden8000", _run_golden8000, results)

    pallas_check = _guard(results, "pallas-compiled-check",
                          _pallas_compiled_check)
    if pallas_check is None:
        pallas_check = "FAILED (exception)"

    out = {
        "metric": ("doShepherdSegmentation 1024x1024 4-band uint16 "
                   "(numClusters=60, minSegmentSize=50, 4-connected)"),
        "value": round(headline, 3) if headline is not None else None,
        "unit": "Mpix/s",
        "vs_baseline": (round(headline / REF_BASELINE_MPIX_S, 2)
                        if headline is not None else None),
        "configs": results,
        "pallas_compiled_check": pallas_check,
        "context": _run_context(),
        "partial": False,
    }
    try:
        _write_full_record(out)
        print(f"BENCH-FULL-RECORD: {_full_record_path()}",
              file=sys.stderr, flush=True)
    except Exception:
        traceback.print_exc()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
