"""Concurrency-backend tests for the tiled driver: CONC_THREADS,
CONC_SUBPROC, CONC_MESH (incl. tilesPerDevice batching and the grown
grid), worker-device routing, and worker-failure surfacing.

Split from test_tiling.py so the process-sharded runner
(scripts/partest.py) can schedule the suite's heaviest modules on
separate workers (VERDICT round-4 item 6).
"""

import numpy as np
import pytest

from pyshepseg_tpu import tiling
from pyshepseg_tpu import io as rio

from test_tiling import (make_voronoi_raster, run_tiled, check_output,
                         paths, serial_case)  # noqa: F401


def test_tiled_threads_matches_serial(serial_case, tmp_path):
    out2 = str(tmp_path / "out2.npseg")
    cfg = tiling.SegmentationConcurrencyConfig(
        concurrencyType=tiling.CONC_THREADS, numWorkers=2,
        tileCompletionTimeout=600)
    res2 = run_tiled(serial_case["inpath"], out2, concurrencyCfg=cfg)
    seg2 = rio.open(out2).GetRasterBand(1).ReadAsArray()
    np.testing.assert_array_equal(serial_case["seg"], seg2)
    assert serial_case["res"].maxSegId == res2.maxSegId


def test_tiled_subproc_matches_serial(serial_case, tmp_path, monkeypatch):
    """CONC_SUBPROC drives the full remote-worker protocol — TCP channel,
    pickled tiles/results, barrier, queues, timing merge — with local
    subprocesses (the reference's fake-distributed-backend pattern,
    tiling.py:1773-1796)."""
    # Workers are fresh processes; pin them to the CPU backend (site
    # customizations can override the JAX_PLATFORMS env var).
    monkeypatch.setenv("PYSHEPSEG_TPU_PLATFORM", "cpu")
    monkeypatch.setenv(
        "JAX_COMPILATION_CACHE_DIR",
        str(tmp_path.parent / "subproc_jax_cache"))
    outpath = str(tmp_path / "out_subproc.npseg")
    cfg = tiling.SegmentationConcurrencyConfig(
        concurrencyType=tiling.CONC_SUBPROC, numWorkers=2,
        tileCompletionTimeout=600, barrierTimeout=600)
    res = run_tiled(serial_case["inpath"], outpath, concurrencyCfg=cfg)
    seg = check_output(outpath, res, serial_case["img"],
                       serial_case["true_seg"])
    np.testing.assert_array_equal(seg, serial_case["seg"])
    # worker timings merged back over the channel
    summary = res.timings.makeSummaryDict()
    assert "segmentation" in summary


def test_tiled_mesh_matches_serial(serial_case, tmp_path):
    """CONC_MESH shards tile batches over the (virtual, 8-device) mesh and
    runs the fused per-tile pipeline on each device; the stitched result
    must be identical to the serial backend."""
    import jax
    assert len(jax.devices()) == 8  # conftest's virtual CPU mesh
    outpath = str(tmp_path / "out_mesh.npseg")
    cfg = tiling.SegmentationConcurrencyConfig(
        concurrencyType=tiling.CONC_MESH, numWorkers=0)
    res = run_tiled(serial_case["inpath"], outpath, concurrencyCfg=cfg)
    seg = check_output(outpath, res, serial_case["img"],
                       serial_case["true_seg"])
    np.testing.assert_array_equal(seg, serial_case["seg"])


@pytest.mark.parametrize("tpd", [2, 3])
def test_tiled_mesh_tiles_per_device_matches_serial(serial_case, tmp_path,
                                                    tpd):
    """tilesPerDevice>1 vmap-batches several tiles into each per-device
    dispatch; the batched fixpoint loops run until the slowest batch
    member converges, but every tile's result must stay bit-identical.
    tpd=2 divides the tile count exactly; tpd=3 exercises the
    pad-to-full-chunk path."""
    import jax
    assert len(jax.devices()) == 8
    outpath = str(tmp_path / "out_mesh_tpd.npseg")
    cfg = tiling.SegmentationConcurrencyConfig(
        concurrencyType=tiling.CONC_MESH, numWorkers=0, tilesPerDevice=tpd)
    res = run_tiled(serial_case["inpath"], outpath, concurrencyCfg=cfg)
    seg = check_output(outpath, res, serial_case["img"],
                       serial_case["true_seg"])
    np.testing.assert_array_equal(seg, serial_case["seg"])


def test_tiles_per_device_validation():
    with pytest.raises(tiling.PyShepSegTilingError):
        tiling.SegmentationConcurrencyConfig(tilesPerDevice=0)
    with pytest.raises(tiling.PyShepSegTilingError):
        tiling.SegmentationConcurrencyConfig(workerDevices='some')


def test_tiled_threads_all_devices_matches_serial(serial_case, tmp_path):
    """workerDevices='all' routes each worker thread's tiles to a
    different local device (round-robin over the virtual 8-CPU mesh
    here, TPU chips in production); output must stay bit-identical."""
    import jax
    assert len(jax.local_devices()) == 8
    out2 = str(tmp_path / "out_threads_alldev.npseg")
    # each worker's device needs its own fresh XLA:CPU compile of the
    # per-tile program (executables are cached per device set); without
    # the opt-in persistent cache the first tile can take minutes
    cfg = tiling.SegmentationConcurrencyConfig(
        concurrencyType=tiling.CONC_THREADS, numWorkers=4,
        workerDevices='all', tileCompletionTimeout=900)
    res2 = run_tiled(serial_case["inpath"], out2, concurrencyCfg=cfg)
    seg2 = rio.open(out2).GetRasterBand(1).ReadAsArray()
    np.testing.assert_array_equal(serial_case["seg"], seg2)
    assert serial_case["res"].maxSegId == res2.maxSegId


def test_tiled_mesh_with_nodata(paths, rng, tmp_path):
    """CONC_MESH must propagate nodata through the native-dtype batch
    (null comparison runs in the image dtype inside the fused pipeline)."""
    inpath, outpath = paths
    img, true_seg = make_voronoi_raster(inpath, rng, nodata=0)
    # punch a null hole through the scene
    ds = rio.open(inpath, rio.GA_Update)
    for b in range(1, 4):
        band = ds.GetRasterBand(b)
        arr = band.ReadAsArray()
        arr[10:30, 40:70] = 0
        band.WriteArray(arr)
    ds.FlushCache()
    cfg = tiling.SegmentationConcurrencyConfig(
        concurrencyType=tiling.CONC_MESH, numWorkers=0)
    res = run_tiled(inpath, outpath, concurrencyCfg=cfg, imgNullVal=0)
    seg = rio.open(outpath).GetRasterBand(1).ReadAsArray()
    assert (seg[10:30, 40:70] == 0).all()          # hole stays null
    assert not res.hasEmptySegments
    assert seg.max() == res.maxSegId


def test_threads_worker_exception_surfaces(paths, rng, monkeypatch):
    """A worker failure must ship a WorkerErrorRecord through the
    exception queue and fail the stitch with PyShepSegTilingError
    (reference failure-detection semantics, tiling.py:918-928)."""
    inpath, outpath = paths
    make_voronoi_raster(inpath, rng)

    def boom(*args, **kwargs):
        raise RuntimeError("injected worker failure")

    monkeypatch.setattr(tiling.shepseg, "doShepherdSegmentation", boom)
    # short timeout: the workers die instantly, so the stitcher's wait
    # for the first tile is pure timeout before the exception check
    cfg = tiling.SegmentationConcurrencyConfig(
        concurrencyType=tiling.CONC_THREADS, numWorkers=2,
        tileCompletionTimeout=5)
    with pytest.raises(tiling.PyShepSegTilingError):
        run_tiled(inpath, outpath, concurrencyCfg=cfg)


def test_tiled_mesh_grow_grid_matches_serial(paths, rng, tmp_path):
    """CONC_MESH with the grown-edge grid: multiple tile shapes means
    multiple compiled SPMD groups per scene; batched (tilesPerDevice=2)
    output must still be bit-identical to serial."""
    inpath, outpath = paths
    img, true_seg = make_voronoi_raster(inpath, rng, shape=(150, 170))
    res_s = run_tiled(inpath, outpath, tileGrid='grow')
    seg_s = rio.open(outpath).GetRasterBand(1).ReadAsArray()

    out_m = str(tmp_path / "out_mesh_grow.npseg")
    cfg = tiling.SegmentationConcurrencyConfig(
        concurrencyType=tiling.CONC_MESH, tilesPerDevice=2)
    res_m = run_tiled(inpath, out_m, tileGrid='grow', concurrencyCfg=cfg)
    seg_m = rio.open(out_m).GetRasterBand(1).ReadAsArray()
    np.testing.assert_array_equal(seg_s, seg_m)
    assert res_s.maxSegId == res_m.maxSegId
