"""
Smoke tests for the user-facing console scripts (reference:
pyshepseg/cmdline/* and pyproject entry points) — each CLI is driven
through its real argv parser on a small synthetic scene, and the outputs
are checked structurally (the numeric kernels behind them have their own
oracle tests).
"""

import json
import sys

import numpy as np
import pytest

from test_tiling import make_voronoi_raster

from pyshepseg_tpu.io import raster as rio


@pytest.fixture
def scene(tmp_path, rng):
    """A 150x180 3-band Voronoi scene with nodata=65535."""
    inpath = str(tmp_path / "in.npseg")
    img, true_seg = make_voronoi_raster(inpath, rng, nodata=65535)
    return inpath, img, true_seg


def _run_cli(monkeypatch, module, argv):
    monkeypatch.setattr(sys, "argv", [module.__name__] + argv)
    module.mainCmd()


def test_run_seg_cli(scene, tmp_path, monkeypatch):
    from pyshepseg_tpu.cmdline import run_seg

    inpath, img, _ = scene
    outpath = str(tmp_path / "seg.npseg")
    _run_cli(monkeypatch, run_seg, [
        "-i", inpath, "-o", outpath, "-n", "20", "-b", "1,2,3",
        "-s", "10", "-m", "30", "-c", "10", "--fixedkmeansinit"])

    ds = rio.open(outpath)
    band = ds.GetRasterBand(1)
    seg = band.ReadAsArray()
    assert seg.shape == img.shape[1:]
    assert seg.max() >= 1
    # cluster centres stored as JSON band metadata
    cntrs = json.loads(
        band.GetMetadataItem(run_seg.CLUSTER_CNTRS_METADATA_NAME))
    assert np.asarray(cntrs).shape == (20, 3)
    # histogram-derived stats metadata + random colour table (the
    # reference's run_seg writes no Histogram RAT column; that belongs
    # to the tiled pipeline)
    assert band.GetMetadataItem("STATISTICS_MEAN") is not None
    rat = band.GetDefaultRAT()
    names = [rat.GetNameOfCol(i) for i in range(rat.GetColumnCount())]
    for col in ("Red", "Green", "Blue", "Alpha"):
        assert col in names


def test_run_seg_cli_sharded_matches(scene, tmp_path, monkeypatch):
    """--sharded (rows over the 8-device mesh; 150 rows exercises the
    null-padding path) must produce the same segmentation raster."""
    from pyshepseg_tpu.cmdline import run_seg

    inpath, img, _ = scene
    args = ["-i", inpath, "-n", "20", "-b", "1,2,3",
            "-s", "10", "-m", "30", "-c", "10", "--fixedkmeansinit"]
    out1 = str(tmp_path / "seg1.npseg")
    _run_cli(monkeypatch, run_seg, args + ["-o", out1])
    out2 = str(tmp_path / "seg2.npseg")
    _run_cli(monkeypatch, run_seg, args + ["-o", out2, "--sharded"])

    seg1 = rio.open(out1).GetRasterBand(1).ReadAsArray()
    seg2 = rio.open(out2).GetRasterBand(1).ReadAsArray()
    np.testing.assert_array_equal(seg1, seg2)


def test_tiling_cli_with_stats_and_colours(scene, tmp_path, monkeypatch):
    from pyshepseg_tpu.cmdline import tiling as tiling_cli

    inpath, img, _ = scene
    outpath = str(tmp_path / "seg.npseg")
    _run_cli(monkeypatch, tiling_cli, [
        "-i", inpath, "-o", outpath, "-n", "20", "-b", "1,2,3",
        "-s", "10", "-m", "30", "--fixedkmeansinit",
        "-t", "64", "-l", "16",
        "--statsbands", "1,2,3", "--statspec", "mean",
        "--statspec", "percentile,50",
        "--colortablebands", "1,2,3"])

    ds = rio.open(outpath)
    band = ds.GetRasterBand(1)
    seg = band.ReadAsArray()
    assert seg.max() >= 1
    rat = band.GetDefaultRAT()
    names = [rat.GetNameOfCol(i) for i in range(rat.GetColumnCount())]
    for col in ("Band_1_mean", "Band_2_mean", "Band_3_mean",
                "Band_1_pcnt50", "Red", "Green", "Blue", "Alpha"):
        assert col in names, f"missing RAT column {col}: {names}"
    # segment means must reproduce the flat per-cell colours exactly
    mean_col = names.index("Band_1_mean")
    means = rat.ReadAsArray(mean_col)
    b1 = img[0]
    for seg_id in (1, int(seg.max())):
        pix = b1[seg == seg_id]
        if pix.size:
            assert abs(means[seg_id] - pix.mean()) < 0.5


def test_subset_cli_srcwin(scene, tmp_path, monkeypatch):
    from pyshepseg_tpu.cmdline import run_seg, subset as subset_cli

    inpath, img, _ = scene
    segpath = str(tmp_path / "seg.npseg")
    _run_cli(monkeypatch, run_seg, [
        "-i", inpath, "-o", segpath, "-n", "20", "-b", "1,2,3",
        "-s", "10", "-m", "30", "-c", "10", "--fixedkmeansinit"])

    outpath = str(tmp_path / "sub.npseg")
    _run_cli(monkeypatch, subset_cli, [
        "-i", segpath, "-o", outpath,
        "--srcwin", "20", "30", "64", "48", "--origsegidcol", "orig"])

    full = rio.open(segpath).GetRasterBand(1).ReadAsArray()
    band = rio.open(outpath).GetRasterBand(1)
    sub = band.ReadAsArray()
    assert sub.shape == (48, 64)
    # dense IDs from 1, and the orig column maps back exactly
    ids = np.unique(sub[sub != 0])
    assert ids.min() == 1 and ids.max() == len(ids)
    rat = band.GetDefaultRAT()
    names = [rat.GetNameOfCol(i) for i in range(rat.GetColumnCount())]
    orig = rat.ReadAsArray(names.index("orig"))
    window = full[30:78, 20:84]
    nz = sub != 0
    assert (orig[sub[nz]] == window[nz]).all()


def test_subset_cli_projwin_matches_srcwin(scene, tmp_path, monkeypatch):
    from pyshepseg_tpu.cmdline import run_seg, subset as subset_cli

    inpath, _, _ = scene
    segpath = str(tmp_path / "seg.npseg")
    _run_cli(monkeypatch, run_seg, [
        "-i", inpath, "-o", segpath, "-n", "20", "-b", "1,2,3",
        "-s", "10", "-m", "30", "-c", "10", "--fixedkmeansinit"])

    out_src = str(tmp_path / "sub_src.npseg")
    _run_cli(monkeypatch, subset_cli, [
        "-i", segpath, "-o", out_src, "--srcwin", "10", "10", "32", "32"])
    # geotransform is (0, 10, 0, 0, 0, -10): pixel (10, 10) -> (100, -100)
    out_proj = str(tmp_path / "sub_proj.npseg")
    _run_cli(monkeypatch, subset_cli, [
        "-i", segpath, "-o", out_proj,
        "--projwin", "100", "-100", "420", "-420"])

    a = rio.open(out_src).GetRasterBand(1).ReadAsArray()
    b = rio.open(out_proj).GetRasterBand(1).ReadAsArray()
    assert (a == b).all()


def test_variograms_cli(scene, tmp_path, monkeypatch):
    from pyshepseg_tpu.cmdline import tiling as tiling_cli, variograms

    inpath, _, _ = scene
    # spatial stats need the Histogram RAT column, which only the tiled
    # pipeline writes (as in the reference)
    segpath = str(tmp_path / "seg.npseg")
    _run_cli(monkeypatch, tiling_cli, [
        "-i", inpath, "-o", segpath, "-n", "20", "-b", "1,2,3",
        "-s", "10", "-m", "30", "--fixedkmeansinit", "-t", "64", "-l", "16"])

    _run_cli(monkeypatch, variograms, [
        "-i", inpath, "-s", segpath, "-n", "2"])

    rat = rio.open(segpath).GetRasterBand(1).GetDefaultRAT()
    names = [rat.GetNameOfCol(i) for i in range(rat.GetColumnCount())]
    assert "variogram1" in names and "variogram2" in names
    v1 = rat.ReadAsArray(names.index("variogram1"))
    assert np.isfinite(v1[1:]).all()
