"""Tests for the numpy raster driver, utils and timers."""

import pickle
import time

import numpy as np
import pytest

from pyshepseg_tpu import io as rio
from pyshepseg_tpu import utils
from pyshepseg_tpu.timinghooks import Timers


@pytest.fixture
def ds_path(tmp_path):
    return str(tmp_path / "test.npseg")


def test_create_read_write(ds_path, rng):
    ds = rio.create(ds_path, 64, 48, 3, np.uint16)
    assert (ds.RasterXSize, ds.RasterYSize, ds.RasterCount) == (64, 48, 3)
    data = rng.integers(0, 1000, size=(48, 64)).astype(np.uint16)
    band = ds.GetRasterBand(2)
    band.WriteArray(data)
    got = band.ReadAsArray()
    np.testing.assert_array_equal(got, data)
    # windowed access
    np.testing.assert_array_equal(
        band.ReadAsArray(10, 5, 20, 15), data[5:20, 10:30])
    band.WriteArray(np.zeros((4, 4), np.uint16), 3, 7)
    assert (band.ReadAsArray(3, 7, 4, 4) == 0).all()


def test_geo_metadata(ds_path):
    ds = rio.create(ds_path, 16, 16, 1, np.uint32)
    gt = (100.0, 10.0, 0.0, 5000.0, 0.0, -10.0)
    ds.SetGeoTransform(gt)
    ds.SetProjection("PROJCS[\"fake\"]")
    band = ds.GetRasterBand(1)
    band.SetNoDataValue(0)
    band.SetMetadataItem("LAYER_TYPE", "thematic")
    # reopen
    ds2 = rio.open(ds_path, rio.GA_ReadOnly)
    assert ds2.GetGeoTransform() == gt
    assert ds2.GetProjection() == "PROJCS[\"fake\"]"
    b2 = ds2.GetRasterBand(1)
    assert b2.GetNoDataValue() == 0
    assert b2.GetMetadataItem("LAYER_TYPE") == "thematic"


def test_rat_roundtrip(ds_path):
    ds = rio.create(ds_path, 8, 8, 1, np.uint32)
    rat = ds.GetRasterBand(1).GetDefaultRAT()
    rat.CreateColumn("Histogram", rio.GFT_Real, rio.GFU_PixelCount)
    rat.CreateColumn("Mean_B1", rio.GFT_Real, rio.GFU_Generic)
    hist = np.array([0., 5., 3., 2.])
    rat.WriteArray(hist, 0)
    assert rat.GetRowCount() == 4
    # paged write with start offset grows the table
    rat.WriteArray(np.array([9., 9.]), 0, start=10)
    assert rat.GetRowCount() == 12
    rat2 = ds.GetRasterBand(1).GetDefaultRAT()
    np.testing.assert_array_equal(rat2.ReadAsArray(0, 0, 4), hist)
    np.testing.assert_array_equal(rat2.ReadAsArray(0, 10, 2), [9., 9.])
    assert rat2.GetNameOfCol(1) == "Mean_B1"
    assert rat2.GetColOfUsage(rio.GFU_PixelCount) == 0


def test_overviews(ds_path, rng):
    ds = rio.create(ds_path, 256, 256, 1, np.uint32)
    data = rng.integers(0, 100, size=(256, 256)).astype(np.uint32)
    ds.GetRasterBand(1).WriteArray(data)
    ds.BuildOverviews("NEAREST", [4, 8])
    band = ds.GetRasterBand(1)
    assert band.GetOverviewCount() == 2
    ovr = band.GetOverview(0)
    assert ovr.ReadAsArray().shape == (64, 64)
    np.testing.assert_array_equal(ovr.ReadAsArray(),
                                  data[2::4, 2::4][:64, :64])


def test_estimate_stats_from_histo(ds_path):
    ds = rio.create(ds_path, 4, 4, 1, np.uint32)
    band = ds.GetRasterBand(1)
    hist = np.array([0, 4, 8, 4], dtype=np.float64)
    utils.estimateStatsFromHisto(band, hist)
    assert band.GetMetadataItem("STATISTICS_MINIMUM") == "1"
    assert band.GetMetadataItem("STATISTICS_MAXIMUM") == "3"
    assert band.GetMetadataItem("STATISTICS_MODE") == "2"
    assert band.GetMetadataItem("STATISTICS_MEDIAN") == "2"
    assert float(band.GetMetadataItem("STATISTICS_MEAN")) == 2.0


def test_random_colour_table(ds_path):
    ds = rio.create(ds_path, 8, 8, 1, np.uint32)
    band = ds.GetRasterBand(1)
    utils.writeRandomColourTable(band, 10)
    rat = band.GetDefaultRAT()
    assert rat.GetRowCount() == 10
    alpha_col = rat.GetColOfUsage(rio.GFU_Alpha)
    alpha = rat.ReadAsArray(alpha_col)
    assert alpha[0] == 0 and (alpha[1:] == 255).all()


def test_colour_from_rat_columns(ds_path, rng):
    ds = rio.create(ds_path, 8, 8, 1, np.uint32)
    rat = ds.GetRasterBand(1).GetDefaultRAT()
    for name in ("m1", "m2", "m3"):
        rat.CreateColumn(name, rio.GFT_Real, rio.GFU_Generic)
        rat.WriteArray(rng.uniform(0, 500, 20),
                       rat.GetColumnCount() - 1)
    utils.writeColorTableFromRatColumns(ds, "m1", "m2", "m3")
    rat2 = ds.GetRasterBand(1).GetDefaultRAT()
    names = [rat2.GetNameOfCol(i) for i in range(rat2.GetColumnCount())]
    assert {"Red", "Green", "Blue", "Alpha"} <= set(names)
    red = rat2.ReadAsArray(names.index("Red"))
    assert red.min() >= 0 and red.max() <= 255


def test_timers_and_report():
    t = Timers()
    with t.interval("reading"):
        time.sleep(0.01)
    with t.interval("segmentation", sync=True):
        time.sleep(0.02)
    with t.interval("spectralclusters"):
        pass
    w = Timers()
    with w.interval("reading"):
        time.sleep(0.01)
    t.merge(pickle.loads(pickle.dumps(w)))
    summary = t.makeSummaryDict()
    assert summary["reading"]["count"] == 2
    assert summary["segmentation"]["total"] >= 0.02
    for key in ("total", "min", "max", "lowerq", "median", "upperq",
                "mean", "count"):
        assert key in summary["reading"]
    rpt = utils.formatTimingRpt(summary)
    assert "Segmentation Timings" in rpt
    assert "reading" in rpt


def test_worker_error_record():
    try:
        raise ValueError("boom")
    except ValueError as e:
        rec = utils.WorkerErrorRecord(e, "thread")
    s = str(pickle.loads(pickle.dumps(rec)))
    assert "Error in thread worker" in s
    assert "boom" in s


def test_timinghooks_embedded_selftests():
    """The module's embedded AllTests (reference parity: the reference
    ships unittest self-tests inside timinghooks.py) must pass."""
    import unittest
    from pyshepseg_tpu import timinghooks
    suite = unittest.defaultTestLoader.loadTestsFromTestCase(
        timinghooks.AllTests)
    result = unittest.TextTestRunner(verbosity=0).run(suite)
    assert result.wasSuccessful()


def test_overview_level_beyond_dimension(tmp_path):
    # A level >= 2x the raster's smaller dimension used to broadcast an
    # EMPTY subsample slice into the overview array and raise; GDAL
    # accepts such levels (nearest clamps to the last pixel)
    ds = rio.create(str(tmp_path / "small.npseg"), 100, 60, 1, np.uint16)
    data = np.arange(60 * 100, dtype=np.uint16).reshape(60, 100)
    ds.GetRasterBand(1).WriteArray(data)
    ds.BuildOverviews("NEAREST", [128])
    ovr = ds.GetRasterBand(1).GetOverview(0)
    got = ovr.ReadAsArray()
    assert got.shape == (1, 1)
    # nearest sample at the clamped offset (row 59, col 64)
    assert got[0, 0] == data[59, 64]


def test_set_default_rat_replaces(ds_path):
    # GDAL's SetDefaultRAT REPLACES the table; a second call must not
    # duplicate columns (name lookups would return the stale originals)
    ds = rio.create(ds_path, 8, 8, 1, np.uint32)
    band = ds.GetRasterBand(1)
    rat = band.GetDefaultRAT()
    rat.CreateColumn("Histogram", rio.GFT_Real, rio.GFU_PixelCount)
    rat.WriteArray(np.array([0., 1., 2.]), 0)

    from pyshepseg_tpu.io.raster import NumpyRAT
    import tempfile
    other = NumpyRAT(tempfile.mkdtemp())  # standalone source RAT
    other.CreateColumn("Histogram", rio.GFT_Real, rio.GFU_PixelCount)
    other.WriteArray(np.array([5., 6.]), 0)

    band.SetDefaultRAT(other)
    band.SetDefaultRAT(other)  # idempotent, no duplicates
    rat2 = ds.GetRasterBand(1).GetDefaultRAT()
    assert rat2.GetColumnCount() == 1
    assert rat2.GetRowCount() == 2
    np.testing.assert_array_equal(rat2.ReadAsArray(0), [5., 6.])
