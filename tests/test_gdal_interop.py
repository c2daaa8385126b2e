"""
GDAL interop tests for io/raster.py's pass-through surface.

The whole module is SKIPPED when GDAL is absent (the default dev image);
the gdal-interop CI job installs conda-forge gdal+kealib and runs it for
real, so the HAVE_GDAL=True branches (io/raster.py:25-31, 512-558) are
executed somewhere — mirroring the reference's conda CI
(pyshepseg/.github/workflows/python-app.yml:20-27).

The contract under test is interchangeability: GDAL Dataset/Band/RAT
objects and the numpy-driver classes must behave identically through the
API slice the framework uses, so every test drives BOTH backends through
``pyshepseg_tpu.io`` and compares.
"""

import os

import numpy as np
import pytest

osgeo = pytest.importorskip("osgeo")
from osgeo import gdal  # noqa: E402

from pyshepseg_tpu import io as rio  # noqa: E402


def _gtiff(tmp_path, name="t.tif"):
    return os.path.join(str(tmp_path), name)


def _npseg(tmp_path, name="t.npseg"):
    return os.path.join(str(tmp_path), name)


def test_enum_values_match_gdal():
    """io/raster.py's hardcoded enum values exist so the two backends
    interoperate — they must equal GDAL's actual values."""
    from osgeo import gdalconst
    assert rio.GDT_Byte == gdal.GDT_Byte
    assert rio.GDT_UInt16 == gdal.GDT_UInt16
    assert rio.GDT_Int16 == gdal.GDT_Int16
    assert rio.GDT_UInt32 == gdal.GDT_UInt32
    assert rio.GDT_Int32 == gdal.GDT_Int32
    assert rio.GDT_Float32 == gdal.GDT_Float32
    assert rio.GDT_Float64 == gdal.GDT_Float64
    assert rio.GFT_Integer == gdalconst.GFT_Integer
    assert rio.GFT_Real == gdalconst.GFT_Real
    assert rio.GFT_String == gdalconst.GFT_String
    assert rio.GFU_Generic == gdalconst.GFU_Generic
    assert rio.GFU_PixelCount == gdalconst.GFU_PixelCount
    assert rio.GFU_Name == gdalconst.GFU_Name
    assert rio.GFU_Red == gdalconst.GFU_Red
    assert rio.GFU_Green == gdalconst.GFU_Green
    assert rio.GFU_Blue == gdalconst.GFU_Blue
    assert rio.GFU_Alpha == gdalconst.GFU_Alpha
    assert rio.GA_ReadOnly == gdal.GA_ReadOnly
    assert rio.GA_Update == gdal.GA_Update


def test_have_gdal_flag():
    assert rio.HAVE_GDAL


def _fill_dataset(ds, data, nodata):
    ds.SetGeoTransform((10.0, 0.5, 0.0, 200.0, 0.0, -0.5))
    band = ds.GetRasterBand(1)
    band.SetNoDataValue(nodata)
    band.WriteArray(data)
    ds.FlushCache()


def test_gtiff_and_npseg_agree(tmp_path, rng):
    """Create the same raster through both backends via rio.create, read
    back through rio.open: arrays, windowed reads, nodata, geotransform
    must agree."""
    data = rng.integers(0, 60000, size=(37, 53)).astype(np.uint16)
    paths = {"gdal": _gtiff(tmp_path), "np": _npseg(tmp_path)}
    for key, path in paths.items():
        ds = rio.create(path, 53, 37, 1, np.uint16,
                        "GTiff" if key == "gdal" else None)
        _fill_dataset(ds, data, 60001)
        del ds

    got = {}
    for key, path in paths.items():
        ds = rio.open(path)
        assert ds.RasterXSize == 53 and ds.RasterYSize == 37
        assert ds.RasterCount == 1
        band = ds.GetRasterBand(1)
        assert band.DataType == rio.GDT_UInt16
        got[key] = {
            "full": band.ReadAsArray(),
            "win": band.ReadAsArray(5, 7, 11, 13),
            "nodata": band.GetNoDataValue(),
            "gt": tuple(ds.GetGeoTransform()),
        }
        del ds

    np.testing.assert_array_equal(got["gdal"]["full"], data)
    np.testing.assert_array_equal(got["np"]["full"], data)
    np.testing.assert_array_equal(got["gdal"]["win"], got["np"]["win"])
    assert got["gdal"]["nodata"] == got["np"]["nodata"] == 60001
    assert got["gdal"]["gt"] == got["np"]["gt"]


def test_copy_structure_both_directions(tmp_path, rng):
    """createCopyStructure across backends: .npseg template -> GTiff and
    GTiff template -> .npseg, preserving shape/dtype/geo metadata."""
    data = rng.integers(0, 255, size=(20, 30)).astype(np.uint8)

    src_np = rio.create(_npseg(tmp_path, "src.npseg"), 30, 20, 1, np.uint8)
    _fill_dataset(src_np, data, 255)
    out = rio.createCopyStructure(_gtiff(tmp_path, "cp.tif"), src_np,
                                  driverName="GTiff")
    assert isinstance(out, gdal.Dataset)
    assert (out.RasterXSize, out.RasterYSize) == (30, 20)
    assert out.GetRasterBand(1).DataType == rio.GDT_Byte
    assert tuple(out.GetGeoTransform()) == (10.0, 0.5, 0.0, 200.0, 0.0, -0.5)
    del out

    src_g = rio.create(_gtiff(tmp_path, "src.tif"), 30, 20, 1, np.uint8,
                       "GTiff")
    _fill_dataset(src_g, data, 255)
    out2 = rio.createCopyStructure(_npseg(tmp_path, "cp.npseg"), src_g)
    assert (out2.RasterXSize, out2.RasterYSize) == (30, 20)
    assert tuple(out2.GetGeoTransform()) == (10.0, 0.5, 0.0, 200.0, 0.0,
                                             -0.5)


def _kea_available():
    return gdal.GetDriverByName("KEA") is not None


@pytest.mark.skipif(not _kea_available(), reason="KEA driver not built")
def test_kea_rat_roundtrip(tmp_path, rng):
    """RAT columns written through the GDAL backend read back identically
    to the numpy backend — the exact surface tilingstats' RAT writer
    uses (CreateColumn/WriteArray/ReadAsArray/GetNameOfCol)."""
    nrows = 40
    hist = rng.integers(0, 1000, size=nrows).astype(np.int64)
    mean = rng.uniform(0, 1, size=nrows)

    outs = {}
    for key, (path, drv) in {
            "gdal": (os.path.join(str(tmp_path), "t.kea"), "KEA"),
            "np": (_npseg(tmp_path), None)}.items():
        ds = rio.create(path, 8, 8, 1, np.uint32, drv)
        band = ds.GetRasterBand(1)
        band.WriteArray(np.zeros((8, 8), np.uint32))
        rat = band.GetDefaultRAT()
        rat.CreateColumn("Histogram", rio.GFT_Integer, rio.GFU_PixelCount)
        rat.CreateColumn("b1_mean", rio.GFT_Real, rio.GFU_Generic)
        rat.WriteArray(hist, 0)
        rat.WriteArray(mean, 1)
        if drv:
            band.SetDefaultRAT(rat)
        ds.FlushCache()
        del rat, band, ds

        ds = rio.open(path)
        rat = ds.GetRasterBand(1).GetDefaultRAT()
        names = [rat.GetNameOfCol(i) for i in range(rat.GetColumnCount())]
        outs[key] = {
            "hist": np.asarray(rat.ReadAsArray(names.index("Histogram"))),
            "mean": np.asarray(rat.ReadAsArray(names.index("b1_mean"))),
        }
        del rat, ds

    np.testing.assert_array_equal(outs["gdal"]["hist"], hist)
    np.testing.assert_array_equal(outs["np"]["hist"], hist)
    np.testing.assert_allclose(outs["gdal"]["mean"], mean, rtol=1e-12)
    np.testing.assert_allclose(outs["np"]["mean"], mean, rtol=1e-12)


@pytest.mark.skipif(not _kea_available(), reason="KEA driver not built")
def test_tiled_segmentation_gdal_output(tmp_path):
    """End-to-end smoke of the tiled pipeline writing KEA through real
    GDAL (outputDriver path, tiling.py rio.create call sites) plus stats
    into a GDAL RAT."""
    from pyshepseg_tpu import tiling, tilingstats

    n = 256
    rng = np.random.default_rng(7)
    band = np.where(np.add.outer(np.arange(n), np.arange(n)) < n,
                    100, 200).astype(np.uint16)
    band += rng.integers(0, 3, size=band.shape).astype(np.uint16)

    imgfile = os.path.join(str(tmp_path), "img.kea")
    ds = rio.create(imgfile, n, n, 1, np.uint16, "KEA")
    ds.SetGeoTransform((0, 1, 0, 0, 0, -1))
    ds.GetRasterBand(1).WriteArray(band)
    ds.FlushCache()
    del ds

    segfile = os.path.join(str(tmp_path), "seg.kea")
    res = tiling.doTiledShepherdSegmentation(
        imgfile, segfile, tileSize=128, overlapSize=32, numClusters=4,
        minSegmentSize=10, fixedKMeansInit=True, outputDriver="KEA")
    assert res.maxSegId > 0

    tilingstats.calcPerSegmentStatsTiled(
        imgfile, 1, segfile, [("b1_mean", "mean")])
    segds = rio.open(segfile)
    rat = segds.GetRasterBand(1).GetDefaultRAT()
    names = [rat.GetNameOfCol(i) for i in range(rat.GetColumnCount())]
    assert "b1_mean" in names
    means = rat.ReadAsArray(names.index("b1_mean"))
    seg = segds.GetRasterBand(1).ReadAsArray()
    # segment means must sit near the two plateau values for most pixels
    per_pix = means[seg]
    close = (np.abs(per_pix - band) < 5).mean()
    assert close > 0.95
