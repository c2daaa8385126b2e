"""Tests for subsetImage: dense first-encounter recode + RAT compaction."""

import numpy as np
import pytest

from pyshepseg_tpu import subset
from pyshepseg_tpu import io as rio


@pytest.fixture
def seg_with_rat(tmp_path, rng):
    """A segmentation raster with RAT columns carrying known per-seg data."""
    h, w = 90, 110
    nseg = 30
    centres = rng.uniform(0, [h, w], size=(nseg, 2))
    yy, xx = np.mgrid[0:h, 0:w]
    d = ((yy[..., None] - centres[:, 0]) ** 2 +
         (xx[..., None] - centres[:, 1]) ** 2)
    seg = (d.argmin(axis=-1) + 1).astype(np.uint32)
    seg[:2, :] = 0  # null strip

    path = str(tmp_path / "seg.npseg")
    ds = rio.create(path, w, h, 1, np.uint32)
    ds.SetGeoTransform((1000.0, 5.0, 0.0, 2000.0, 0.0, -5.0))
    ds.GetRasterBand(1).WriteArray(seg)
    rat = ds.GetRasterBand(1).GetDefaultRAT()
    hist = np.bincount(seg.ravel(), minlength=nseg + 1).astype(np.float64)
    hist[0] = 0
    rat.CreateColumn("Histogram", rio.GFT_Real, rio.GFU_PixelCount)
    rat.WriteArray(hist, 0)
    rat.CreateColumn("code", rio.GFT_Integer, rio.GFU_Generic)
    codes = np.arange(nseg + 1) * 7
    rat.WriteArray(codes, 1)
    rat.CreateColumn("score", rio.GFT_Real, rio.GFU_Generic)
    scores = np.arange(nseg + 1) * 1.5
    rat.WriteArray(scores, 2)
    return path, seg, codes, scores


def test_subset_recode_and_rat(tmp_path, seg_with_rat):
    path, seg, codes, scores = seg_with_rat
    outpath = str(tmp_path / "sub.npseg")
    tlx, tly, xs, ys = 20, 10, 60, 50
    subset.subsetImage(path, outpath, tlx, tly, xs, ys, None,
                       origSegIdColName="orig")

    outds = rio.open(outpath)
    outseg = outds.GetRasterBand(1).ReadAsArray()
    window = seg[tly:tly + ys, tlx:tlx + xs]

    # dense IDs starting at 1, in first-encounter scan order
    used = np.unique(outseg[outseg > 0])
    np.testing.assert_array_equal(used, np.arange(1, len(used) + 1))
    firstENew = {}
    firstEOld = {}
    flatNew, flatOld = outseg.ravel(), window.ravel()
    for i in range(len(flatNew)):
        if flatNew[i] > 0 and flatNew[i] not in firstENew:
            firstENew[flatNew[i]] = i
        if flatOld[i] > 0 and flatOld[i] not in firstEOld:
            firstEOld[flatOld[i]] = i
    # k-th new ID first appears at the k-th distinct old segment position
    assert sorted(firstENew.values()) == sorted(firstEOld.values())
    newOrder = [k for k, v in sorted(firstENew.items(),
                                     key=lambda kv: kv[1])]
    np.testing.assert_array_equal(newOrder, np.arange(1, len(used) + 1))

    rat = outds.GetRasterBand(1).GetDefaultRAT()
    names = [rat.GetNameOfCol(i) for i in range(rat.GetColumnCount())]
    orig = rat.ReadAsArray(names.index("orig"))
    # orig column maps back exactly to the original raster
    np.testing.assert_array_equal(orig[outseg], window)
    # copied columns carry the original rows' values
    outCodes = rat.ReadAsArray(names.index("code"))
    outScores = rat.ReadAsArray(names.index("score"))
    for newId in used:
        assert outCodes[newId] == codes[orig[newId]]
        assert outScores[newId] == scores[orig[newId]]
    # histogram matches subset pixel counts
    outHist = rat.ReadAsArray(names.index("Histogram"))
    want = np.bincount(outseg.ravel(), minlength=len(outHist))
    want[0] = 0
    np.testing.assert_array_equal(outHist, want[:len(outHist)])
    # geotransform shifted to the window
    gt = outds.GetGeoTransform()
    assert gt[0] == 1000.0 + 5.0 * tlx
    assert gt[3] == 2000.0 + (-5.0) * tly


def test_subset_with_mask(tmp_path, seg_with_rat, rng):
    path, seg, codes, scores = seg_with_rat
    tlx, tly, xs, ys = 10, 10, 40, 40
    maskpath = str(tmp_path / "mask.npseg")
    mask = (rng.random((ys, xs)) < 0.6).astype(np.uint8)
    mds = rio.create(maskpath, xs, ys, 1, np.uint8)
    mds.GetRasterBand(1).WriteArray(mask)

    outpath = str(tmp_path / "sub.npseg")
    subset.subsetImage(path, outpath, tlx, tly, xs, ys, None,
                       maskImage=maskpath)
    outseg = rio.open(outpath).GetRasterBand(1).ReadAsArray()
    assert (outseg[mask == 0] == 0).all()
    # the window holds no null source pixels, so EVERY masked-in pixel
    # must come out labelled
    assert (outseg[mask == 1] > 0).all()


def test_subset_out_of_bounds(tmp_path, seg_with_rat):
    path, seg, codes, scores = seg_with_rat
    with pytest.raises(subset.PyShepSegSubsetError):
        subset.subsetImage(path, str(tmp_path / "x.npseg"),
                           100, 100, 50, 50, None)


def test_dict_writer_compat_functions():
    """The reference-compatible dict->array writers
    (reference: subset.py:271-300)."""
    hist = np.zeros(10, dtype=np.int64)
    subset.setHistogramFromDictionary({0: 5, 3: 7, 9: 2}, hist)
    assert hist[0] == 0 and hist[3] == 7 and hist[9] == 2

    arr = np.zeros(10, dtype=np.int64)
    subset.setSubsetRecodeFromDictionary({42: 3, 77: 9}, arr)
    assert arr[3] == 42 and arr[9] == 77 and arr[0] == 0

    from pyshepseg_tpu import tilingstats
    page = tilingstats.RatPage(1, 1, 0, 4)
    subset.readColDataIntoPage(
        page, np.array([1, 2, 3, 4]), 0, tilingstats.STAT_DTYPE_INT, 0)
    subset.readColDataIntoPage(
        page, np.array([0.5, 1.5, 2.5, 3.5]), 0,
        tilingstats.STAT_DTYPE_FLOAT, 0)
    assert page.intcols[0].tolist() == [1, 2, 3, 4]
    assert page.floatcols[0].tolist() == [0.5, 1.5, 2.5, 3.5]

    # A partial slice starting mid-page: the reference writes each
    # element at row i + minVal (subset.py:293-300), i.e. offset by
    # minVal - startSegId within the page.
    page2 = tilingstats.RatPage(1, 0, 100, 6)
    subset.readColDataIntoPage(
        page2, np.array([7, 8]), 0, tilingstats.STAT_DTYPE_INT, 103)
    # rows outside the slice are uninitialized (numpy.empty, as in the
    # reference jitclass) — assert only the written rows land at
    # minVal - startSegId
    assert page2.intcols[0, 3:5].tolist() == [7, 8]


def test_update_counts_compat():
    from pyshepseg_tpu import tiling
    hist = np.zeros(5, dtype=np.uint32)
    tiling.updateCounts(np.array([[1, 1, 2], [4, 4, 4]], dtype=np.uint32),
                        hist)
    tiling.updateCounts(np.array([[1]], dtype=np.uint32), hist)
    assert hist.tolist() == [0, 3, 1, 0, 3]
