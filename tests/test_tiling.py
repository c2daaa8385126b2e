"""End-to-end tests for the tiled segmentation driver, including the
stitch/recode logic and the concurrency backends."""

import numpy as np
import pytest

from pyshepseg_tpu import tiling, shepseg
from pyshepseg_tpu import io as rio
from pyshepseg_tpu.ops.kmeans import TPUKMeans


def perfect_kmeans(ncentres=20, nbands=3):
    """A kmeansObj whose centres are exactly the test palette, so the
    tests exercise the tiling machinery, not clustering quality."""
    km = TPUKMeans(n_clusters=ncentres)
    km.cluster_centers_ = (100 + 40 * np.arange(ncentres)[:, None] +
                           np.zeros((1, nbands))).astype(np.float32)
    return km


def make_voronoi_raster(path, rng, shape=(150, 180), ncentres=20, nbands=3,
                        nodata=None):
    """Synthetic Voronoi-cell raster saved as .npseg; returns true cells."""
    h, w = shape
    centres = rng.uniform(0, [h, w], size=(ncentres, 2))
    yy, xx = np.mgrid[0:h, 0:w]
    d = ((yy[..., None] - centres[:, 0]) ** 2 +
         (xx[..., None] - centres[:, 1]) ** 2)
    true_seg = d.argmin(axis=-1)
    # Colinear, well-separated palette: ideal for the diagonal k-means init,
    # and cell colours differ by >= 40*sqrt(nbands), so a maxSpectralDiff
    # below that provably blocks cross-cell merges.
    palette = (100 + 40 * np.arange(ncentres)[:, None] +
               np.zeros((1, nbands), dtype=np.int64))
    img = palette[true_seg].transpose(2, 0, 1).astype(np.uint16)

    ds = rio.create(path, w, h, nbands, np.uint16)
    ds.SetGeoTransform((0.0, 10.0, 0.0, 0.0, 0.0, -10.0))
    ds.SetProjection("FAKE_PROJ")
    for b in range(nbands):
        band = ds.GetRasterBand(b + 1)
        band.WriteArray(img[b])
        if nodata is not None:
            band.SetNoDataValue(nodata)
    return img, true_seg


def run_tiled(inpath, outpath, **kwargs):
    defaults = dict(tileSize=64, overlapSize=16, minSegmentSize=10,
                    numClusters=20, kmeansObj=perfect_kmeans(),
                    fourConnected=True, maxSpectralDiff=30.0)
    defaults.update(kwargs)
    return tiling.doTiledShepherdSegmentation(inpath, outpath, **defaults)


@pytest.fixture
def paths(tmp_path):
    return str(tmp_path / "in.npseg"), str(tmp_path / "out.npseg")


@pytest.fixture(scope="module")
def serial_case(tmp_path_factory):
    """One shared serial tiled run (the expensive part of this module)."""
    tmp = tmp_path_factory.mktemp("serial")
    inpath = str(tmp / "in.npseg")
    outpath = str(tmp / "out.npseg")
    rng = np.random.default_rng(42)
    img, true_seg = make_voronoi_raster(inpath, rng)
    res = run_tiled(inpath, outpath)
    seg = rio.open(outpath).GetRasterBand(1).ReadAsArray()
    return dict(inpath=inpath, outpath=outpath, img=img,
                true_seg=true_seg, res=res, seg=seg)


def check_output(outpath, res, img, true_seg):
    ds = rio.open(outpath)
    seg = ds.GetRasterBand(1).ReadAsArray()
    assert seg.shape == true_seg.shape
    # contiguous labels 1..maxSegId, none empty
    used = np.unique(seg[seg > 0])
    np.testing.assert_array_equal(used, np.arange(1, res.maxSegId + 1))
    assert not res.hasEmptySegments
    # Each segment belongs to one true Voronoi cell, except that
    # eliminateSinglePixels may absorb a 1-pixel corner sliver into a
    # neighbouring cell's segment with no spectral threshold (by design,
    # matching the reference; shepseg.py:572-615). Allow only such
    # single-pixel contamination.
    misplaced = 0
    for sid in used:
        cells, counts = np.unique(true_seg[seg == sid], return_counts=True)
        minority = counts.sum() - counts.max()
        assert minority <= 2, f"segment {sid} spans cells {cells}: {counts}"
        misplaced += minority
    assert misplaced <= max(5, seg.size // 1000)
    # histogram RAT matches actual counts
    rat = ds.GetRasterBand(1).GetDefaultRAT()
    histCol = rat.GetColOfUsage(rio.GFU_PixelCount)
    hist = rat.ReadAsArray(histCol)
    want = np.bincount(seg.ravel(), minlength=len(hist))
    want[0] = 0
    np.testing.assert_array_equal(hist.astype(np.int64),
                                  want[:len(hist)].astype(np.int64))
    return seg


def test_tiled_serial(serial_case):
    res = serial_case["res"]
    outpath = serial_case["outpath"]
    img, true_seg = serial_case["img"], serial_case["true_seg"]
    assert res.numTileRows >= 2 and res.numTileCols >= 2
    seg = check_output(outpath, res, img, true_seg)
    # all pixels labelled (no nulls in input)
    assert seg.min() >= 1
    # timing machinery populated
    summary = res.timings.makeSummaryDict()
    assert "walltime" in summary and "stitchtiles" in summary
    # geo metadata propagated
    ds = rio.open(outpath)
    assert ds.GetGeoTransform() == (0.0, 10.0, 0.0, 0.0, 0.0, -10.0)
    assert ds.GetProjection() == "FAKE_PROJ"


def test_tiled_with_nodata(paths, rng):
    inpath, outpath = paths
    img, true_seg = make_voronoi_raster(inpath, rng, nodata=0)
    # punch an actual hole so nodata handling is exercised, not just the
    # metadata read (the palette never produces 0 on its own)
    ds_in = rio.open(inpath, rio.GA_Update)
    for b in range(1, ds_in.RasterCount + 1):
        band = ds_in.GetRasterBand(b)
        arr = band.ReadAsArray()
        arr[40:60, 50:80] = 0
        band.WriteArray(arr)
    ds_in.FlushCache()
    res = run_tiled(inpath, outpath, imgNullVal=None)  # read from file
    ds = rio.open(outpath)
    seg = ds.GetRasterBand(1).ReadAsArray()
    assert seg.max() == res.maxSegId
    assert (seg[40:60, 50:80] == shepseg.SEGNULLVAL).all()
    assert (seg[:40, :] != shepseg.SEGNULLVAL).all()


def test_simple_tile_recode(paths, rng):
    inpath, outpath = paths
    img, true_seg = make_voronoi_raster(inpath, rng, shape=(100, 100))
    res = run_tiled(inpath, outpath, simpleTileRecode=True)
    ds = rio.open(outpath)
    seg = ds.GetRasterBand(1).ReadAsArray()
    assert seg.min() >= 1
    assert seg.max() <= res.maxSegId


def test_scene_cache_off_matches_on(serial_case, tmp_path):
    # The serial fixture runs with deviceSceneCache='auto', which engages
    # the whole-scene HBM cache (the CPU test backend reports no memory
    # limit, so the default budget applies). Streaming tiles from the
    # file instead must produce bit-identical output.
    out2 = str(tmp_path / "out_nocache.npseg")
    cfg = tiling.SegmentationConcurrencyConfig(deviceSceneCache=False)
    res2 = run_tiled(serial_case["inpath"], out2, concurrencyCfg=cfg)
    seg2 = rio.open(out2).GetRasterBand(1).ReadAsArray()
    np.testing.assert_array_equal(serial_case["seg"], seg2)
    assert serial_case["res"].maxSegId == res2.maxSegId


def test_crosses_midline_matches_vectorized(rng):
    # The public per-segment crossesMidline (reference API,
    # tiling.py:1271-1306) must agree with the vectorized
    # _segsCrossingMidline the stitcher actually uses.
    overlap = rng.integers(0, 9, size=(16, 24)).astype(np.uint32)
    for orientation in (tiling.HORIZONTAL, tiling.VERTICAL):
        crossing = set(tiling._segsCrossingMidline(overlap, orientation))
        for segId in range(1, 9):
            rowcols = np.argwhere(overlap == segId)
            if len(rowcols) == 0:
                continue
            got = tiling.SegmentationConcurrencyMgr.crossesMidline(
                overlap, rowcols, orientation)
            assert bool(got) == (segId in crossing)


def test_scene_cache_config_validation():
    with pytest.raises(tiling.PyShepSegTilingError):
        tiling.SegmentationConcurrencyConfig(deviceSceneCache="bogus")
    # forcing the cache on an out-of-process backend is rejected when the
    # manager starts (workers could not see the in-process device array)
    cfg = tiling.SegmentationConcurrencyConfig(
        concurrencyType=tiling.CONC_SUBPROC, numWorkers=1,
        deviceSceneCache=True)
    mgrClass = tiling.selectConcurrencyClass(
        tiling.CONC_SUBPROC, tiling.SegmentationConcurrencyMgr)
    mgr = mgrClass.__new__(mgrClass)
    mgr.concurrencyCfg = cfg
    with pytest.raises(tiling.PyShepSegTilingError):
        mgr.maybeBuildSceneCache()


def test_three_phase_api_matches_monolithic(serial_case, tmp_path):
    inpath = serial_case["inpath"]
    seg1 = serial_case["seg"]
    res1 = serial_case["res"]

    # 3-phase: prepare -> per-tile doOne -> finalize
    (inDs, bandNumbers, kmeansObj, subsamplePcnt, imgNullVal, tileInfo) = (
        tiling.doTiledShepherdSegmentation_prepare(
            inpath, tileSize=64, overlapSize=16, numClusters=20,
            kmeansObj=perfect_kmeans()))
    tileFilenames = {}
    for (col, row) in sorted(tileInfo.tiles.keys()):
        fn = str(tmp_path / f"tile_{col}_{row}.npseg")
        tiling.doTiledShepherdSegmentation_doOne(
            inDs, fn, tileInfo, col, row, bandNumbers, imgNullVal,
            kmeansObj, minSegmentSize=10, maxSpectralDiff=30.0)
        tileFilenames[(col, row)] = fn

    out3 = str(tmp_path / "out3.npseg")
    (maxSegId, hasEmpty, outDs) = (
        tiling.doTiledShepherdSegmentation_finalize(
            inDs, out3, tileFilenames, tileInfo, 16, str(tmp_path)))
    seg3 = outDs.GetRasterBand(1).ReadAsArray()
    np.testing.assert_array_equal(seg1, seg3)
    assert maxSegId == res1.maxSegId


def test_three_phase_prepare_honours_tile_grid(serial_case):
    """Regression: _prepare must forward tileGrid to getTilesForFile —
    the grow grid's edge tiles differ from the uniform grid's on a
    non-dividing scene."""
    inpath = serial_case["inpath"]
    (inDs, bandNumbers, kmeansObj, subsamplePcnt, imgNullVal, tiGrow) = (
        tiling.doTiledShepherdSegmentation_prepare(
            inpath, tileSize=48, overlapSize=16, numClusters=20,
            kmeansObj=perfect_kmeans(), tileGrid='grow'))
    ds = rio.open(inpath)
    want = tiling.getTilesForFile(ds, 48, 16, tileGrid='grow')
    assert tiGrow.tiles == want.tiles


def test_tile_grid_sliver_growth():
    class FakeDs:
        RasterXSize = 100
        RasterYSize = 70

    ti = tiling.getTilesForFile(FakeDs(), 40, 10, tileGrid='grow')
    # y: 0+80 > 70, so the single row grows to the full 70 rows
    # x: tile at 0 (40 wide); next at 30: 30+80 > 100 -> grows to 70 wide
    assert ti.ncols == 2 and ti.nrows == 1
    assert ti.getTile(0, 0) == (0, 0, 40, 70)
    assert ti.getTile(1, 0) == (30, 0, 70, 70)


def test_tile_grid_uniform():
    """The default grid keeps every tile exactly tileSize, shifting the
    last tile of each axis back to the raster edge, so any scene size
    compiles exactly one per-tile device program."""
    class FakeDs:
        RasterXSize = 100
        RasterYSize = 70

    ti = tiling.getTilesForFile(FakeDs(), 40, 10)
    # x: starts 0, 30, 60 (=100-40); y: 0, 30 (=70-40)
    assert ti.ncols == 3 and ti.nrows == 2
    shapes = {(xs, ys) for (_, _, xs, ys) in ti.tiles.values()}
    assert shapes == {(40, 40)}
    assert ti.getTile(2, 0) == (60, 0, 40, 40)
    assert ti.getTile(0, 1) == (0, 30, 40, 40)
    # the shifted last pair shares a wider strip than overlapSize
    assert ti.pairOverlap(2, 0, 'left') == 10
    assert ti.pairOverlap(1, 1, 'top') == 10

    # non-dividing axis: last pair overlap grows, never a sliver
    class FakeDs2:
        RasterXSize = 95
        RasterYSize = 40

    ti2 = tiling.getTilesForFile(FakeDs2(), 40, 10)
    assert ti2.ncols == 3 and ti2.nrows == 1
    assert ti2.getTile(2, 0) == (55, 0, 40, 40)
    assert ti2.pairOverlap(2, 0, 'left') == 30 + 40 - 55  # == 15, odd ok

    # scene smaller than a tile: single tile of the scene size
    class FakeDs3:
        RasterXSize = 25
        RasterYSize = 30

    ti3 = tiling.getTilesForFile(FakeDs3(), 40, 10)
    assert ti3.getNumTiles() == 1
    assert ti3.getTile(0, 0) == (0, 0, 25, 30)


def test_tiled_uniform_vs_grow_grid(paths, rng, tmp_path):
    """Both grid styles must produce a valid stitched mosaic; the uniform
    grid (default) must use a single tile shape."""
    inpath, outpath = paths
    img, true_seg = make_voronoi_raster(inpath, rng, shape=(150, 170))
    res_u = run_tiled(inpath, outpath)
    shapes = {(xs, ys) for (_, _, xs, ys)
              in tiling.getTilesForFile(rio.open(inpath), 64, 16
                                        ).tiles.values()}
    assert shapes == {(64, 64)}
    check_output(outpath, res_u, img, true_seg)

    out_g = str(tmp_path / "out_grow.npseg")
    res_g = run_tiled(inpath, out_g, tileGrid='grow')
    check_output(out_g, res_g, img, true_seg)


def test_histogram_accumulator():
    acc = tiling.HistogramAccumulator()
    acc.doHistAccum(np.array([[0, 1, 1], [2, 2, 2]], dtype=np.uint32))
    np.testing.assert_array_equal(acc.hist, [0, 2, 3])
    acc.doHistAccum(np.array([[5, 1]], dtype=np.uint32))
    np.testing.assert_array_equal(acc.hist, [0, 3, 3, 0, 0, 1])


def test_mode_match_tie_break():
    a = np.array([[7, 7, 7, 7]], dtype=np.uint32)
    b = np.array([[3, 3, 2, 2]], dtype=np.uint32)
    m = tiling._modeMatch(a, b, np.array([7], dtype=np.uint32))
    assert m == {7: 2}  # tie between 2 and 3 -> smallest wins


def test_calc_histogram_tiled_deprecated(paths, rng):
    inpath, outpath = paths
    img, true_seg = make_voronoi_raster(inpath, rng, shape=(80, 80))
    res = run_tiled(inpath, outpath)
    hist = tiling.calcHistogramTiled(outpath, res.maxSegId, writeToRat=True)
    seg = rio.open(outpath).GetRasterBand(1).ReadAsArray()
    want = np.bincount(seg.ravel(), minlength=res.maxSegId + 1)
    want[0] = 0
    np.testing.assert_array_equal(hist, want)


def test_no_null_holes_with_segments_larger_than_overlap(tmp_path, rng):
    """Regression: segments much larger than the overlap used to vanish
    into null holes — a boundary sliver crossing the stitch midline
    could mode-match against UNCLAIMED (null) pixels of the earlier
    tile, recode the whole segment to null, and cascade down the
    overlap chain (a latent reference defect, reference
    tiling.py:1194-1200 + 1255-1267; reproduced at its own 8000^2 test
    scale). With null-excluded matching and window-presence ownership,
    every valid input pixel must be labelled."""
    inpath = str(tmp_path / "in.npseg")
    outpath = str(tmp_path / "out.npseg")
    img, true_seg = make_voronoi_raster(inpath, rng, shape=(600, 620),
                                        ncentres=12)
    res = run_tiled(inpath, outpath, tileSize=128, overlapSize=32,
                    minSegmentSize=20)
    seg = rio.open(outpath).GetRasterBand(1).ReadAsArray()
    assert (seg != 0).all(), f"{(seg == 0).sum()} null holes in mosaic"
    assert not res.hasEmptySegments
    check_output(outpath, res, img, true_seg)


def test_zero_overlap_completes(paths):
    # overlapSize=0 passes validation; every pair overlap is zero-width,
    # so no strips are cached and recodeTile must not try to load them
    # (used to KeyError after all tiles had segmented)
    inpath, outpath = paths
    rng = np.random.default_rng(11)
    make_voronoi_raster(inpath, rng, shape=(128, 128))
    res = run_tiled(inpath, outpath, overlapSize=0)
    seg = rio.open(outpath).GetRasterBand(1).ReadAsArray()
    assert seg.shape == (128, 128)
    assert res.maxSegId == seg.max() > 0
    assert (seg != shepseg.SEGNULLVAL).all()


def test_overview_levels_match_reference_rule():
    # the reference's lagged loop runs one level past the size test
    # (reference: tiling.py:1383-1404): 8192 -> [4, 8, 16], 4096 -> [4, 8]
    class _Probe(tiling.SegNoConcurrencyMgr):
        def __init__(self, x, y):
            self.inXsize, self.inYsize = x, y

        def check(self):
            class DS:
                def BuildOverviews(self, meth, levels):
                    pass
            self.setupOverviews(DS())
            return self.overviewLevels

    assert _Probe(8192, 8192).check() == [4, 8, 16]
    assert _Probe(4096, 4096).check() == [4, 8]
    assert _Probe(2048, 2048).check() == []
    assert _Probe(1024, 1024).check() == []


def test_stitch_relabel_native_matches_numpy(rng, monkeypatch):
    # The C++ stitch recode (native/ccl.cpp stitch_mapping, the count +
    # assignment passes the stitcher uses) must be bit-identical to the
    # numpy fallback path in relabelSegments/relabelMapping — data,
    # counter, AND the derived new-id window histogram; the histogram
    # must also equal a direct bincount of the trimmed output (what the
    # old doHistAccum path measured).
    from pyshepseg_tpu import native as native_mod
    tileData = rng.integers(0, 40, size=(96, 96)).astype(np.uint32)
    recodeDict = {3: 1007, 7: 1003, 12: 1007}  # incl. a colliding target
    args = (recodeDict, 2000, 8, 88, 4, 92)
    Mgr = tiling.SegmentationConcurrencyMgr

    if not native_mod.available():
        # visible reduced coverage: a toolchain/build regression must not
        # silently stop exercising the C++ hot path
        pytest.skip("native library unavailable; C++ stitch_mapping "
                    "not exercised")
    outN, maxN, histN = Mgr.relabelSegments(tileData.copy(), *args)
    monkeypatch.setattr(tiling.native, "stitch_mapping",
                        lambda *a, **k: None)
    outP, maxP, histP = Mgr.relabelSegments(tileData.copy(), *args)

    np.testing.assert_array_equal(outN, outP)
    assert maxN == maxP
    np.testing.assert_array_equal(histN, histP)

    direct = np.bincount(outP[8:88, 4:92].ravel())
    direct[shepseg.SEGNULLVAL] = 0
    n = min(len(direct), len(histP))
    np.testing.assert_array_equal(histP[:n], direct[:n])
    assert not histP[n:].any() and not direct[n:].any()
    # recoded ids keep their targets; owned ids got fresh sequential ids
    assert maxP > 2000
    assert (np.unique(outP[outP > 2000]) ==
            np.arange(2001, maxP + 1)).all()
