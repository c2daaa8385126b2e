"""End-to-end tests of doShepherdSegmentation on synthetic imagery."""

import numpy as np
import pytest

from pyshepseg_tpu import shepseg


def _voronoi_image(rng, shape=(80, 80), ncentres=12, nbands=3, noise=2):
    """Synthetic image: Voronoi cells with distinct colours + slight noise
    (modelled on the reference's runtests strategy, cmdline/runtests.py)."""
    h, w = shape
    centres = rng.uniform(0, [h, w], size=(ncentres, 2))
    yy, xx = np.mgrid[0:h, 0:w]
    d = ((yy[..., None] - centres[:, 0]) ** 2 +
         (xx[..., None] - centres[:, 1]) ** 2)
    true_seg = d.argmin(axis=-1)
    palette = rng.integers(50, 900, size=(ncentres, nbands))
    img = palette[true_seg].transpose(2, 0, 1).astype(np.int64)
    img += rng.integers(-noise, noise + 1, size=img.shape)
    return img.astype(np.uint16), true_seg


def test_full_segmentation_runs(rng):
    img, true_seg = _voronoi_image(rng)
    res = shepseg.doShepherdSegmentation(
        img, numClusters=12, clusterSubsamplePcnt=100, minSegmentSize=10,
        maxSpectralDiff='auto', fourConnected=True, fixedKMeansInit=True)
    seg = res.segimg
    assert seg.shape == img.shape[1:]
    assert seg.min() >= 1  # no nulls in input
    # labels contiguous
    used = np.unique(seg)
    np.testing.assert_array_equal(used, np.arange(1, len(used) + 1))
    # segments should be spectrally coherent: per-segment colour variance
    # is tiny relative to palette spread
    assert res.kmeans is not None
    assert res.smallSegmentsEliminated >= 0


def test_segmentation_recovers_voronoi_regions(rng):
    """With as many clusters as cells and a generous min size, the
    segmentation should essentially recover the true cells: each final
    segment maps to exactly one true cell."""
    img, true_seg = _voronoi_image(rng, ncentres=8, noise=0)
    res = shepseg.doShepherdSegmentation(
        img, numClusters=8, clusterSubsamplePcnt=100, minSegmentSize=20,
        maxSpectralDiff='auto', fourConnected=False, fixedKMeansInit=True)
    seg = res.segimg
    # every segment is contained in one true cell
    for sid in np.unique(seg):
        cells = np.unique(true_seg[seg == sid])
        assert len(cells) == 1


def test_null_handling(rng):
    img, _ = _voronoi_image(rng, shape=(60, 60))
    img[:, :5, :] = 65535
    res = shepseg.doShepherdSegmentation(
        img, numClusters=6, clusterSubsamplePcnt=100, minSegmentSize=5,
        imgNullVal=65535, fixedKMeansInit=True)
    assert (res.segimg[:5, :] == 0).all()
    assert res.segimg[10:, :].min() >= 1


def test_kmeans_obj_reuse(rng):
    img, _ = _voronoi_image(rng, shape=(40, 40))
    res1 = shepseg.doShepherdSegmentation(
        img, numClusters=6, clusterSubsamplePcnt=100, minSegmentSize=5,
        fixedKMeansInit=True)
    res2 = shepseg.doShepherdSegmentation(
        img, numClusters=6, minSegmentSize=5, kmeansObj=res1.kmeans)
    np.testing.assert_array_equal(res1.segimg, res2.segimg)


def test_fused_edge_overflow_falls_back(rng, monkeypatch):
    """Force the fused dispatch's planarity-bound edge capacity to be too
    small: the overflow flag must trip and the measured-capacity fallback
    must produce the normal result."""
    from pyshepseg_tpu import shepseg as ss
    # 128^2 speckle: thousands of unique adjacencies, far above the
    # 1024-edge floor the shrunken factor produces
    img = (rng.integers(0, 30, size=(3, 128, 128)) * 8).astype(np.uint16)
    res1 = ss.doShepherdSegmentation(img, numClusters=8,
                                     minSegmentSize=5,
                                     maxSpectralDiff=None,
                                     fixedKMeansInit=True)
    # shrink the edge bucket below the true unique-edge count; drop the
    # speculative buckets res1 recorded so the next run takes the
    # measured path (whose overflow fallback this test exercises)
    ss._SPEC_BUCKETS.clear()
    monkeypatch.setattr(ss, "_edgeCapForCount", lambda n: 1024)
    calls = []
    orig = ss._elim_single_and_edges_device

    def spy(*args, **kwargs):
        calls.append(1)
        return orig(*args, **kwargs)

    monkeypatch.setattr(ss, "_elim_single_and_edges_device", spy)
    res2 = ss.doShepherdSegmentation(img, numClusters=8,
                                     minSegmentSize=5,
                                     maxSpectralDiff=None,
                                     fixedKMeansInit=True)
    assert len(calls) == 1, "overflow fallback did not run"
    np.testing.assert_array_equal(res1.segimg, res2.segimg)
    assert res1.smallSegmentsEliminated == res2.smallSegmentsEliminated


def test_one_shot_speculative_matches_measured(rng):
    """The second run of the same configuration takes the speculative
    one-dispatch path (no mid-pipeline sync) and must produce output
    identical to the measured two-dispatch first run, including with
    null pixels present."""
    from pyshepseg_tpu import shepseg as ss
    img = (rng.integers(1, 40, size=(3, 96, 96)) * 8).astype(np.uint16)
    img[:, :5, :5] = 0   # null margin
    kwargs = dict(numClusters=8, minSegmentSize=6, maxSpectralDiff=None,
                  imgNullVal=0, fixedKMeansInit=True)
    assert not ss._SPEC_BUCKETS
    res1 = ss.doShepherdSegmentation(img, **kwargs)
    assert ss._SPEC_BUCKETS, "measured run did not record buckets"
    res2 = ss.doShepherdSegmentation(img, **kwargs)
    np.testing.assert_array_equal(res1.segimg, res2.segimg)
    assert res1.singlePixelsEliminated == res2.singlePixelsEliminated
    assert res1.smallSegmentsEliminated == res2.smallSegmentsEliminated
    assert res1.elimPasses == res2.elimPasses


def test_one_shot_overflow_falls_back_to_measured(rng, monkeypatch):
    """A speculative bucket too small for the data trips the one-shot
    overflow flag; the run must transparently fall back to the measured
    path and still produce the correct result."""
    from pyshepseg_tpu import shepseg as ss
    img = (rng.integers(0, 30, size=(3, 128, 128)) * 8).astype(np.uint16)
    kwargs = dict(numClusters=8, minSegmentSize=5, maxSpectralDiff=None,
                  fixedKMeansInit=True)
    res1 = ss.doShepherdSegmentation(img, **kwargs)
    key = next(iter(ss._SPEC_BUCKETS))
    # plant a too-small edge bucket: the speckle image has far more than
    # 1024 unique adjacencies
    b = ss._SPEC_BUCKETS[key]
    ss._SPEC_BUCKETS[key] = b[:1] + (1024,) + b[2:]
    res2 = ss.doShepherdSegmentation(img, **kwargs)
    np.testing.assert_array_equal(res1.segimg, res2.segimg)
    assert res1.smallSegmentsEliminated == res2.smallSegmentsEliminated
    # the failed speculation must have been evicted and replaced by the
    # measured buckets
    assert ss._SPEC_BUCKETS[key][1] > 1024


def test_one_shot_boundary_bucket_overflow_falls_back(rng):
    """A too-small boundary-pair bucket (b_cap) drops adjacency pairs in
    the compacted pre-sort buffer; the overflow flag must catch it and
    the run must transparently fall back to the measured path."""
    from pyshepseg_tpu import shepseg as ss
    img = (rng.integers(0, 30, size=(3, 128, 128)) * 8).astype(np.uint16)
    kwargs = dict(numClusters=8, minSegmentSize=5, maxSpectralDiff=None,
                  fixedKMeansInit=True)
    res1 = ss.doShepherdSegmentation(img, **kwargs)
    key = next(iter(ss._SPEC_BUCKETS))
    b = ss._SPEC_BUCKETS[key]
    assert b[2] > 2048, "speckle image should have >2048 boundary pairs"
    ss._SPEC_BUCKETS[key] = b[:2] + (2048,) + b[3:]
    res2 = ss.doShepherdSegmentation(img, **kwargs)
    np.testing.assert_array_equal(res1.segimg, res2.segimg)
    assert res1.smallSegmentsEliminated == res2.smallSegmentsEliminated
    assert ss._SPEC_BUCKETS[key][2] > 2048


def test_one_shot_row_bucket_overflow_falls_back(rng):
    """A too-small per-row bucket (r_cap) drops pairs in the row-compact
    slice; the overflow flag must catch it and the run must fall back to
    the measured path transparently."""
    from pyshepseg_tpu import shepseg as ss
    img = (rng.integers(0, 30, size=(3, 128, 128)) * 8).astype(np.uint16)
    kwargs = dict(numClusters=8, minSegmentSize=5, maxSpectralDiff=None,
                  fixedKMeansInit=True)
    res1 = ss.doShepherdSegmentation(img, **kwargs)
    key = next(iter(ss._SPEC_BUCKETS))
    b = ss._SPEC_BUCKETS[key]
    assert b[3] > 16, "speckle rows should exceed 16 boundary pairs"
    ss._SPEC_BUCKETS[key] = b[:3] + (16,) + b[4:]
    res2 = ss.doShepherdSegmentation(img, **kwargs)
    np.testing.assert_array_equal(res1.segimg, res2.segimg)
    assert res1.smallSegmentsEliminated == res2.smallSegmentsEliminated
    assert ss._SPEC_BUCKETS[key][3] > 16


def test_one_shot_runlength_path_active_and_matches_measured(rng):
    """On coherent integer imagery wide enough for the gate (cap <= W/2),
    the one-shot dispatch must take the run-length reduction and still
    match the measured first run bit-for-bit."""
    from pyshepseg_tpu import shepseg as ss
    img, _ = _voronoi_image(rng, shape=(128, 128), ncentres=8, noise=1)
    kwargs = dict(numClusters=8, clusterSubsamplePcnt=100,
                  minSegmentSize=10, maxSpectralDiff=None,
                  fixedKMeansInit=True)
    res1 = ss.doShepherdSegmentation(img, **kwargs)
    key = next(iter(ss._SPEC_BUCKETS))
    rlCap = ss._SPEC_BUCKETS[key][4]
    # smooth cells at 128 wide: few runs per row, so the gate is open
    assert ss._rlCapEffective(rlCap, img.dtype, 128) == rlCap > 0, \
        "run-length path should be active for this configuration"
    res2 = ss.doShepherdSegmentation(img, **kwargs)
    np.testing.assert_array_equal(res1.segimg, res2.segimg)
    assert res1.smallSegmentsEliminated == res2.smallSegmentsEliminated


def test_one_shot_runlength_bucket_overflow_falls_back(rng):
    """A planted too-small rl_cap drops runs in the run-length
    reduction; the overflow flag must catch it and the run must fall
    back to the measured path transparently."""
    from pyshepseg_tpu import shepseg as ss
    # speckle at 128 wide: ~W runs per row, far above a 64 cap
    img = (rng.integers(0, 30, size=(3, 128, 128)) * 8).astype(np.uint16)
    kwargs = dict(numClusters=8, minSegmentSize=5, maxSpectralDiff=None,
                  fixedKMeansInit=True)
    res1 = ss.doShepherdSegmentation(img, **kwargs)
    key = next(iter(ss._SPEC_BUCKETS))
    b = ss._SPEC_BUCKETS[key]
    assert b[4] > 64, "speckle rows should exceed 64 runs"
    ss._SPEC_BUCKETS[key] = b[:4] + (64,)
    res2 = ss.doShepherdSegmentation(img, **kwargs)
    np.testing.assert_array_equal(res1.segimg, res2.segimg)
    assert res1.smallSegmentsEliminated == res2.smallSegmentsEliminated
    assert ss._SPEC_BUCKETS[key][4] > 64


def test_spec_bucket_policy_grow_only_on_alternation():
    """Alternating same-shape inputs of differing complexity must NOT
    thrash the speculative buckets: after the busy run ratchets them up,
    the quiet run leaves them in place (no overflow on the next busy
    run — each overflow costs a discarded dispatch + a measured rerun)."""
    from pyshepseg_tpu import shepseg as ss
    key = ("policy-test",)
    ss._SPEC_BUCKETS.pop(key, None)
    ss._SPEC_SHRINK.pop(key, None)
    busy = (8192, 24576, 16384, 512)
    quiet = (2048, 6144, 4096, 128)
    ss._updateSpecBuckets(key, busy)
    assert ss._SPEC_BUCKETS[key] == busy
    for _ in range(2):
        ss._updateSpecBuckets(key, quiet)
        assert ss._SPEC_BUCKETS[key] == busy   # held (streak < threshold)
        ss._updateSpecBuckets(key, busy)
        assert ss._SPEC_BUCKETS[key] == busy
        assert key not in ss._SPEC_SHRINK      # busy run reset the streak


def test_spec_bucket_policy_shrinks_after_streak():
    """A sustained run of quieter tiles shrinks the buckets to the
    streak's element-wise max, so one pathologically busy first tile
    doesn't tax the whole scene's dispatches (the graph loop's cost is
    linear in e_cap)."""
    from pyshepseg_tpu import shepseg as ss
    key = ("policy-test-2",)
    ss._SPEC_BUCKETS.pop(key, None)
    ss._SPEC_SHRINK.pop(key, None)
    busy = (8192, 24576, 16384, 512)
    ss._updateSpecBuckets(key, busy)
    quiets = [(2048, 6144, 4096, 128),
              (2048, 7168, 4096, 128),
              (1024, 6144, 2048, 64)]
    for q in quiets[:-1]:
        ss._updateSpecBuckets(key, q)
        assert ss._SPEC_BUCKETS[key] == busy
    ss._updateSpecBuckets(key, quiets[-1])
    # shrunk to the streak's element-wise max, not the last run's values
    assert ss._SPEC_BUCKETS[key] == (2048, 7168, 4096, 128)
    assert key not in ss._SPEC_SHRINK


def test_spec_bucket_policy_partial_growth_ratchets():
    """A run larger in ANY dimension grows that dimension immediately
    (element-wise max) and cancels any shrink streak."""
    from pyshepseg_tpu import shepseg as ss
    key = ("policy-test-3",)
    ss._SPEC_BUCKETS.pop(key, None)
    ss._SPEC_SHRINK.pop(key, None)
    ss._updateSpecBuckets(key, (4096, 8192, 8192, 256))
    ss._updateSpecBuckets(key, (2048, 4096, 4096, 128))  # streak 1
    assert key in ss._SPEC_SHRINK
    ss._updateSpecBuckets(key, (4096, 12288, 4096, 128))  # grows dim 1
    assert ss._SPEC_BUCKETS[key] == (4096, 12288, 8192, 256)
    assert key not in ss._SPEC_SHRINK


# ------------------- reference kernel compat layer (sequential host)


def _run_reference_small_elim(seg, img, maxSegId, minSegSize,
                              maxSpectralDiff, fourConnected):
    """The reference's eliminateSmallSegments driven through the compat
    kernels, with the reference's exact loop structure
    (reference: shepseg.py:918-1000)."""
    from pyshepseg_tpu.shepseg import (
        buildSegmentSpectra, makeSegSize, makeSegmentLocationsDict,
        findMergeSegment, doMerge, relabelSegments, SEGNULLVAL, MINSEGID,
        SegIdType)
    spectSum = buildSegmentSpectra(seg, img, maxSegId)
    segSize = makeSegSize(seg, maxSegId)
    segLoc = makeSegmentLocationsDict(seg, segSize)
    mergeSeg = np.full(maxSegId + 1, SEGNULLVAL, dtype=SegIdType)
    segIdRange = np.arange(MINSEGID, maxSegId + 1, dtype=SegIdType)
    numElim = 0
    for targetSize in range(1, minSegSize):
        countTargetSize = np.count_nonzero(segSize == targetSize)
        prevCount = -1
        numPasses = 0
        while countTargetSize != prevCount and numPasses < 10:
            prevCount = countTargetSize
            for segId in segIdRange:
                if segSize[segId] == targetSize:
                    mergeSeg[segId] = findMergeSegment(
                        segId, segLoc, seg, segSize, spectSum,
                        maxSpectralDiff, fourConnected)
            for segId in segIdRange:
                if mergeSeg[segId] != SEGNULLVAL:
                    doMerge(segId, mergeSeg[segId], seg, segSize, segLoc,
                            spectSum)
                    mergeSeg[segId] = SEGNULLVAL
                    numElim += 1
            countTargetSize = np.count_nonzero(segSize == targetSize)
            numPasses += 1
    relabelSegments(seg, segSize, MINSEGID)
    return numElim


def test_compat_single_pixel_kernels_match_device_driver(rng):
    """mergeSinglePixels / findNearestNeighbourPixel (sequential compat
    kernels) run to fixpoint must match the device
    eliminateSinglePixels driver."""
    from pyshepseg_tpu.shepseg import (makeSegSize, relabelSegments,
                                       eliminateSinglePixels, MINSEGID)
    img, _ = _voronoi_image(rng, shape=(48, 48), ncentres=9, noise=0)
    res = shepseg.doShepherdSegmentation(
        img, numClusters=9, clusterSubsamplePcnt=100, minSegmentSize=1,
        maxSpectralDiff=None, fourConnected=True, fixedKMeansInit=True)
    # re-clump to get a pre-elimination label image with singles
    from pyshepseg_tpu.ops.clump import clump
    clusters = shepseg.applySpectralClusters(res.kmeans, img, None)
    segA, maxSegId = clump(clusters, 0, fourConnected=True)
    segA = segA.astype(np.uint32)
    segB = segA.copy()

    # compat path: find-all-then-apply passes to fixpoint, then relabel
    sizeA = makeSegSize(segA, maxSegId)
    segToElim = np.empty((3, maxSegId + 1), dtype=np.int64)
    while shepseg.mergeSinglePixels(img, segA, sizeA, segToElim, True):
        pass
    relabelSegments(segA, sizeA, MINSEGID)

    # device path
    sizeB = makeSegSize(segB, maxSegId)
    eliminateSinglePixels(img, segB, sizeB, fourConnected=True)
    np.testing.assert_array_equal(segA, segB)


def test_compat_merge_kernels_match_device_driver(rng):
    """findMergeSegment / doMerge driven through the reference's exact
    sequential loop must match the device eliminateSmallSegments on a
    tie-free image."""
    from pyshepseg_tpu.shepseg import (makeSegSize, eliminateSinglePixels,
                                       eliminateSmallSegments)
    img, _ = _voronoi_image(rng, shape=(48, 48), ncentres=9, noise=0)
    res = shepseg.doShepherdSegmentation(
        img, numClusters=9, clusterSubsamplePcnt=100, minSegmentSize=1,
        maxSpectralDiff=None, fourConnected=True, fixedKMeansInit=True)
    from pyshepseg_tpu.ops.clump import clump
    clusters = shepseg.applySpectralClusters(res.kmeans, img, None)
    seg0, maxSegId = clump(clusters, 0, fourConnected=True)
    seg0 = seg0.astype(np.uint32)
    size0 = makeSegSize(seg0, maxSegId)
    eliminateSinglePixels(img, seg0, size0, fourConnected=True)
    maxSegId = int(seg0.max())

    segA = seg0.copy()
    segB = seg0.copy()
    nA = _run_reference_small_elim(segA, img, maxSegId, 8, 1e9, True)
    nB = eliminateSmallSegments(segB, img, maxSegId, 8, 1e9,
                                fourConnected=True)
    assert nA == nB
    np.testing.assert_array_equal(segA, segB)


@pytest.mark.parametrize("seed,four", [(1, True), (2, False), (3, True)])
def test_compat_merge_kernels_multiseed(seed, four):
    """Multi-seed differential sweep: the compat sequential loop vs the
    device graph elimination, 4- and 8-connected."""
    from pyshepseg_tpu.shepseg import (makeSegSize, eliminateSinglePixels,
                                       eliminateSmallSegments)
    from pyshepseg_tpu.ops.clump import clump
    rng = np.random.default_rng(seed)
    img, _ = _voronoi_image(rng, shape=(40, 40), ncentres=7, noise=0)
    res = shepseg.doShepherdSegmentation(
        img, numClusters=7, clusterSubsamplePcnt=100, minSegmentSize=1,
        maxSpectralDiff=None, fourConnected=four, fixedKMeansInit=True)
    clusters = shepseg.applySpectralClusters(res.kmeans, img, None)
    seg0, maxSegId = clump(clusters, 0, fourConnected=four)
    seg0 = seg0.astype(np.uint32)
    size0 = makeSegSize(seg0, maxSegId)
    eliminateSinglePixels(img, seg0, size0, fourConnected=four)
    maxSegId = int(seg0.max())

    segA = seg0.copy()
    segB = seg0.copy()
    nA = _run_reference_small_elim(segA, img, maxSegId, 6, 1e9, four)
    nB = eliminateSmallSegments(segB, img, maxSegId, 6, 1e9,
                                fourConnected=four)
    assert nA == nB
    np.testing.assert_array_equal(segA, segB)


def test_find_merge_segment_at_image_corner():
    """Regression: segment pixels at row/col 0 are uint32 in the
    location list; the neighbourhood walk must not wrap (it silently
    skipped the whole 3x3 window before the int cast)."""
    from pyshepseg_tpu.shepseg import (makeSegSize, buildSegmentSpectra,
                                       makeSegmentLocationsDict,
                                       findMergeSegment, SEGNULLVAL)
    seg = np.full((4, 4), 2, dtype=np.uint32)
    seg[0, 0] = 1
    seg[0, 1] = 1
    img = np.full((2, 4, 4), 100, dtype=np.int64)
    segSize = makeSegSize(seg, 2)
    spectSum = buildSegmentSpectra(seg, img, 2)
    segLoc = makeSegmentLocationsDict(seg, segSize)
    got = findMergeSegment(np.uint32(1), segLoc, seg, segSize, spectSum,
                           1e9, True)
    assert got == 2 and got != SEGNULLVAL
