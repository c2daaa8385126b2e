"""End-to-end tests of doShepherdSegmentation on synthetic imagery."""

import numpy as np

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
