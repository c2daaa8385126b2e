"""
Core in-memory segmentation engine (public API).

TPU-native implementation of the Shepherd et al (2019) iterative-elimination
segmentation. Mirrors the reference module's public surface
(reference: pyshepseg/shepseg.py): ``doShepherdSegmentation`` orchestrates
k-means spectral clustering -> connected-component clumping -> single-pixel
elimination -> small-segment elimination -> relabel, but each stage is a
JAX/XLA device kernel (see pyshepseg_tpu.ops.*) instead of a numba loop.

Segment ID numbers start from 1; zero is the null segment ID.
"""

import time

import numpy as np

from .ops.constants import SegIdType, SEGNULLVAL, MINSEGID  # noqa: F401
from .ops.clump import clump  # noqa: F401
from .ops.segreduce import (  # noqa: F401
    makeSegSize, buildSegmentSpectra, relabelSegments,
    makeSegmentLocations, SegmentLocations)
from .ops.elim_single import eliminateSinglePixels  # noqa: F401
from .ops.elim_small import eliminateSmallSegments  # noqa: F401
from .ops.kmeans import TPUKMeans, predict_labels


class SegmentationResult(object):
    """
    Results of the segmentation process
    (reference: pyshepseg/shepseg.py:104-127).

    Attributes
    ----------
    segimg : numpy array (nRows, nCols)
        Elements are segment ID numbers (starting from 1)
    kmeans : TPUKMeans (or any object with cluster_centers_)
        Fitted clustering object
    maxSpectralDiff : float
        The value used to limit segment merging
    singlePixelsEliminated : int
        Number of single pixels merged into adjacent segments
    smallSegmentsEliminated : int
        Number of small segments merged into adjacent segments
    """

    def __init__(self):
        self.segimg = None
        self.kmeans = None
        self.maxSpectralDiff = None
        self.singlePixelsEliminated = None
        self.smallSegmentsEliminated = None


def doShepherdSegmentation(img, numClusters=60, clusterSubsamplePcnt=1,
        minSegmentSize=50, maxSpectralDiff='auto', imgNullVal=None,
        fourConnected=True, verbose=False, fixedKMeansInit=False,
        kmeansObj=None, spectDistPcntile=50):
    """
    Perform Shepherd segmentation in memory on the given multi-band img
    array of shape (nBands, nRows, nCols)
    (reference: pyshepseg/shepseg.py:130-249 — same parameters, same
    semantics; compute runs on TPU).

    Returns a SegmentationResult. Segment IDs start from 1; 0 is null.
    """
    img = np.ascontiguousarray(img)

    t0 = time.time()
    if kmeansObj is not None:
        km = kmeansObj
    else:
        km = fitSpectralClusters(img, numClusters, clusterSubsamplePcnt,
                                 imgNullVal, fixedKMeansInit)
    clusters = applySpectralClusters(km, img, imgNullVal)
    if verbose:
        print("Kmeans, in", round(time.time() - t0, 1), "seconds")

    t0 = time.time()
    (seg, maxSegId) = clump(clusters, SEGNULLVAL, fourConnected=fourConnected,
                            clumpId=MINSEGID)
    maxSegId = SegIdType(maxSegId - 1)
    if verbose:
        print("Found", maxSegId, "clumps, in",
              round(time.time() - t0, 1), "seconds")

    segSize = makeSegSize(seg)

    t0 = time.time()
    oldMaxSegId = maxSegId
    eliminateSinglePixels(img, seg, segSize, MINSEGID, maxSegId,
                          fourConnected)
    maxSegId = seg.max()
    numElimSinglepix = int(oldMaxSegId) - int(maxSegId)
    if verbose:
        print("Eliminated", numElimSinglepix, "single pixels, in",
              round(time.time() - t0, 1), "seconds")

    maxSpectralDiff = autoMaxSpectralDiff(km, maxSpectralDiff,
                                          spectDistPcntile)

    t0 = time.time()
    numElimSmall = eliminateSmallSegments(seg, img, maxSegId, minSegmentSize,
                                          maxSpectralDiff, fourConnected,
                                          MINSEGID)
    if verbose:
        print("Eliminated", numElimSmall, "segments, in",
              round(time.time() - t0, 1), "seconds")
        print("Final result has", seg.max(), "segments")

    segResult = SegmentationResult()
    segResult.segimg = seg
    segResult.kmeans = km
    segResult.maxSpectralDiff = maxSpectralDiff
    segResult.singlePixelsEliminated = numElimSinglepix
    segResult.smallSegmentsEliminated = numElimSmall
    return segResult


def fitSpectralClusters(img, numClusters, subsamplePcnt, imgNullVal,
        fixedKMeansInit):
    """
    Fit the k-means spectral clustering stage on a subsample of the image
    (reference: pyshepseg/shepseg.py:252-314 — same sampling rule:
    drop null pixels, then stride-subsample with skip=round(100/pcnt)).

    Returns a fitted TPUKMeans (sklearn-KMeans compatible surface).
    """
    (nBands, nRows, nCols) = img.shape
    xFull = np.transpose(img, axes=(1, 2, 0)).reshape(
        (nRows * nCols, nBands))

    if imgNullVal is not None:
        nonNull = (xFull != imgNullVal).all(axis=1)
        xNonNull = xFull[nonNull]
        del nonNull
    else:
        xNonNull = xFull
    skip = int(round(100. / subsamplePcnt))
    xSample = xNonNull[::skip]
    del xFull, xNonNull

    numKmeansTrials = 5
    init = 'k-means++'
    if fixedKMeansInit:
        init = diagonalClusterCentres(xSample, numClusters)
        numKmeansTrials = 1
    km = TPUKMeans(n_clusters=numClusters, n_init=numKmeansTrials, init=init)
    km.fit(xSample)
    return km


def applySpectralClusters(kmeansObj, img, imgNullVal):
    """
    Predict spectral clusters for every pixel
    (reference: pyshepseg/shepseg.py:317-361). Cluster IDs start from 1;
    pixels with imgNullVal in any band become SEGNULLVAL.

    Accepts any object with ``cluster_centers_`` (TPUKMeans or a fitted
    sklearn KMeans); the assignment itself always runs on device.
    """
    (nBands, nRows, nCols) = img.shape
    xFull = np.transpose(img, axes=(1, 2, 0)).reshape(
        (nRows * nCols, nBands))

    centers = getattr(kmeansObj, 'cluster_centers_', None)
    if centers is not None:
        import jax.numpy as jnp
        centers_j = jnp.asarray(np.asarray(centers, dtype=np.float32))
        clustersFull = np.empty(xFull.shape[0], dtype=np.int32)
        chunk = 1 << 22
        for start in range(0, xFull.shape[0], chunk):
            xs = jnp.asarray(xFull[start:start + chunk].astype(np.float32))
            clustersFull[start:start + xs.shape[0]] = np.asarray(
                predict_labels(xs, centers_j))
    else:
        clustersFull = kmeansObj.predict(xFull)
    del xFull
    clustersImg = clustersFull.reshape((nRows, nCols)).astype(SegIdType)

    clustersImg += 1
    if imgNullVal is not None:
        nullmask = (img == imgNullVal).any(axis=0)
        clustersImg[nullmask] = SEGNULLVAL

    return clustersImg


def diagonalClusterCentres(xSample, numClusters):
    """
    Deterministic initial cluster centres, evenly spaced along the diagonal
    of the data bounding box, end points one step in from the corners
    (reference: pyshepseg/shepseg.py:364-397 — including the reference's
    behaviour of keeping the sample's integer dtype, which truncates).
    """
    (numPoints, numBands) = xSample.shape
    bandMin = xSample.min(axis=0)
    bandMax = xSample.max(axis=0)

    centres = np.empty((numClusters, numBands), dtype=xSample.dtype)
    step = (bandMax - bandMin) / (numClusters + 1)
    for i in range(numClusters):
        centres[i] = bandMin + (i + 1) * step

    return centres


def autoMaxSpectralDiff(km, maxSpectralDiff, distPcntile):
    """
    Resolve the maxSpectralDiff setting
    (reference: pyshepseg/shepseg.py:400-449): 'auto' -> the given
    percentile of pairwise distances between cluster centres; None ->
    10x the largest distance (effectively unbounded); else pass through.
    """
    centres = np.asarray(km.cluster_centers_, dtype=np.float64)
    numClusters = centres.shape[0]
    iu = np.triu_indices(numClusters, k=1)
    diffs = centres[iu[0]] - centres[iu[1]]
    clusterDist = np.sqrt((diffs ** 2).sum(axis=1)).astype(np.float32)

    if isinstance(maxSpectralDiff, str) and maxSpectralDiff == 'auto':
        maxSpectralDiff = np.percentile(clusterDist, distPcntile)
    elif maxSpectralDiff is None:
        maxSpectralDiff = 10 * clusterDist.max()

    return maxSpectralDiff
