"""Fake rios.applier: the subset of the API the RIOS stats drivers use."""

import os
import tempfile

import numpy

from pyshepseg_tpu import io as rio

CW_NONE = "CW_NONE"


class ApplierControls:
    def __init__(self):
        self.windowxsize = 256
        self.windowysize = 256
        self.tempdir = tempfile.gettempdir()
        self.layerSelection = {}
        self.concurrencyStyle = None

    def setWindowSize(self, x, y):
        self.windowxsize, self.windowysize = int(x), int(y)

    def selectInputImageLayers(self, layers, imagename):
        self.layerSelection[imagename] = list(layers)

    def setConcurrencyStyle(self, style):
        self.concurrencyStyle = style


class ConcurrencyStyle:
    def __init__(self, numReadWorkers=0, numComputeWorkers=0,
                 computeWorkerKind=CW_NONE):
        self.numReadWorkers = numReadWorkers
        self.numComputeWorkers = numComputeWorkers
        self.computeWorkerKind = computeWorkerKind


class FilenameAssociations:
    pass


class OtherInputs:
    pass


class TempfileManager:
    def __init__(self, tempdir):
        self.tempdir = tempdir

    def mktempfile(self, prefix="", suffix=""):
        (fd, path) = tempfile.mkstemp(prefix=prefix, suffix=suffix,
                                      dir=self.tempdir)
        os.close(fd)
        os.remove(path)  # rio.create wants to create it fresh
        return path


class _BlockInfo:
    def __init__(self, xoff, yoff):
        self._xoff, self._yoff = xoff, yoff

    def getPixColRow(self, col, row):
        return (self._xoff + col, self._yoff + row)


class _ApplyResult:
    pass


def apply(userFunc, inputs, outputs, controls=None, otherArgs=None):
    """Iterate row-major windows over the inputs, calling userFunc per
    block with layer-first arrays, like the real RIOS applier."""
    if controls is None:
        controls = ApplierControls()
    names = [n for n in vars(inputs) if not n.startswith("_")]
    datasets = {}
    for name in names:
        path = getattr(inputs, name)
        ds = rio.open(path)
        layers = controls.layerSelection.get(
            name, list(range(1, ds.RasterCount + 1)))
        datasets[name] = (ds, layers)

    ds0 = datasets[names[0]][0]
    (xsize, ysize) = (ds0.RasterXSize, ds0.RasterYSize)
    bx, by = controls.windowxsize, controls.windowysize

    class _Blk:
        pass

    for yoff in range(0, ysize, by):
        for xoff in range(0, xsize, bx):
            wx = min(bx, xsize - xoff)
            wy = min(by, ysize - yoff)
            blockInputs = _Blk()
            for name, (ds, layers) in datasets.items():
                arrs = [ds.GetRasterBand(b).ReadAsArray(xoff, yoff, wx, wy)
                        for b in layers]
                setattr(blockInputs, name, numpy.stack(arrs))
            info = _BlockInfo(xoff, yoff)
            userFunc(info, blockInputs, _Blk(), otherArgs)
    return _ApplyResult()
