"""Fake rios.ratapplier: copyRAT only (column copy via the rio layer)."""

from pyshepseg_tpu import io as rio


def copyRAT(srcPath, dstPath):
    srcRat = rio.open(srcPath).GetRasterBand(1).GetDefaultRAT()
    dstDs = rio.open(dstPath, rio.GA_Update)
    dstRat = dstDs.GetRasterBand(1).GetDefaultRAT()
    dstNames = [dstRat.GetNameOfCol(i)
                for i in range(dstRat.GetColumnCount())]
    if dstRat.GetRowCount() < srcRat.GetRowCount():
        dstRat.SetRowCount(srcRat.GetRowCount())
    for i in range(srcRat.GetColumnCount()):
        name = srcRat.GetNameOfCol(i)
        if name not in dstNames:
            dstRat.CreateColumn(name, srcRat.GetTypeOfCol(i),
                                srcRat.GetUsageOfCol(i))
            dstNames.append(name)
        dstRat.WriteArray(srcRat.ReadAsArray(i), dstNames.index(name))
    dstDs.FlushCache()
