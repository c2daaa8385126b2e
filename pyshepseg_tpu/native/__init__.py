"""
Native (C++) host kernels for order-dependent sequential operations, built
on demand with the system toolchain and loaded through ctypes (pybind11 is
deliberately not required). See ccl.cpp for what lives here and why.

Public surface:

- ``available()`` — True when the shared library compiled and loaded.
- ``flood_fill_clump(img, ignoreVal, fourConnected, maxClumpSize, clumpId)``
  — reference-parity scan-order flood fill
  (reference: pyshepseg/shepseg.py:452-541 incl. the MAX_CLUMP_SIZE cap).
- ``subset_recode(tile, mask, lut, nextId, hist)`` — first-encounter dense
  recode (reference: pyshepseg/subset.py:367-424).
- ``stitch_relabel(tileData, mapping, recoded, start_id, top, bottom,
  left, right)`` — the fused per-tile stitch recode hot loop
  (reference: pyshepseg/tiling.py:1231-1290); returns None when the
  library is unavailable and the caller runs its numpy path.

All have fallbacks so the package works without a compiler; callers
should route through the wrappers here, not the raw library.
"""

import os
import ctypes
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ccl.cpp")
_LIB_NAME = "_pyshepseg_tpu_native.so"

_lib = None
_build_error = None


def _build_and_load():
    """Compile ccl.cpp to a cached shared library and dlopen it."""
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib

    if not os.path.exists(_SRC):
        # Source not shipped/installed — engage the pure-Python fallbacks
        _build_error = FileNotFoundError(_SRC)
        return None
    # Build targets: the package dir, else a per-user cache dir. Never
    # the shared system temp dir — dlopening a predictable filename from
    # a world-writable directory lets any local user plant a library.
    userCache = os.path.join(
        os.path.expanduser("~"), ".cache", "pyshepseg_tpu")
    candidates = [os.path.join(_HERE, _LIB_NAME),
                  os.path.join(userCache, _LIB_NAME)]
    src_mtime = os.path.getmtime(_SRC)
    for libpath in candidates:
        if (os.path.exists(libpath) and
                os.path.getmtime(libpath) >= src_mtime):
            try:
                _lib = ctypes.CDLL(libpath)
                break
            except OSError:
                pass
    if _lib is None:
        for libpath in candidates:
            tmp = libpath + ".tmp%d" % os.getpid()
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   _SRC, "-o", tmp]
            try:
                os.makedirs(os.path.dirname(libpath), exist_ok=True)
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(tmp, libpath)
                _lib = ctypes.CDLL(libpath)
                break
            except (OSError, subprocess.CalledProcessError) as e:
                _build_error = e
                continue
        else:
            return None
    _build_error = None

    _lib.flood_fill_clump.restype = ctypes.c_uint32
    _lib.flood_fill_clump.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32]
    _lib.subset_recode.restype = ctypes.c_uint32
    _lib.subset_recode.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint32)]
    _lib.stitch_relabel.restype = ctypes.c_uint32
    _lib.stitch_relabel.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32)]
    _lib.stitch_mapping.restype = ctypes.c_uint32
    _lib.stitch_mapping.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32)]
    return _lib


def available():
    """True when the native library is (or can be) built and loaded."""
    return _build_and_load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def flood_fill_clump(img, ignoreVal, fourConnected=True, maxClumpSize=None,
                     clumpId=1):
    """
    Scan-order flood-fill clumping with the reference's clump-size cap
    semantics. Returns (seg uint32 (H, W), nextClumpId).
    """
    img = np.ascontiguousarray(img, dtype=np.int32)
    h, w = img.shape
    out = np.zeros((h, w), dtype=np.uint32)
    cap = -1 if maxClumpSize is None else int(maxClumpSize)
    lib = _build_and_load()
    if lib is not None:
        nxt = lib.flood_fill_clump(
            _ptr(img, ctypes.c_int32), h, w, int(ignoreVal),
            int(bool(fourConnected)), cap, _ptr(out, ctypes.c_uint32),
            int(clumpId))
        return out, int(nxt)
    return _flood_fill_py(img, int(ignoreVal), bool(fourConnected),
                          cap, int(clumpId), out)


def _flood_fill_py(img, ignoreVal, fourConnected, cap, clumpId, out):
    """Pure-Python fallback (slow; for compiler-less environments)."""
    h, w = img.shape
    capval = float("inf") if cap < 0 else cap
    for y in range(h):
        for x in range(w):
            if img[y, x] == ignoreVal or out[y, x] != 0:
                continue
            val = img[y, x]
            size = 0
            stack = [(y, x)]
            out[y, x] = clumpId
            while stack and size < capval:
                sy, sx = stack.pop()
                for cx in range(max(sx - 1, 0), min(sx + 1, w - 1) + 1):
                    for cy in range(max(sy - 1, 0), min(sy + 1, h - 1) + 1):
                        conn = not fourConnected or (cy == sy or cx == sx)
                        if (conn and img[cy, cx] != ignoreVal and
                                out[cy, cx] == 0 and img[cy, cx] == val):
                            out[cy, cx] = clumpId
                            size += 1
                            stack.append((cy, cx))
            clumpId += 1
    return out, clumpId


def _checkMapping(mapping):
    """The C side takes a raw pointer to ``mapping`` and updates it in
    place: an int64/bool array would be silently reinterpreted as uint32
    memory, so reject wrong layouts loudly (an explicit raise, not an
    assert — asserts vanish under ``python -O``)."""
    if mapping.dtype != np.uint32 or not mapping.flags.c_contiguous:
        raise TypeError(
            "mapping must be a C-contiguous uint32 array (updated in "
            f"place by the native code); got {mapping.dtype}")


def stitch_relabel(tileData, mapping, recoded, start_id,
                   top, bottom, left, right):
    """
    Fused per-tile stitch recode (see ccl.cpp stitch_relabel). ``mapping``
    (uint32) / ``recoded`` (uint8) are (tileMax+1,) arrays preloaded with
    the recode-dict entries; mapping is updated in place with the fresh
    ids assigned to owned segments. Returns
    ``(outTile, newMaxSegId, winCounts)`` where winCounts[id] is the old
    id's pixel count inside the trimmed window — or ``None`` when the
    native library is unavailable (caller runs its numpy path).
    """
    lib = _build_and_load()
    if lib is None:
        return None
    tileData = np.ascontiguousarray(tileData, dtype=np.uint32)
    _checkMapping(mapping)
    recoded = np.ascontiguousarray(recoded, dtype=np.uint8)
    h, w = tileData.shape
    cnt = np.zeros(mapping.shape[0], dtype=np.uint32)
    out = np.empty_like(tileData)
    newMax = lib.stitch_relabel(
        _ptr(tileData, ctypes.c_uint32), h, w,
        int(top), int(bottom), int(left), int(right),
        _ptr(mapping, ctypes.c_uint32), _ptr(recoded, ctypes.c_uint8),
        mapping.shape[0], int(start_id),
        _ptr(cnt, ctypes.c_uint32), _ptr(out, ctypes.c_uint32))
    return out, int(newMax), cnt


def stitch_mapping(tileData, mapping, recoded, start_id,
                   top, bottom, left, right):
    """
    stitch_relabel's passes 1-2 only (see ccl.cpp stitch_mapping):
    window count + ascending owned-id assignment into ``mapping`` (in
    place, uint32). Returns ``(newMaxSegId, winCounts)`` — winCounts[id]
    is the old id's pixel count inside the trimmed window — or ``None``
    when the native library is unavailable (caller runs its numpy path).
    """
    lib = _build_and_load()
    if lib is None:
        return None
    tileData = np.ascontiguousarray(tileData, dtype=np.uint32)
    _checkMapping(mapping)
    recoded = np.ascontiguousarray(recoded, dtype=np.uint8)
    h, w = tileData.shape
    cnt = np.zeros(mapping.shape[0], dtype=np.uint32)
    newMax = lib.stitch_mapping(
        _ptr(tileData, ctypes.c_uint32), h, w,
        int(top), int(bottom), int(left), int(right),
        _ptr(mapping, ctypes.c_uint32), _ptr(recoded, ctypes.c_uint8),
        mapping.shape[0], int(start_id),
        _ptr(cnt, ctypes.c_uint32))
    return int(newMax), cnt


def subset_recode(tile, mask, lut, nextId, hist):
    """
    First-encounter dense recode of one tile (scan order). ``lut`` (uint32,
    len maxOldId+1, 0 = unassigned) and ``hist`` (uint64 pixel counts by
    new id) are updated in place. Returns (outTile, nextId).
    """
    tile = np.ascontiguousarray(tile, dtype=np.uint32)
    out = np.empty_like(tile)
    n = tile.size
    lib = _build_and_load()
    if mask is not None:
        # Nonzero-ness in the ORIGINAL dtype — a plain uint8 cast would
        # wrap values like 256 to 0 and silently drop kept pixels
        mask = np.ascontiguousarray(np.asarray(mask) != 0, dtype=np.uint8)
    if lib is not None:
        maskp = (ctypes.POINTER(ctypes.c_uint8)() if mask is None else
                 _ptr(mask, ctypes.c_uint8))
        nxt = lib.subset_recode(
            _ptr(tile, ctypes.c_uint32), maskp, n,
            _ptr(lut, ctypes.c_uint32), int(nextId),
            _ptr(hist, ctypes.c_uint64), _ptr(out, ctypes.c_uint32))
        return out.reshape(tile.shape), int(nxt)
    # Python fallback
    flat = tile.ravel()
    outf = out.ravel()
    maskf = None if mask is None else np.ascontiguousarray(
        mask, dtype=np.uint8).ravel()
    for i in range(n):
        v = flat[i]
        if v == 0 or (maskf is not None and maskf[i] == 0):
            outf[i] = 0
            continue
        nid = lut[v]
        if nid == 0:
            nid = nextId
            lut[v] = nid
            nextId += 1
        outf[i] = nid
        hist[nid] += 1
    return out.reshape(tile.shape), int(nextId)
