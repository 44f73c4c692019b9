"""ctypes binding to the native TIFF window reader (libtiffio.so).

Fast path for :func:`s2p_tpu.geo.geotiff.read`: windowed decodes touch only
the strips/tiles intersecting the window (the pure-python reader decodes
the whole raster).  Falls back transparently when the library has not been
built (``make -C s2p_tpu/native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'native')
_LIB_PATH = os.path.join(_LIB_DIR, 'libtiffio.so')

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(['make', '-C', _LIB_DIR, '-s'], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib = False
        return _lib
    lib.tiff_open.restype = ctypes.c_void_p
    lib.tiff_open.argtypes = [ctypes.c_char_p]
    lib.tiff_close.argtypes = [ctypes.c_void_p]
    lib.tiff_info.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_int64)]
    lib.tiff_read_window.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p]
    _lib = lib
    return _lib


def available():
    return bool(_load())


_DTYPES = {(1, 8): np.uint8, (1, 16): np.uint16, (1, 32): np.uint32,
           (2, 8): np.int8, (2, 16): np.int16, (2, 32): np.int32,
           (3, 32): np.float32, (3, 64): np.float64}


def read_window(path, x, y, w, h):
    """Native windowed read; returns (h, w) or (h, w, spp) array or None
    when the library/file layout is unsupported."""
    lib = _load()
    if not lib:
        return None
    handle = lib.tiff_open(path.encode())
    if not handle:
        return None
    try:
        info = (ctypes.c_int64 * 7)()
        if lib.tiff_info(handle, info) != 0:
            return None
        W, H, spp, bps, sf, comp, tiled = list(info)
        if comp not in (1, 8, 32946, 32773):
            return None
        dt = _DTYPES.get((sf, bps))
        if dt is None:
            return None
        out = np.zeros((h, w, spp), dtype=dt)
        rc = lib.tiff_read_window(handle, int(x), int(y), int(w), int(h),
                                  out.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            return None
        return out[:, :, 0] if spp == 1 else out
    finally:
        lib.tiff_close(handle)
