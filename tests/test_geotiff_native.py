"""Pin the native windowed-TIFF fast path (s2p_tpu/native/tiffio.cpp).

``geotiff.read`` silently falls back to the pure-python reader when
``libtiffio.so`` is missing or refuses a layout -- these tests make that
rot loud: the library must BUILD AND LOAD on this image (a failure here
is a failure, not a skip), native windowed reads must equal the python
reader bitwise on strip- and tile-organized files including deflate
compression, and the fast path must actually engage for the layouts the
pipeline writes."""

import numpy as np
import pytest

from s2p_tpu.geo import geotiff, geotiff_native


def test_native_library_builds_and_loads():
    """The auto-make + ctypes load must succeed -- no silent fallback."""
    assert geotiff_native.available(), (
        'libtiffio.so failed to build or load; the windowed fast path '
        'is dead (make -C s2p_tpu/native)')


@pytest.mark.parametrize('tiled', [False, True])
@pytest.mark.parametrize('compress', [None, 'deflate'])
@pytest.mark.parametrize('dtype', [np.float32, np.uint16])
def test_native_window_equals_python(tmp_path, tiled, compress, dtype):
    rng = np.random.RandomState(7)
    arr = (rng.rand(300, 517) * 1000).astype(dtype)
    p = str(tmp_path / f'f_{tiled}_{compress}.tif')
    geotiff.write(p, arr, compress=compress, tiled=tiled)

    # full-image parity first (python reader is the reference)
    full_py = geotiff.read(p)
    assert np.array_equal(full_py, arr)

    windows = [(0, 0, 64, 64), (100, 37, 200, 129), (400, 250, 117, 50),
               (0, 290, 517, 10)]
    for (x, y, w, h) in windows:
        native = geotiff_native.read_window(p, x, y, w, h)
        assert native is not None, (
            f'native reader refused layout tiled={tiled} '
            f'compress={compress} dtype={dtype}')
        assert native.dtype == arr.dtype
        assert np.array_equal(native, arr[y:y + h, x:x + w])


def test_read_uses_native_path_for_windows(tmp_path, monkeypatch):
    """geotiff.read(window=...) must route through the native reader when
    available -- if the dispatch rots, this fails."""
    arr = np.arange(200 * 300, dtype=np.float32).reshape(200, 300)
    p = str(tmp_path / 'routed.tif')
    geotiff.write(p, arr)

    calls = []
    orig = geotiff_native.read_window

    def spy(path, x, y, w, h):
        calls.append((x, y, w, h))
        return orig(path, x, y, w, h)

    monkeypatch.setattr(geotiff_native, 'read_window', spy)
    out = geotiff.read(p, window=(40, 30, 64, 32))
    assert calls, 'windowed read did not use the native fast path'
    assert np.array_equal(out, arr[30:62, 40:104])
