"""Local-directory SRTM lookup (the hermetic replacement of srtm4,
reference rpc_utils.py:191)."""

import numpy as np

from s2p_tpu.core import srtm
from s2p_tpu.core import rpc_geom


def _write_tile(tmp_path, name, grid):
    (tmp_path / name).write_bytes(grid.astype('>i2').tobytes())


def test_bilinear_lookup_and_nodata(tmp_path):
    size = 1201
    ys = np.arange(size)[:, None]
    xs = np.arange(size)[None, :]
    # height = 100 + lon_frac*50 + lat_frac*20 on tile N21E055... with
    # row 0 at lat 22 (north edge)
    lon_frac = xs / (size - 1)
    lat_frac = 1.0 - ys / (size - 1)
    grid = np.round(100 + 50 * lon_frac + 20 * lat_frac).astype(np.int16)
    grid[900, 900] = srtm.NODATA
    _write_tile(tmp_path, 'S22E055.hgt', grid)

    # S22E055 covers lat [-22, -21], lon [55, 56]
    v = srtm.lookup(str(tmp_path), [55.5, 55.0], [-21.5, -22.0])
    assert abs(v[0] - (100 + 25 + 10)) < 1.0
    assert abs(v[1] - 100) < 1.0
    # nodata neighborhood -> NaN; missing tile -> NaN
    vn = srtm.lookup(str(tmp_path), [55 + 900 / 1200.0],
                     [-22 + (1200 - 900) / 1200.0])
    assert np.isnan(vn[0])
    assert np.isnan(srtm.lookup(str(tmp_path), [10.5], [45.5])[0])


def test_altitude_range_uses_srtm_dir(tmp_path, monkeypatch):
    """use_srtm with S2P_TPU_SRTM_DIR drives the altitude range from the
    local tiles (geoid heights converted to ellipsoid like the reference's
    rpc_utils.altitude_range)."""
    from conftest import data_path
    from s2p_tpu.geo import rpc_io

    size = 1201
    grid = np.full((size, size), 1500, np.int16)
    _write_tile(tmp_path, 'S22E055.hgt', grid)
    monkeypatch.setenv('S2P_TPU_SRTM_DIR', str(tmp_path))

    rpc = rpc_io.rpc_from_geotiff(data_path('input_pair/img_01.tif'))
    lo, hi = rpc_geom.altitude_range(rpc, 150, 150, 700, 700, use_srtm=True)
    # flat 1500 m geoid + Reunion undulation (~+9 m) => narrow range
    assert hi - lo < 30
    assert 1400 < lo < 1600
