"""EGM96 geoid grid loading and strict-mode behavior.

The reference resolves geoid offsets through PROJ's us_nga_egm96_15 grid
(/root/reference/s2p/geographiclib.py:16-37); here the GTX loader + the
compound-CRS vertical datum path (epsg:XXXX+5773) are covered, mirroring the
out_crs parameterization of /root/reference/tests/triangulation_test.py:13-33.
"""

import numpy as np
import pytest

from s2p_tpu.geo import crs as crsmod
from s2p_tpu.geo import geoid


def _grid_available():
    geoid._load_grid()
    return geoid._grid is not None


@pytest.mark.skipif(not _grid_available(), reason='no EGM96 grid on system')
def test_gtx_known_values():
    # textbook EGM96 undulations (meters): (0,0) = 17.16, Greenwich ~ 46
    assert abs(float(geoid.geoid_above_ellipsoid(0.0, 0.0)) - 17.16) < 0.2
    assert abs(float(geoid.geoid_above_ellipsoid(51.4778, 0.0)) - 46.0) < 0.5
    # vectorized + longitude wrap
    v = geoid.geoid_above_ellipsoid(np.array([0.0, 0.0]), np.array([10.0, -350.0]))
    assert np.allclose(v[0], v[1], atol=1e-9)


@pytest.mark.skipif(not _grid_available(), reason='no EGM96 grid on system')
def test_compound_crs_roundtrip():
    # epsg:32740+5773 (UTM 40S + EGM96 heights): ellipsoid -> geoid -> back
    lon, lat, z = 55.5, -21.1, 500.0
    x, y, zg = crsmod.transform(lon, lat, 4979, 'epsg:32740+5773', z)
    lon2, lat2, z2 = crsmod.transform(x, y, 'epsg:32740+5773', 4979, zg)
    assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9
    assert abs(z2 - z) < 1e-6
    # the undulation actually applied is the grid's, not the coarse one
    n = float(geoid.geoid_above_ellipsoid(lat, lon))
    assert abs((z - zg) - n) < 1e-6


def test_strict_mode_errors_without_grid(monkeypatch):
    # simulate a system without any grid: strict lookups must raise
    monkeypatch.setattr(geoid, '_grid', None)
    monkeypatch.setattr(geoid, '_grid_loaded', True)
    monkeypatch.delenv('S2P_TPU_ALLOW_COARSE_GEOID', raising=False)
    with pytest.raises(RuntimeError, match='EGM96'):
        geoid.geoid_above_ellipsoid(-21.0, 55.5, strict=True)
    # non-strict falls back with a warning; override env allows strict
    with pytest.warns(UserWarning):
        monkeypatch.setattr(geoid, '_warned', False)
        v = geoid.geoid_above_ellipsoid(-21.0, 55.5)
    assert np.isfinite(v)
    monkeypatch.setenv('S2P_TPU_ALLOW_COARSE_GEOID', '1')
    assert np.isfinite(geoid.geoid_above_ellipsoid(-21.0, 55.5, strict=True))
