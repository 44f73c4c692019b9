"""Golden tests of the RPC geometry core against the reference expectations
(mirrors /root/reference/tests/rpc_utils_test.py)."""

import os

import numpy as np
import pytest

from s2p_tpu.core import rpc_geom
from s2p_tpu.geo import rpc_from_geotiff

from conftest import data_path


def _rpc(name):
    return rpc_from_geotiff(data_path(os.path.join('input_pair', name)))


def test_matches_from_rpc():
    r1 = _rpc('img_01.tif')
    r2 = _rpc('img_02.tif')
    m = rpc_geom.matches_from_rpc(r1, r2, 100, 100, 200, 200, 5)
    expected = np.loadtxt(data_path('expected_output/units/unit_matches_from_rpc.txt'))
    assert m.shape[0] == 125
    np.testing.assert_allclose(m, expected, rtol=0.01, atol=0.1)


def test_roi_process_no_dem():
    rpc = _rpc('img_01.tif')
    ll_poly = np.array([
        [55.649517, -21.231542],
        [55.651502, -21.231542],
        [55.651502, -21.229672],
        [55.649517, -21.229672],
    ])
    out = rpc_geom.roi_process(rpc, ll_poly)
    computed = [out[k] for k in ('x', 'y', 'w', 'h')]
    np.testing.assert_allclose(
        computed, (271.48531, 1.59019, 407.37861, 413.53010), atol=1e-3)


def test_roi_process_exogenous_dem():
    """Exogenous DEM path, ellipsoid mode (geoid mode needs an EGM96 grid).

    Expected values from the reference parameterization
    (rpc_utils_test.py:44-52, exogenous_dem_geoid_mode=False case).
    """
    rpc = _rpc('img_01.tif')
    ll_poly = np.array([
        [55.649517, -21.231542],
        [55.651502, -21.231542],
        [55.651502, -21.229672],
        [55.649517, -21.229672],
    ])
    dem = data_path('expected_output/pair/dsm.tif')
    out = rpc_geom.roi_process(rpc, ll_poly, exogenous_dem=dem,
                               exogenous_dem_geoid_mode=False)
    computed = [out[k] for k in ('x', 'y', 'w', 'h')]
    np.testing.assert_allclose(
        computed, (356.46596, 307.35347, 408.18841, 413.54916), atol=1e-3)


def test_localization_projection_roundtrip():
    rpc = _rpc('img_01.tif')
    rng = np.random.RandomState(0)
    cols = rng.uniform(0, 1000, 50)
    rows = rng.uniform(0, 1000, 50)
    alts = rng.uniform(0, 2000, 50)
    lon, lat = rpc.localization(cols, rows, alts)
    c2, r2 = rpc.projection(lon, lat, alts)
    np.testing.assert_allclose(c2, cols, atol=1e-6)
    np.testing.assert_allclose(r2, rows, atol=1e-6)


def test_corresponding_roi():
    r1 = _rpc('img_01.tif')
    r2 = _rpc('img_02.tif')
    out = rpc_geom.corresponding_roi(r1, r2, 150, 150, 700, 700)
    # the corresponding ROI must intersect the 1024x1024 secondary image
    # (it may spill outside: the coarse RPC altitude range is wide, and the
    # reference clips it downstream via rectangles_intersect)
    x, y, w, h = out
    assert x < 1024 and y < 1024 and x + w > 0 and y + h > 0
    assert w > 500 and h > 500


def test_gsd_from_rpc():
    rpc = _rpc('img_01.tif')
    gsd = rpc_geom.gsd_from_rpc(rpc)
    # Pleiades panchromatic GSD is ~0.7 m
    assert 0.4 < gsd < 1.0


def test_utm_zone():
    rpc = _rpc('img_01.tif')
    assert rpc_geom.utm_zone(rpc, 150, 150, 700, 700) == '40S'
