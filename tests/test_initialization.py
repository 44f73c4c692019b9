"""Config-building tests (mirrors /root/reference/tests/initialization_test.py):
which RPC loading path runs, geojson ROI resolution, output CRS derivation."""

import json
import os

import numpy as np
import pytest

from s2p_tpu import pipeline
from s2p_tpu.geo import rpc_from_geotiff, rpc_io

from conftest import data_path


IMG1 = data_path('input_pair/img_01.tif')
IMG2 = data_path('input_pair/img_02.tif')


def _base_cfg(**kw):
    d = {'out_dir': '/tmp/s2p_tpu_test_out',
         'images': [{'img': IMG1}, {'img': IMG2}],
         'roi': {'x': 150, 'y': 150, 'w': 300, 'h': 300}}
    d.update(kw)
    return d


def test_rpc_from_geotiff_tags():
    cfg = pipeline.build_cfg(_base_cfg())
    rpc = cfg.images[0].rpcm
    ref = rpc_from_geotiff(IMG1)
    np.testing.assert_allclose(rpc.col_num, ref.col_num)
    assert rpc.lon_offset == ref.lon_offset


def test_rpc_from_txt_file(tmp_path):
    """An explicit ikonos-style RPC sidecar takes priority over the tags."""
    ref = rpc_from_geotiff(IMG1)
    lines = []
    for key, field in (('LINE_OFF', 'row_offset'), ('SAMP_OFF', 'col_offset'),
                       ('LAT_OFF', 'lat_offset'), ('LONG_OFF', 'lon_offset'),
                       ('HEIGHT_OFF', 'alt_offset'),
                       ('LINE_SCALE', 'row_scale'), ('SAMP_SCALE', 'col_scale'),
                       ('LAT_SCALE', 'lat_scale'), ('LONG_SCALE', 'lon_scale'),
                       ('HEIGHT_SCALE', 'alt_scale')):
        lines.append(f'{key}: {float(getattr(ref, field))!r}')
    for key, field in (('LINE_NUM_COEFF', 'row_num'),
                       ('LINE_DEN_COEFF', 'row_den'),
                       ('SAMP_NUM_COEFF', 'col_num'),
                       ('SAMP_DEN_COEFF', 'col_den')):
        for i, v in enumerate(getattr(ref, field), start=1):
            lines.append(f'{key}_{i}: {float(v)!r}')
    p = tmp_path / 'img_01.rpc'
    p.write_text('\n'.join(lines))

    cfg = pipeline.build_cfg(_base_cfg(
        images=[{'img': IMG1, 'rpc': str(p)}, {'img': IMG2}]))
    got = cfg.images[0].rpcm
    np.testing.assert_allclose(got.col_num, ref.col_num, rtol=1e-12)
    np.testing.assert_allclose(got.lat_offset, ref.lat_offset)


def test_rpc_from_dict():
    ref = rpc_from_geotiff(IMG1)
    cfg = pipeline.build_cfg(_base_cfg(
        images=[{'img': IMG1, 'rpc': ref.to_dict()}, {'img': IMG2}]))
    np.testing.assert_allclose(cfg.images[0].rpcm.row_num, ref.row_num)


def test_roi_geojson():
    """geojson ROI -> exact pixel bbox (reference initialization_test:107-139
    semantics: floor on x/y, ceil on w/h)."""
    poly = {'type': 'Polygon', 'coordinates': [[
        [55.649517, -21.231542], [55.651502, -21.231542],
        [55.651502, -21.229672], [55.649517, -21.229672],
        [55.649517, -21.231542]]]}
    d = _base_cfg(roi_geojson=poly)
    del d['roi']
    cfg = pipeline.build_cfg(d)
    assert cfg.roi == {'x': 271, 'y': 1, 'w': 408, 'h': 414}


def test_out_crs_utm_zone_derived():
    cfg = pipeline.build_cfg(_base_cfg())
    assert cfg.out_crs == 'epsg:32740'
    assert 0.4 < cfg.gsd < 1.0


def test_out_crs_geoid_suffix():
    cfg = pipeline.build_cfg(_base_cfg(out_geoid=True))
    assert cfg.out_crs == 'epsg:32740+5773'


def test_missing_roi_raises():
    d = _base_cfg()
    del d['roi']
    with pytest.raises(ValueError, match='roi'):
        pipeline.build_cfg(d)


def test_missing_images_raises():
    with pytest.raises(ValueError, match='images'):
        pipeline.build_cfg({'roi': {'x': 0, 'y': 0, 'w': 1, 'h': 1}})


def test_rpb_roundtrip(tmp_path):
    ref = rpc_from_geotiff(IMG1)
    body = []
    for key, field in (('lineOffset', 'row_offset'), ('sampOffset', 'col_offset'),
                       ('latOffset', 'lat_offset'), ('longOffset', 'lon_offset'),
                       ('heightOffset', 'alt_offset'),
                       ('lineScale', 'row_scale'), ('sampScale', 'col_scale'),
                       ('latScale', 'lat_scale'), ('longScale', 'lon_scale'),
                       ('heightScale', 'alt_scale')):
        body.append(f'  {key} = {float(getattr(ref, field))!r};')
    for key, field in (('lineNumCoef', 'row_num'), ('lineDenCoef', 'row_den'),
                       ('sampNumCoef', 'col_num'), ('sampDenCoef', 'col_den')):
        coeffs = ',\n    '.join(repr(float(v)) for v in getattr(ref, field))
        body.append(f'  {key} = (\n    {coeffs});')
    p = tmp_path / 'img.rpb'
    p.write_text('BEGIN_GROUP = IMAGE\n' + '\n'.join(body) + '\nEND_GROUP = IMAGE\nEND;\n')
    got = rpc_io.rpc_from_rpc_file(str(p))
    np.testing.assert_allclose(got.col_num, ref.col_num, rtol=1e-12)
    np.testing.assert_allclose(got.row_offset, ref.row_offset)
