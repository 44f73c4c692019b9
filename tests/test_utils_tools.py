"""Smoke/contract tests for the utils layer (reference utils/ parity:
mosaic, tile maps, exporters, scaling, NITF RPC extraction)."""

import json
import os

import numpy as np
import pytest

from conftest import data_path


@pytest.fixture
def mini_run(tmp_path):
    """A minimal fake run directory: 2x1 tile grid with clouds + rasters."""
    from s2p_tpu.geo import ply as plymod
    from s2p_tpu.geo import geotiff
    from s2p_tpu.geo.geotiff import Profile

    tiles = []
    for k in range(2):
        d = tmp_path / 'tiles' / 'row_0' / f'col_{k}'
        (d / 'pair_1').mkdir(parents=True)
        roi = {'x': 10 + 20 * k, 'y': 5, 'w': 20, 'h': 15}
        cfgp = d / 'config.json'
        cfgp.write_text(json.dumps({
            'roi': roi, 'tile': {'coordinates': [roi['x'], roi['y'],
                                                 roi['w'], roi['h']]}}))
        rng = np.random.RandomState(k)
        pts = np.column_stack([rng.uniform(0, 50, 40),
                               rng.uniform(0, 50, 40),
                               rng.uniform(10, 20, 40),
                               rng.randint(0, 255, (40, 3))])
        plymod.write_ply(str(d / 'cloud.ply'), pts[:, :3],
                         colors=pts[:, 3:6].astype(np.uint8),
                         comments=['projection: UTM 40S'])
        img = np.full((15, 20), float(k), np.float32)
        prof = Profile(width=20, height=15,
                       transform=(1.0, 0.0, 10.0 + 20 * k,
                                  0.0, -1.0, 5.0), crs=None)
        geotiff.write(str(d / 'pair_1' / 'height_map.tif'), img,
                      profile=prof)
        tiles.append(str(cfgp))
    tf = tmp_path / 'tiles.txt'
    tf.write_text('\n'.join(os.path.relpath(t, tmp_path) for t in tiles)
                  + '\n')
    return tmp_path


def test_mosaic_tool(mini_run):
    from s2p_tpu.utils import mosaic
    from s2p_tpu.geo import geotiff
    out = str(mini_run / 'mosaic.tif')
    mosaic.main(str(mini_run / 'tiles.txt'), out, 'pair_1/height_map.tif')
    m = geotiff.read(out)
    assert m.shape == (15, 40)
    assert (m[:, :20] == 0).all() and (m[:, 20:] == 1).all()


def test_svg_tilemap(mini_run):
    from s2p_tpu.utils.tilemap import svg_tilemap
    out = str(mini_run / 'map.svg')
    svg_tilemap(str(mini_run / 'tiles.txt'), out)
    s = open(out).read()
    assert s.startswith('<svg') and s.count('<rect') == 2


def test_gather_cloud_and_las(mini_run, tmp_path):
    from s2p_tpu.utils.exporters import gather_cloud, write_las
    pts = gather_cloud(str(mini_run))
    assert pts.shape == (80, 6)
    las = str(tmp_path / 'cloud.las')
    write_las(las, pts)
    raw = open(las, 'rb').read()
    assert raw[:4] == b'LASF'
    n = int.from_bytes(raw[107:111], 'little')
    assert n == 80


def test_scale_rpc_consistency():
    from s2p_tpu.utils.scale import scale_rpc
    from s2p_tpu.geo import rpc_io
    rpc = rpc_io.rpc_from_geotiff(data_path('input_pair/img_01.tif'))
    z = 0.5
    r2 = scale_rpc(rpc, z)
    lon, lat = rpc.localization(300.0, 200.0, 100.0)
    c2, r2_ = r2.projection(lon, lat, 100.0)
    assert c2 == pytest.approx(300.0 * z, abs=1e-3)
    assert r2_ == pytest.approx(200.0 * z, abs=1e-3)
