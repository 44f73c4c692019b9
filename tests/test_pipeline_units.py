"""Stage-level pipeline tests with the pre-baked triangulation fixture
(mirrors /root/reference/tests/triangulation_test.py and
rasterization_test.py) plus config / tiling / fusion units."""

import os
import shutil

import numpy as np
import pytest

from s2p_tpu import pipeline, tiling
from s2p_tpu.config import Config
from s2p_tpu.core import fusion
from s2p_tpu.geo import geotiff, ply
from s2p_tpu.ops import rasterize

from conftest import data_path


@pytest.mark.parametrize('out_crs', [None, 'epsg:32740', 'epsg:32740+5773'])
def test_disparity_to_ply_fixture(tmp_path, out_crs):
    """disparity_to_ply on the reference's pre-baked tile fixture."""
    tile_dir = str(tmp_path / 'tile_dir')
    shutil.copytree(data_path('input_triangulation'), tile_dir)
    # the fixture stores global_pointing at the tile level; the pipeline
    # reads it from out_dir
    cfg_dict = pipeline.read_config_file(data_path('input_pair/config.json'))
    cfg_dict['out_dir'] = str(tmp_path)
    if out_crs:
        cfg_dict['out_crs'] = out_crs
    cfg = pipeline.build_cfg(cfg_dict)
    shutil.copy(os.path.join(tile_dir, 'global_pointing_pair_1.txt'),
                os.path.join(str(tmp_path), 'global_pointing_pair_1.txt'))
    # the fixture has no tile mask.png; build a permissive one
    disp = geotiff.read(os.path.join(tile_dir, 'pair_1', 'rectified_disp.tif'))
    geotiff.write_png(os.path.join(tile_dir, 'mask.png'),
                      np.ones((350, 350), np.uint8))

    tile = {'coordinates': [500, 150, 350, 350], 'dir': tile_dir,
            'neighborhood_dirs': ['.']}
    pipeline.disparity_to_ply(cfg, tile)

    pts, comments = ply.read_ply(os.path.join(tile_dir, 'cloud.ply'))
    expected_crs = out_crs or 'epsg:32740'
    assert comments[-1] == 'projection: CRS {}'.format(expected_crs)
    assert len(pts) > 10000
    # easting/northing must fall in the UTM 40S La Reunion neighborhood
    assert 300000 < np.nanmedian(pts[:, 0]) < 400000
    assert 7.6e6 < np.nanmedian(pts[:, 1]) < 7.7e6


def test_plyflatten_golden():
    """Rasterization against the reference golden (rasterization_test.py)."""
    raster, profile = rasterize.plyflatten_from_plyfiles_list(
        [data_path('input_ply/cloud.ply')], resolution=0.4)
    test_raster = raster[:, :, 0]
    exp = geotiff.read(data_path('expected_output/plyflatten/dsm_40cm.tiff'))
    eprof = geotiff.read_profile(
        data_path('expected_output/plyflatten/dsm_40cm.tiff'))
    assert test_raster.shape == exp.shape
    both = np.isfinite(test_raster) & np.isfinite(exp)
    assert (np.isfinite(test_raster) == np.isfinite(exp)).all()
    # identical up to the reference library's float32 accumulation
    assert np.nanmean(np.abs(test_raster - exp)[both]) < 1e-3
    np.testing.assert_allclose(profile.transform, eprof.transform)


def test_adjust_tile_size():
    cfg = Config(roi={'x': 150, 'y': 150, 'w': 700, 'h': 700}, tile_size=300)
    tw, th = tiling.adjust_tile_size(cfg)
    assert (tw, th) == (350, 350)


def test_tiles_coordinates_and_neighborhoods():
    coords, neigh = tiling.compute_tiles_coordinates(0, 0, 700, 700, 350, 350)
    assert len(coords) == 4
    # every tile sees all 4 tiles in its 3x3 neighborhood (2x2 grid)
    for c in coords:
        assert len(neigh[str(c)]) == 4


def test_fusion_average_if_close():
    a = np.full((4, 4), 10.0)
    b = np.full((4, 4), 10.5)
    b[0, 0] = 20.0   # spread too large at this pixel
    out = fusion.merge_n_arrays([a, b], [0.0, 0.0], 'average_if_close',
                                threshold=1.0)
    assert np.isnan(out[0, 0])
    assert np.allclose(out[1:, :], 10.25)


def test_fusion_debug_saves_registered_maps(tmp_path):
    """Debug-mode fusion saves the offset-registered per-pair height maps
    next to the inputs (reference fusion.py:50-52)."""
    from s2p_tpu import pipeline
    from s2p_tpu.geo import geotiff

    tile_dir = tmp_path / 'tile'
    for i, (val, off) in enumerate([(10.0, 2.0), (11.0, 4.0)]):
        d = tile_dir / f'pair_{i + 1}'
        d.mkdir(parents=True)
        geotiff.write(str(d / 'height_map.tif'),
                      np.full((6, 8), val, np.float32))
        np.savetxt(str(tmp_path / f'global_mean_height_pair_{i + 1}.txt'),
                   [off])
    cfg = Config(out_dir=str(tmp_path), debug=True, cargarse_basura=False,
                 images=[{'img': 'a.tif'}, {'img': 'b.tif'},
                         {'img': 'c.tif'}])
    pipeline.heights_fusion(cfg, {'dir': str(tile_dir)})
    for i, (val, off) in enumerate([(10.0, 2.0), (11.0, 4.0)]):
        p = tile_dir / f'pair_{i + 1}' / 'height_map_registered.tif'
        assert p.exists()
        reg = geotiff.read(str(p))
        assert np.allclose(reg, val - off + 3.0)   # mean(offsets) = 3
    assert (tile_dir / 'height_map.tif').exists()


def test_config_roundtrip(tmp_path):
    cfg = Config(tile_size=512, filtering_3d_r=5.0)
    p = str(tmp_path / 'c.json')
    cfg.dump_json(p)
    import json
    d = json.load(open(p))
    assert d['tile_size'] == 512
    assert d['3d_filtering_r'] == 5.0  # alias restored in JSON
    cfg2 = Config.from_user_dict(d)
    assert cfg2.filtering_3d_r == 5.0


def test_unknown_config_key_warns():
    with pytest.warns(UserWarning, match='unknown parameter'):
        Config.from_user_dict({'definitely_not_a_key': 1})


def test_max_disparity_range_error_from_cfg():
    from s2p_tpu.core import matching
    cfg = Config(max_disp_range=4)
    im = np.random.rand(32, 64).astype(np.float32)
    with pytest.raises(matching.MaxDisparityRangeError):
        matching.compute_disparity_map(cfg, im, im, -10, 10)


def test_debug_plot_matches_writes_png(tmp_path, ref_data):
    """Debug-mode SIFT match visualisation (reference __init__.py:78-82)."""
    from s2p_tpu.core import visualisation
    from s2p_tpu.geo import geotiff, rpc_io

    p1 = ref_data('input_pair/img_01.tif')
    p2 = ref_data('input_pair/img_02.tif')
    im1 = geotiff.read(p1).astype(np.float32)
    im2 = geotiff.read(p2).astype(np.float32)
    rpc1 = rpc_io.rpc_from_geotiff(p1)
    rpc2 = rpc_io.rpc_from_geotiff(p2)
    m = np.array([[200.0, 200.0, 205.0, 201.0],
                  [400.0, 380.0, 404.0, 382.0]])
    out = tmp_path / 'sift_matches_pointing.png'
    visualisation.plot_matches(im1, im2, rpc1, rpc2, m, str(out),
                               150, 150, 300, 300)
    assert out.exists() and out.stat().st_size > 0


def _fake_tile_pair(tmp_path, h=48, w=64, dmin=-4, dmax=4):
    rng = np.random.RandomState(0)
    tdir = tmp_path / 'tiles' / 'row_0' / 'col_0'
    pdir = tdir / 'pair_1'
    pdir.mkdir(parents=True)
    from s2p_tpu.geo import geotiff
    im2 = (rng.rand(h, w) * 200).astype(np.float32)
    im1 = np.roll(im2, 2, axis=1)
    geotiff.write(str(pdir / 'rectified_ref.tif'), im1)
    geotiff.write(str(pdir / 'rectified_sec.tif'), im2)
    np.savetxt(str(pdir / 'disp_min_max.txt'), [dmin, dmax])
    return {'dir': str(tdir), 'coordinates': (0, 0, w, h)}


@pytest.mark.parametrize('algo,erosion', [('mgm', 0), ('mgm', 2),
                                          ('mgm_multi', 2)])
def test_stage4_always_takes_batched_path(tmp_path, monkeypatch, algo,
                                          erosion):
    """Default configs (msk_erosion=2) and mgm_multi must drive stage 4
    through the batched engine -- never silently fall back to the serial
    per-tile path (round-2 verdict finding)."""
    from s2p_tpu import pipeline
    from s2p_tpu.config import Config
    from s2p_tpu.ops import mgm_flow

    tile = _fake_tile_pair(tmp_path)
    cfg = Config(roi={'x': 0, 'y': 0, 'w': 64, 'h': 48},
                 matching_algorithm=algo, msk_erosion=erosion)
    calls = {'batch': 0, 'serial': 0}
    orig_b = mgm_flow.mgm_binary_match_batch
    orig_m = mgm_flow.mgm_multi_match_batch

    def count_b(*a, **k):
        calls['batch'] += 1
        return orig_b(*a, **k)

    def count_m(*a, **k):
        calls['batch'] += 1
        return orig_m(*a, **k)

    monkeypatch.setattr(pipeline, 'stereo_matching',
                        lambda *a, **k: calls.__setitem__(
                            'serial', calls['serial'] + 1))
    import s2p_tpu.ops.mgm_flow as mf_mod
    monkeypatch.setattr(mf_mod, 'mgm_binary_match_batch', count_b)
    monkeypatch.setattr(mf_mod, 'mgm_multi_match_batch', count_m)
    pipeline.stereo_matching_all(cfg, [(tile, 1)])
    assert calls['batch'] == 1 and calls['serial'] == 0
    import os
    assert os.path.exists(os.path.join(tile['dir'], 'pair_1',
                                       'rectified_disp.tif'))


def test_count_3d_neighbors_batch_bitwise():
    """The one-dispatch batched neighbor count equals per-tile counts
    (stage-5 finish contract)."""
    from s2p_tpu.ops.filtering import (count_3d_neighbors,
                                       count_3d_neighbors_batch)
    rng = np.random.default_rng(0)
    tiles = []
    for shape in [(60, 70), (55, 70), (60, 64)]:
        a = rng.uniform(0, 30, (*shape, 3)).astype(np.float64)
        a[rng.random(shape) < 0.1] = np.nan
        tiles.append(a)
    single = [count_3d_neighbors(t, 5.0, 3) for t in tiles]
    batch = count_3d_neighbors_batch(tiles, 5.0, 3)
    for s, b in zip(single, batch):
        assert np.array_equal(s, b)
