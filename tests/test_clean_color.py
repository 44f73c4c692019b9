"""Color-path and clean_intermediate end-to-end checks.

A single-tile pair scene with a synthetic 3-band clr GeoTIFF exercises the
multiband color route (warp to the rectified frame -> raw float colors in
the PLY, reference __init__.py:263-284) and the intermediate-file cleanup
contract (reference __init__.py:97,161,192,235,312,383,427: after a clean
run only the final artifacts remain per tile).
"""

import glob
import os

import numpy as np
import pytest

from s2p_tpu import pipeline
from s2p_tpu.geo import geotiff, ply as plymod
from s2p_tpu.utils import exporters

from conftest import data_path


@pytest.fixture(scope='module')
def clean_color_run(tmp_path_factory):
    out = tmp_path_factory.mktemp('e2e_clean_color')
    img1 = data_path('input_pair/img_01.tif')
    base = geotiff.read(img1).astype(np.float32)
    h, w = base.shape
    lo, hi = np.percentile(base, (2, 98))
    g = np.clip(255 * (base - lo) / (hi - lo), 0, 255).astype(np.uint8)
    ramp = np.broadcast_to(
        np.linspace(0, 255, w, dtype=np.float32), (h, w)).astype(np.uint8)
    clr = np.stack([g, (g // 2 + 40).astype(np.uint8), ramp], axis=-1)
    clr_path = os.path.join(out, 'clr.tif')
    geotiff.write(clr_path, clr)

    cfg = pipeline.read_config_file(data_path('input_pair/config.json'))
    cfg['out_dir'] = str(out)
    cfg['roi'] = {'x': 150, 'y': 150, 'w': 250, 'h': 250}
    cfg['clean_intermediate'] = True
    cfg['images'][0]['clr'] = clr_path
    pipeline.main(cfg)
    return cfg, str(out)


@pytest.mark.e2e
def test_clean_intermediate_file_set(clean_color_run):
    """After a clean run only final artifacts remain in the tile dirs."""
    _, out = clean_color_run
    tile_dirs = sorted(glob.glob(os.path.join(out, 'tiles', '*', '*')))
    assert tile_dirs
    gone = ['mask.png', 'height_map.tif',
            os.path.join('pair_1', 'pointing.txt'),
            os.path.join('pair_1', 'sift_matches.txt'),
            os.path.join('pair_1', 'center_keypts_sec.txt'),
            os.path.join('pair_1', 'H_ref.txt'),
            os.path.join('pair_1', 'H_sec.txt'),
            os.path.join('pair_1', 'disp_min_max.txt'),
            os.path.join('pair_1', 'rectified_ref.tif'),
            os.path.join('pair_1', 'rectified_sec.tif'),
            os.path.join('pair_1', 'rectified_disp.tif'),
            os.path.join('pair_1', 'rectified_mask.png')]
    for d in tile_dirs:
        for f in gone:
            assert not os.path.exists(os.path.join(d, f)), (d, f)
        assert os.path.exists(os.path.join(d, 'cloud.ply'))
        assert os.path.exists(os.path.join(d, 'dsm.tif'))
    dsm = geotiff.read_with_nans(os.path.join(out, 'dsm.tif'))
    assert np.isfinite(dsm).sum() > 1000


@pytest.mark.e2e
def test_multiband_clr_colors(clean_color_run, tmp_path):
    """3-band clr colors ride through warp -> PLY -> LAS."""
    _, out = clean_color_run
    cloud = sorted(glob.glob(os.path.join(out, 'tiles', '*', '*',
                                          'cloud.ply')))[0]
    pts, _ = plymod.read_ply(cloud)
    with open(cloud, 'rb') as f:
        header = f.read(2048).split(b'end_header')[0].decode('latin1')
    names = [ln.split()[-1] for ln in header.splitlines()
             if ln.startswith('property')]
    assert {'red', 'green', 'blue'} <= set(names)
    r = pts[:, names.index('red')]
    b = pts[:, names.index('blue')]
    assert len(pts) > 500
    # quintic-spline warp overshoots a few units at edges (same as the
    # reference homography binary's spline interpolation)
    assert np.all((r >= -20) & (r <= 275))
    assert np.mean((r >= 0) & (r <= 255)) > 0.99
    # band 2 is a horizontal ramp: blue must vary across the cloud
    assert b.std() > 10

    las = os.path.join(tmp_path, 'cloud.las')
    exporters.write_las(las, exporters.gather_cloud(out))
    assert os.path.getsize(las) > 26 * len(pts)
