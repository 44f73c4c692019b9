"""Batched (vmapped) stage-4 matcher: per-tile traced disparity bases must
reproduce the static single-tile path exactly, and the batch axis must
shard over the device mesh (the mesh-as-execution-engine contract,
SURVEY.md section 2.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2p_tpu.ops.sgm import SgmParams, match_pair, sgm_match_batch


def _pair(seed=0, h=128, w=128, shift=3):
    rng = np.random.RandomState(seed)
    im1 = rng.rand(h, w).astype(np.float32) * 100
    im2 = np.roll(im1, shift, axis=1) + 0.5 * rng.rand(h, w).astype(np.float32)
    return im1, im2


_PARAMS = SgmParams(mgm=False, p1=12.0, p2=48.0, p2_edge_scale=0.5,
                    lr_tau=1.0, median_first=True, median_fill=True,
                    backend='lax')


def test_batch_matches_static_path():
    im1, im2 = _pair()
    d_ref, v_ref, _ = match_pair(im1, im2, -16, 15, _PARAMS)
    out = sgm_match_batch(jnp.stack([im1, im1]), jnp.stack([im2, im2]),
                          jnp.array([-16, -16]), 32, _PARAMS)
    d = np.asarray(out['disp'][0])
    assert (np.isfinite(d) == np.isfinite(d_ref)).all()
    both = np.isfinite(d) & np.isfinite(d_ref)
    np.testing.assert_allclose(d[both], d_ref[both], atol=1e-5)


def test_batch_per_tile_bases_are_independent():
    """Tiles with different disparity bases in one batch agree where the
    ranges both cover the truth."""
    im1, im2 = _pair()
    out = sgm_match_batch(jnp.stack([im1, im1]), jnp.stack([im2, im2]),
                          jnp.array([-16, -24]), 48, _PARAMS)
    da = np.asarray(out['disp'][0])
    db = np.asarray(out['disp'][1])
    both = np.isfinite(da) & np.isfinite(db)
    assert both.sum() > 1000
    assert np.nanmedian(np.abs(da[both] - db[both])) < 1e-5


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs the 8-device mesh')
def test_batch_sharded_over_mesh():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from s2p_tpu.parallel.mesh import TileMesh

    im1, im2 = _pair(h=64, w=64)
    n = 8
    b1 = jnp.stack([im1] * n)
    b2 = jnp.stack([im2] * n)
    dmins = jnp.full((n,), -16, jnp.int32)
    ref = sgm_match_batch(b1, b2, dmins, 32, _PARAMS)

    mesh = TileMesh()
    shard = mesh.shard()
    b1s = jax.device_put(b1, shard)
    b2s = jax.device_put(b2, shard)
    dm_s = jax.device_put(dmins, NamedSharding(mesh.mesh, P(mesh.axis)))
    out = sgm_match_batch(b1s, b2s, dm_s, 32, _PARAMS)
    # the result is sharded along the batch axis and numerically identical
    np.testing.assert_allclose(np.nan_to_num(np.asarray(out['disp'])),
                               np.nan_to_num(np.asarray(ref['disp'])),
                               atol=1e-5)
    assert len(out['disp'].sharding.device_set) == 8


def test_disp_to_xyz_batch_equals_single():
    """The batched stage-5 kernel must reproduce the single-tile path on
    the reference triangulation fixture."""
    import os
    import shutil
    from conftest import data_path
    from s2p_tpu.core import triangulation as tri
    from s2p_tpu.geo import geotiff, rpc_io

    fx = data_path('input_triangulation')
    H1 = np.loadtxt(os.path.join(fx, 'pair_1', 'H_ref.txt'))
    H2 = np.loadtxt(os.path.join(fx, 'pair_1', 'H_sec.txt'))
    A = np.loadtxt(os.path.join(fx, 'global_pointing_pair_1.txt'))
    disp = geotiff.read_with_nans(os.path.join(fx, 'pair_1',
                                               'rectified_disp.tif'))
    mask = geotiff.read_png(os.path.join(fx, 'pair_1',
                                         'rectified_mask.png'))
    rpc1 = rpc_io.rpc_from_geotiff(data_path('input_pair/img_01.tif'))
    rpc2 = rpc_io.rpc_from_geotiff(data_path('input_pair/img_02.tif'))
    morig = np.ones((350, 350), np.uint8)
    bbx = (500, 850, 150, 500)

    xyz1, err1 = tri.disp_to_xyz(rpc1, rpc2, H1, H2, disp, mask,
                                 img_bbx=bbx, mask_orig=morig, A=A,
                                 out_crs='epsg:32740')
    job = dict(rpc1=rpc1, rpc2=rpc2, H1=H1, H2=H2, disp=disp,
               mask_rect=mask, img_bbx=bbx, mask_orig=morig, A=A)
    (xyz2, err2), (xyz3, _) = tri.disp_to_xyz_batch([job, dict(job)],
                                                    out_crs='epsg:32740')
    np.testing.assert_allclose(np.nan_to_num(xyz1), np.nan_to_num(xyz2),
                               atol=1e-6)
    np.testing.assert_allclose(np.nan_to_num(xyz2), np.nan_to_num(xyz3),
                               atol=0)
