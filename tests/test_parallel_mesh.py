"""Multi-device tile mesh tests (virtual 8-device CPU mesh).

The reference has no multi-node testing (SURVEY.md section 4.6); this suite
exercises the sharded execution path the TPU build adds: tile batching,
sharded matching, and the psum-style global reductions.
"""

import numpy as np
import pytest

from s2p_tpu.parallel import TileMesh, batch_tiles, sharded_matching_step
from s2p_tpu.parallel.mesh import global_mean_height_allreduce


def _synthetic_pair(seed, H=64, W=96, d=3):
    rng = np.random.RandomState(seed)
    im1 = rng.rand(H, W).astype(np.float32) * 100
    im2 = np.roll(im1, d, axis=1)
    return im1, im2


def test_mesh_has_8_devices():
    mesh = TileMesh()
    assert mesh.n == 8


def test_batch_tiles_padding():
    imgs = [np.ones((30, 40)), np.ones((25, 45))]
    batch, shapes = batch_tiles(imgs, multiple=16)
    assert batch.shape == (2, 32, 48)
    assert shapes == [(30, 40), (25, 45)]
    assert np.isnan(batch[0, 30:, :]).all()


def test_sharded_matching_matches_single_device():
    mesh = TileMesh()
    pairs = [_synthetic_pair(s) for s in range(mesh.n)]
    a = np.stack([p[0] for p in pairs])
    b = np.stack([p[1] for p in pairs])
    out = sharded_matching_step(mesh, a, b, -2, 5)
    assert out['disp'].shape == a.shape
    # every tile recovers the constant shift d=3
    for k in range(mesh.n):
        inner = out['valid'][k, 8:-8, 8:-8]
        dd = out['disp'][k, 8:-8, 8:-8][inner]
        assert np.isfinite(dd).all()
        assert np.median(np.abs(dd - 3.0)) < 0.3

    # single-device reference result must agree exactly
    from s2p_tpu.ops.sgm import SgmParams, sgm_match
    ref = sgm_match(a[0], b[0], -2, 5, SgmParams())
    np.testing.assert_allclose(np.asarray(ref['disp']), out['disp'][0],
                               equal_nan=True, atol=1e-5)


def test_global_mean_height_allreduce():
    mesh = TileMesh()
    alts = np.random.RandomState(0).rand(mesh.n, 16, 16).astype(np.float32)
    alts[0, :4] = np.nan
    got = global_mean_height_allreduce(mesh, alts)
    assert np.isclose(got, np.nanmean(alts), rtol=1e-5)


def test_driver_dryrun_multichip():
    """The driver's multi-chip dry run (full sharded training-equivalent
    step: SGM + triangulation + psum'ed global stats) compiles and runs on
    the virtual 8-device mesh."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'graft_entry', '/root/repo/__graft_entry__.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_micmac_is_gated():
    from s2p_tpu.config import Config
    from s2p_tpu.core import matching
    cfg = Config(images=(), out_dir='/tmp/x')
    with pytest.raises(NotImplementedError, match='micmac'):
        matching.compute_disparity_map(cfg, np.ones((16, 16)),
                                       np.ones((16, 16)), -2, 2,
                                       algo='micmac')


def test_sharded_dsm_halo_exchange_matches_monolithic():
    """ppermute halo exchange: a mesh-row of tiles rasterized with border
    splat exchange equals the monolithic rasterization of all points."""
    from s2p_tpu.parallel.halo import sharded_dsm
    from s2p_tpu.ops.rasterize import plyflatten

    mesh = TileMesh()
    n, gw, gh, halo, res = mesh.n, 16, 12, 2, 1.0
    yoff = 100.0
    rng = np.random.RandomState(0)
    n_pts = 300
    tile_points = np.zeros((n, n_pts, 3), np.float32)
    tile_valid = np.ones((n, n_pts), bool)
    xoffs = np.array([1000.0 + k * gw * res for k in range(n)], np.float32)
    for k in range(n):
        # points of tile k, spilling laterally by up to `halo` cells
        x = xoffs[k] + rng.uniform(-halo * res, gw * res + halo * res, n_pts)
        x = np.clip(x, 1000.0, 1000.0 + n * gw * res - 1e-3)
        y = yoff - rng.uniform(0, gh * res, n_pts)
        z = rng.uniform(10, 50, n_pts)
        tile_points[k] = np.column_stack([x, y, z])

    yoffs = np.full(n, yoff, np.float32)
    out = sharded_dsm(mesh, tile_points, tile_valid, xoffs, yoffs, res,
                      gw, gh, halo)
    assert out.shape == (n, gh, gw)

    allpts = tile_points.reshape(-1, 3)
    ref = plyflatten(allpts, 1000.0, yoff, res, n * gw, gh, radius=0)[..., 0]
    got = np.concatenate(list(out), axis=1)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
    m = ~np.isnan(ref)
    np.testing.assert_allclose(got[m], ref[m], rtol=1e-5, atol=1e-4)


def test_sharded_dsm_2d_gaussian_matches_plyflatten():
    """2-D tile grid + gaussian radius/sigma splat: the two-phase halo push
    (incl. diagonal corner contributions) must equal the monolithic
    plyflatten of the concatenated cloud (reference 9-neighborhood
    rasterization, __init__.py:461-466)."""
    from s2p_tpu.parallel.halo import sharded_dsm
    from s2p_tpu.ops.rasterize import plyflatten

    mesh = TileMesh()
    n = mesh.n
    nty, ntx = 2, n // 2
    gw, gh, halo, res = 12, 10, 4, 0.5
    radius, sigma = 2, 0.8
    x0, y0 = 5000.0, 200.0
    rng = np.random.RandomState(3)
    n_pts = 250
    tile_points = np.zeros((n, n_pts, 3), np.float32)
    tile_valid = np.ones((n, n_pts), bool)
    xoffs = np.zeros(n, np.float32)
    yoffs = np.zeros(n, np.float32)
    for k in range(n):
        ty, tx = divmod(k, ntx)
        xoffs[k] = x0 + tx * gw * res
        yoffs[k] = y0 - ty * gh * res
        spill = (halo - radius) * res
        x = xoffs[k] + rng.uniform(-spill, gw * res + spill, n_pts)
        y = yoffs[k] - rng.uniform(-spill, gh * res + spill, n_pts)
        x = np.clip(x, x0, x0 + ntx * gw * res - 1e-3)
        y = np.clip(y, y0 - nty * gh * res + 1e-3, y0)
        z = rng.uniform(10, 50, n_pts)
        tile_points[k] = np.column_stack([x, y, z])

    out = sharded_dsm(mesh, tile_points, tile_valid, xoffs, yoffs, res,
                      gw, gh, halo, grid_shape=(nty, ntx),
                      radius=radius, sigma=sigma)

    ref = plyflatten(tile_points.reshape(-1, 3), x0, y0, res,
                     ntx * gw, nty * gh, radius=radius, sigma=sigma)[..., 0]
    got = np.block([[out[ty * ntx + tx] for tx in range(ntx)]
                    for ty in range(nty)])
    np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
    m = ~np.isnan(ref)
    np.testing.assert_allclose(got[m], ref[m], rtol=1e-4, atol=1e-3)


def test_distributed_pointing_fit_matches_lstsq():
    from s2p_tpu.parallel.halo import distributed_pointing_fit

    mesh = TileMesh()
    rng = np.random.RandomState(1)
    n = mesh.n * 4
    centers = rng.uniform(0, 1000, (n, 2))
    M_true = np.array([[1.0, 0.01, 3.0], [-0.02, 0.99, -7.0], [0, 0, 1.0]])
    h = np.column_stack([centers, np.ones(n)])
    corrected = (h @ M_true.T)[:, :2]
    M = distributed_pointing_fit(mesh, centers, corrected)
    np.testing.assert_allclose(M, M_true, rtol=1e-3, atol=1e-3)
