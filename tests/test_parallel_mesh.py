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
