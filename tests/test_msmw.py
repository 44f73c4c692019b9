"""MSMW multiscale multi-window matcher (msmw2 chain semantics,
/root/reference/3rdparty/msmw2/libstereo_newversion/libstereo.cpp)."""

import numpy as np

from s2p_tpu.ops import msmw


def _pair(shift=4, h=160, w=160, seed=0):
    rng = np.random.RandomState(seed)
    xs = np.arange(w)[None, :]
    ys = np.arange(h)[:, None]
    im1 = (rng.rand(h, w) * 50 + np.sin(xs / 5.0) * 30
           + np.cos(ys / 7.0) * 20).astype(np.float32)
    im2 = np.roll(im1, shift, axis=1) + 0.2 * rng.rand(h, w).astype(np.float32)
    return im1, im2


def test_recovers_constant_shift():
    im1, im2 = _pair(shift=4)
    d, ok = msmw.disparity(im1, im2, -12, 12)
    good = ok & np.isfinite(d)
    assert good.mean() > 0.8
    assert abs(np.median(d[good]) - 4.0) < 0.25


def test_multiscale_range_restriction_used():
    """The pyramid restricts fine-level ranges from the coarse accepted
    disparities; a wide global range must still resolve correctly."""
    im1, im2 = _pair(shift=-6)
    d, ok = msmw.disparity(im1, im2, -40, 40, n_scales=3)
    good = ok & np.isfinite(d)
    assert good.mean() > 0.5
    assert abs(np.median(d[good]) + 6.0) < 0.3


def test_self_similarity_rejects_periodic_texture():
    """A strobe-ambiguous (periodic) stripe pattern must be heavily
    rejected by the self-similarity test (libstereo.h:262)."""
    h, w = 128, 128
    xs = np.arange(w)[None, :]
    periodic = np.broadcast_to(100 + 50 * np.sin(xs * (2 * np.pi / 8.0)),
                               (h, w)).astype(np.float32)
    rng = np.random.RandomState(1)
    im1 = periodic + 0.1 * rng.rand(h, w).astype(np.float32)
    im2 = np.roll(im1, 3, axis=1)
    d, ok = msmw.disparity(im1, im2, -12, 12, n_scales=1)
    assert ok.mean() < 0.35


def test_grain_filter_removes_small_islands():
    ok = np.zeros((60, 60), bool)
    ok[5:8, 5:8] = True          # 9 px island
    ok[20:50, 20:50] = True      # 900 px region
    out = msmw._grain_filter(ok, 25)
    assert not out[6, 6]
    assert out[30, 30]
