"""TV-L1 optical flow (duality-based, Zach et al. / IPOL tvl1flow).

The reference offers dense disparity via the horizontal component of TV-L1
optical flow (matcher 'tvl1', /root/reference/s2p/block_matching.py:136-139,
binary contract: ``callTVL1.sh im1 im2 disp mask``).  This is the same
primal-dual algorithm expressed as jitted JAX loops: a coarse-to-fine
pyramid, with per-scale warping iterations and an inner primal-dual loop
(fixed iteration counts -- compiler-friendly control flow).

IPOL default parameters: tau=0.25, lambda=0.15, theta=0.3, warps=5,
zfactor=0.5, inner iterations bounded.
"""

from __future__ import annotations

import functools
import math

import numpy as np


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _zoom_out(img, factor=0.5):
    """Anti-aliased downscale by 0.5 (gaussian blur + bilinear)."""
    jax, jnp = _jax()
    from .sift import _gauss_kernel

    sigma = 0.6 * math.sqrt(1.0 / (factor * factor) - 1.0)
    k = jnp.asarray(_gauss_kernel(sigma))
    r = (len(k) - 1) // 2
    p = jnp.pad(img, ((r, r), (0, 0)), mode='edge')
    img = sum(k[i] * p[i:i + img.shape[0], :] for i in range(len(k)))
    p = jnp.pad(img, ((0, 0), (r, r)), mode='edge')
    img = sum(k[i] * p[:, i:i + img.shape[1]] for i in range(len(k)))
    return img[::2, ::2]


def _zoom_in_flow(u, v, shape):
    """Bilinear upsample of a flow field to ``shape`` (values rescaled x2)."""
    jax, jnp = _jax()
    from .interp import bilinear_sample

    h, w = shape
    sh, sw = u.shape
    ys = (jnp.arange(h) + 0.5) * sh / h - 0.5
    xs = (jnp.arange(w) + 0.5) * sw / w - 0.5
    Y, X = jnp.meshgrid(ys, xs, indexing='ij')
    uu = bilinear_sample(u, jnp.clip(X, 0, sw - 1), jnp.clip(Y, 0, sh - 1),
                         fill_value=0.0)
    vv = bilinear_sample(v, jnp.clip(X, 0, sw - 1), jnp.clip(Y, 0, sh - 1),
                         fill_value=0.0)
    return uu * (w / sw), vv * (h / sh)


def _forward_grad(a):
    jax, jnp = _jax()
    gx = jnp.concatenate([a[:, 1:] - a[:, :-1], jnp.zeros_like(a[:, :1])], 1)
    gy = jnp.concatenate([a[1:, :] - a[:-1, :], jnp.zeros_like(a[:1, :])], 0)
    return gx, gy


def _divergence(px, py):
    jax, jnp = _jax()
    dx = jnp.concatenate([px[:, :1], px[:, 1:-1] - px[:, :-2],
                          -px[:, -2:-1]], axis=1)
    dy = jnp.concatenate([py[:1, :], py[1:-1, :] - py[:-2, :],
                          -py[-2:-1, :]], axis=0)
    return dx + dy


@functools.partial(__import__('jax').jit,
                   static_argnames=('warps', 'inner', 'tau', 'lam', 'theta'))
def _tvl1_scale(I0, I1, u, v, warps=5, inner=30, tau=0.25, lam=0.15,
                theta=0.3):
    jax, jnp = _jax()
    from .interp import bilinear_sample

    h, w = I0.shape
    Y, X = jnp.meshgrid(jnp.arange(h, dtype=I0.dtype),
                        jnp.arange(w, dtype=I0.dtype), indexing='ij')
    lt = lam * theta

    def warp_body(_, state):
        u, v, p11, p12, p21, p22 = state
        xw = X + u
        yw = Y + v
        I1w = bilinear_sample(I1, xw, yw, fill_value=0.0)
        I1wx = bilinear_sample(_cdx(I1), xw, yw, fill_value=0.0)
        I1wy = bilinear_sample(_cdy(I1), xw, yw, fill_value=0.0)
        grad2 = I1wx * I1wx + I1wy * I1wy
        rho_c = I1w - I1wx * u - I1wy * v - I0
        u0, v0 = u, v

        def inner_body(_, st):
            u, v, p11, p12, p21, p22 = st
            rho = rho_c + I1wx * u + I1wy * v
            # thresholding step
            d1 = jnp.where(rho < -lt * grad2, lt * I1wx,
                           jnp.where(rho > lt * grad2, -lt * I1wx,
                                     jnp.where(grad2 > 1e-10,
                                               -rho * I1wx / jnp.maximum(grad2, 1e-10),
                                               0.0)))
            d2 = jnp.where(rho < -lt * grad2, lt * I1wy,
                           jnp.where(rho > lt * grad2, -lt * I1wy,
                                     jnp.where(grad2 > 1e-10,
                                               -rho * I1wy / jnp.maximum(grad2, 1e-10),
                                               0.0)))
            vtld1 = u + d1
            vtld2 = v + d2
            u = vtld1 + theta * _divergence(p11, p12)
            v = vtld2 + theta * _divergence(p21, p22)
            ux, uy = _forward_grad(u)
            vx, vy = _forward_grad(v)
            taut = tau / theta
            ng1 = 1.0 + taut * jnp.hypot(ux, uy)
            ng2 = 1.0 + taut * jnp.hypot(vx, vy)
            p11 = (p11 + taut * ux) / ng1
            p12 = (p12 + taut * uy) / ng1
            p21 = (p21 + taut * vx) / ng2
            p22 = (p22 + taut * vy) / ng2
            return u, v, p11, p12, p21, p22

        u, v, p11, p12, p21, p22 = jax.lax.fori_loop(
            0, inner, inner_body, (u0, v0, p11, p12, p21, p22))
        return u, v, p11, p12, p21, p22

    z = jnp.zeros_like(I0)
    state = jax.lax.fori_loop(0, warps, warp_body, (u, v, z, z, z, z))
    return state[0], state[1]


def _cdx(a):
    jax, jnp = _jax()
    out = jnp.zeros_like(a)
    return out.at[:, 1:-1].set(0.5 * (a[:, 2:] - a[:, :-2]))


def _cdy(a):
    jax, jnp = _jax()
    out = jnp.zeros_like(a)
    return out.at[1:-1, :].set(0.5 * (a[2:, :] - a[:-2, :]))


def flow(im1, im2, n_scales=None, warps=5, inner=30):
    """Dense optical flow im1 -> im2 (u, v numpy arrays)."""
    jax, jnp = _jax()

    a = jnp.asarray(np.nan_to_num(np.asarray(im1, np.float32)))
    b = jnp.asarray(np.nan_to_num(np.asarray(im2, np.float32)))
    # normalize intensities jointly to [0, 255] (IPOL preprocessing)
    mn = jnp.minimum(a.min(), b.min())
    mx = jnp.maximum(a.max(), b.max())
    a = 255.0 * (a - mn) / jnp.maximum(mx - mn, 1e-9)
    b = 255.0 * (b - mn) / jnp.maximum(mx - mn, 1e-9)

    if n_scales is None:
        n_scales = max(1, int(math.log2(min(im1.shape) / 16)))

    pyr_a = [a]
    pyr_b = [b]
    for _ in range(n_scales - 1):
        if min(pyr_a[-1].shape) < 32:
            break
        pyr_a.append(_zoom_out(pyr_a[-1]))
        pyr_b.append(_zoom_out(pyr_b[-1]))

    u = jnp.zeros_like(pyr_a[-1])
    v = jnp.zeros_like(pyr_a[-1])
    for s in range(len(pyr_a) - 1, -1, -1):
        u, v = _tvl1_scale(pyr_a[s], pyr_b[s], u, v, warps=warps, inner=inner)
        if s > 0:
            u, v = _zoom_in_flow(u, v, pyr_a[s - 1].shape)
    return np.asarray(u), np.asarray(v)


def disparity(im1, im2):
    """Disparity = horizontal flow; mask = finite inputs and small vertical
    flow (the rectified-geometry consistency check)."""
    u, v = flow(im1, im2)
    valid = (np.isfinite(np.asarray(im1)) & (np.abs(v) <= 1.0))
    disp = np.where(valid, u, np.nan).astype(np.float32)
    return disp, valid
