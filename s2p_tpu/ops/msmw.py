"""Multi-Scale Multi-Window correlation stereo (msmw family).

Faithful structure of the reference's vendored msmw2
(/root/reference/3rdparty/msmw2/libstereo_newversion/libstereo.cpp, invoked
by s2p as ``iip_stereo_correlation_multi_win2 -i 1 -n 4 -p 4 -W 5 -x 9 -y 9
-r 1 -d 1 ... -m dmin -M dmax``, block_matching.py:141-153):

  * **multiscale chain** (``stereo_pixel_multiscale_chain_recursive``,
    libstereo.cpp:553-660): a 4-level recursion; each level subsamples the
    images by 2 (gaussian 0.8 prefilter), solves the coarser level first,
    then upsamples the accepted disparity RANGE maps (x2, -/+2 margin,
    clamped to the global range) so the finer level searches a per-pixel
    restricted interval (``update_dmin_dmax``, :1794-1850);
  * **per-scale dual correlation** (``stereo_pixel_chain``, :1558-1780):
    both directions (left and right as reference) over a battery of
    oriented correlation windows (9x9 flat + horizontal/vertical/diagonal
    elongated shapes, 5 orientations for ``-W 5``); the per-pixel cost is
    the mean-removed SSD (``itypeDist=1``) of the best window;
  * **validity battery** applied in the reference's order: min-dist test
    (best distance below threshold), self-similarity / strobe test (the
    reference image must not match ITSELF at a disparity offset better
    than it matches the secondary, :262), pixelian reciprocity
    (``stereo_check_pixelian_reciprocity``, threshold 1 px), and the grain
    filter (connected components of the validity mask below a minimum
    area, scaled per level);
  * subpixel by local parabola refinement of the distance samples -- a
    documented variant of the reference's discrete quarter-pixel search
    (``inPrecisions=4`` with cubic image interpolation).

All per-scale work is one jitted array program (box-filter cost volumes,
window minima, dual-volume reciprocity); the scale recursion is a host
loop over compiled levels.
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


def _shear(a, direction):
    """Diagonal shear: roll row y by +-(y - h//2) columns, so a box filter
    over the sheared array averages along a diagonal window.  Implemented
    as one vectorized gather (a per-row roll loop would explode the
    compiled graph)."""
    import jax.numpy as jnp
    h, w = a.shape[-2], a.shape[-1]
    shifts = (jnp.arange(h) - h // 2) * direction
    cols = (jnp.arange(w)[None, :] - shifts[:, None]) % w
    return jnp.take_along_axis(a, jnp.broadcast_to(cols, a.shape), axis=-1)


# (kind, ry, rx): oriented 9x9-family windows (the -W 5 orientation set)
_WINDOWS_5 = (('box', 4, 4), ('box', 1, 4), ('box', 4, 1),
              ('diag+', 1, 4), ('diag-', 1, 4))


def _window_costs(a, b_sh, fin_pair):
    """Per-window mean-removed SSD distances, min over the window set.

    a: (h, w); b_sh: (h, w, D) gathered secondary; fin_pair: (h, w, D) both
    finite.  Returns (best cost (h, w, D), center 9x9 variance of a).
    """
    import jax.numpy as jnp

    d2 = (a[:, :, None] - b_sh) ** 2
    d1 = a[:, :, None] - b_sh
    d2 = jnp.where(fin_pair, d2, 0.0)
    d1 = jnp.where(fin_pair, d1, 0.0)
    cnt = fin_pair.astype(a.dtype)

    d2 = jnp.moveaxis(d2, -1, 0)          # (D, h, w)
    d1 = jnp.moveaxis(d1, -1, 0)
    cnt = jnp.moveaxis(cnt, -1, 0)

    best = None
    var9 = None
    for kind, ry, rx in _WINDOWS_5:
        if kind == 'box':
            m2 = _box(d2, ry, rx)
            m1 = _box(d1, ry, rx)
            mc = _box(cnt, ry, rx)
        else:
            sgn = 1 if kind == 'diag+' else -1
            m2 = _shear(_box(_shear(d2, sgn), ry, rx), -sgn)
            m1 = _shear(_box(_shear(d1, sgn), ry, rx), -sgn)
            mc = _shear(_box(_shear(cnt, sgn), ry, rx), -sgn)
        mc = jnp.maximum(mc, 1e-6)
        # mean-removed SSD: E[(d - E d)^2] = E[d^2] - (E d)^2 (itypeDist 1)
        cost = m2 / mc - (m1 / mc) ** 2
        best = cost if best is None else jnp.minimum(best, cost)
        if (kind, ry, rx) == ('box', 4, 4):
            ma = _box(a, 4, 4)
            var9 = _box(a * a, 4, 4) - ma * ma
    return jnp.moveaxis(best, 0, -1), var9


def _wta_subpix(cost, disp_min):
    import jax.numpy as jnp

    D = cost.shape[-1]
    k = jnp.argmin(cost, axis=-1)
    c1 = jnp.take_along_axis(cost, k[..., None], -1)[..., 0]
    c0 = jnp.take_along_axis(cost, jnp.maximum(k - 1, 0)[..., None], -1)[..., 0]
    c2 = jnp.take_along_axis(cost, jnp.minimum(k + 1, D - 1)[..., None], -1)[..., 0]
    c0 = jnp.where(jnp.isfinite(c0), c0, c1 + 1e3)
    c2 = jnp.where(jnp.isfinite(c2), c2, c1 + 1e3)
    den = c0 - 2 * c1 + c2
    off = jnp.where((k > 0) & (k < D - 1) & (den > 1e-12),
                    0.5 * (c0 - c2) / jnp.maximum(den, 1e-12), 0.0)
    return disp_min + k + jnp.clip(off, -0.5, 0.5), c1, k


@functools.partial(__import__('jax').jit,
                   static_argnames=('disp_min', 'D', 'self_sim', 'min_dist'))
def _scale_step(im1, im2, dmin_map, dmax_map, idmin_map, idmax_map,
                disp_min: int, D: int, self_sim: bool = True,
                min_dist: float = -1.0):
    """One msmw2 level: dual-direction multi-window correlation + the
    validity battery.  Returns (dL, dR, okL, okR)."""
    import jax.numpy as jnp

    a = jnp.nan_to_num(im1)
    b = jnp.nan_to_num(im2)
    fin1 = jnp.isfinite(im1)
    fin2 = jnp.isfinite(im2)
    h, w = a.shape
    w2 = im2.shape[1]
    ks = jnp.arange(D)

    def direction(src, dst, fin_s, fin_d, lo_map, hi_map, dmin_dir):
        xs = jnp.arange(src.shape[1])[:, None] + dmin_dir + ks[None, :]
        inb = (xs >= 0) & (xs < dst.shape[1])
        xs_c = jnp.clip(xs, 0, dst.shape[1] - 1)
        d_sh = dst[:, xs_c]
        fin_pair = fin_s[:, :, None] & fin_d[:, xs_c] & inb[None]
        # per-pixel range restriction from the coarser level
        dvals = (dmin_dir + ks)[None, None, :]
        in_rng = (dvals >= lo_map[:, :, None]) & (dvals <= hi_map[:, :, None])
        cost, var9 = _window_costs(src, d_sh, fin_pair & in_rng)
        cost = jnp.where(fin_pair & in_rng, cost, jnp.inf)
        disp, cbest, kint = _wta_subpix(cost, dmin_dir)
        ok = fin_s & jnp.isfinite(cbest)
        if min_dist > 0:
            ok = ok & (cbest <= min_dist * jnp.maximum(var9, 1e-12))
        if self_sim:
            # strobe / self-similarity test (libstereo.cpp:1655 +
            # stereo_check_strobe_and_self_simililarity_effect): the best
            # SELF-match of the reference image over a centered range with
            # |offset| >= 2 px must exceed the cross-match distance by more
            # than the sub-pixel translation noise floor fDistTrans
            # (distance of the image vs itself shifted +-1/(2*precisions)).
            offs = ks - D // 2
            xs_s = jnp.arange(src.shape[1])[:, None] + offs[None, :]
            inb_s = (xs_s >= 0) & (xs_s < src.shape[1])
            s_sh = src[:, jnp.clip(xs_s, 0, src.shape[1] - 1)]
            far = (jnp.abs(offs) >= 2)[None, None, :]
            fp = fin_s[:, :, None] & inb_s[None] & far
            scost, _ = _window_costs(src, s_sh, fp)
            scost = jnp.where(fp, scost, jnp.inf)
            smin = jnp.min(scost, axis=-1)
            # fDistTrans: +-0.125 px horizontal shift (linear interp)
            f = 0.125
            nxt = jnp.concatenate([src[:, 1:], src[:, -1:]], axis=1)
            prv = jnp.concatenate([src[:, :1], src[:, :-1]], axis=1)
            tp = (1 - f) * src + f * nxt
            tm = (1 - f) * src + f * prv
            ones = fin_s[:, :, None]
            ctp, _ = _window_costs(src, tp[:, :, None], ones)
            ctm, _ = _window_costs(src, tm[:, :, None], ones)
            ftrans = jnp.maximum(ctp[..., 0], ctm[..., 0])
            ok = ok & ((smin - cbest) > ftrans)
        return disp, ok

    dL, okL = direction(a, b, fin1, fin2, dmin_map, dmax_map, disp_min)
    dR, okR = direction(b, a, fin2, fin1, idmin_map, idmax_map,
                        -(disp_min + D - 1))

    # pixelian reciprocity (stereo_check_pixelian_reciprocity, tau = 1 px)
    x2 = jnp.clip(jnp.round(jnp.arange(w)[None, :] + dL).astype(jnp.int32),
                  0, w2 - 1)
    dR_at = jnp.take_along_axis(dR, x2, axis=1)
    okR_at = jnp.take_along_axis(okR, x2, axis=1)
    okL = okL & okR_at & (jnp.abs(dL + dR_at) <= 1.0)
    x1 = jnp.clip(jnp.round(jnp.arange(w2)[None, :] + dR).astype(jnp.int32),
                  0, w - 1)
    dL_at = jnp.take_along_axis(dL, x1, axis=1)
    okL_at = jnp.take_along_axis(okL, x1, axis=1)
    okR = okR & okL_at & (jnp.abs(dR + dL_at) <= 1.0)
    return dL, dR, okL, okR


def _downsample2(img):
    """Gaussian(0.8) prefilter + factor-2 subsampling (cflimage::subSample)."""
    from scipy import ndimage
    src = np.nan_to_num(img).astype(np.float32)
    blur = ndimage.gaussian_filter(src, 0.8, mode='nearest')
    nanm = ~np.isfinite(img)
    out = blur[::2, ::2].copy()
    if nanm.any():
        out[nanm[::2, ::2]] = np.nan
    return out


def _update_range_maps(disp, ok, lo_glob, hi_glob, radius=4, margin=2):
    """Per-pixel accepted-range maps from a level's output
    (update_dmin_dmax, libstereo.cpp:1794): local window min/max of the
    accepted disparities, +- margin, clamped to the global bounds."""
    from scipy import ndimage
    d = np.where(ok, disp, np.nan)
    size = 2 * radius + 1
    with np.errstate(invalid='ignore'):
        lo = ndimage.minimum_filter(np.nan_to_num(d, nan=+1e9), size=size)
        hi = ndimage.maximum_filter(np.nan_to_num(d, nan=-1e9), size=size)
    none = lo > 1e8
    lo = np.where(none, lo_glob, lo - margin)
    hi = np.where(none, hi_glob, hi + margin)
    return (np.clip(lo, lo_glob, hi_glob).astype(np.float32),
            np.clip(hi, lo_glob, hi_glob).astype(np.float32))


def _upsample_range(lo, hi, shape, lo_glob, hi_glob):
    """Range maps to the next finer level: x2 in value, -/+2 margin
    (libstereo.cpp:600-607), nearest-neighbor upsample, global clamp."""
    from scipy import ndimage
    zoom = (shape[0] / lo.shape[0], shape[1] / lo.shape[1])
    lo_u = ndimage.zoom(lo, zoom, order=0) * 2.0 - 2.0
    hi_u = ndimage.zoom(hi, zoom, order=0) * 2.0 + 2.0
    return (np.clip(lo_u, lo_glob, hi_glob).astype(np.float32),
            np.clip(hi_u, lo_glob, hi_glob).astype(np.float32))


def _grain_filter(ok, min_area):
    """Reject connected components of the valid mask below min_area
    (stereo_grain_filter; area scaled per level like
    set_strParameters_for_current_scale)."""
    if min_area <= 1:
        return ok
    from scipy import ndimage
    lab, n = ndimage.label(ok)
    if n == 0:
        return ok
    areas = np.bincount(lab.ravel())
    keep = areas >= min_area
    keep[0] = False
    return keep[lab]


def disparity(im1, im2, disp_min, disp_max, n_scales=4, grain_area=25,
              min_dist=-1.0):
    """MSMW disparity of a rectified pair; returns (disp, valid).

    Args:
        n_scales: pyramid depth (the reference's ``-n 4``).
        grain_area: minimum connected-component area of the valid mask at
            the finest level (halved per level, msmw2 scale rule).
        min_dist: optional distance-vs-variance acceptance threshold
            (``-d``); <= 0 disables.
    """
    import jax.numpy as jnp

    im1 = np.asarray(im1, np.float32)
    im2 = np.asarray(im2, np.float32)
    disp_min = int(np.floor(disp_min))
    disp_max = int(np.ceil(disp_max))

    # build the pyramid (finest first)
    pyr1, pyr2 = [im1], [im2]
    for _ in range(n_scales - 1):
        if min(pyr1[-1].shape) < 32 or min(pyr2[-1].shape) < 32:
            break
        pyr1.append(_downsample2(pyr1[-1]))
        pyr2.append(_downsample2(pyr2[-1]))
    levels = len(pyr1)

    lo = hi = ilo = ihi = None
    dL = okL = None
    for lev in range(levels - 1, -1, -1):
        s = 2.0 ** lev
        lo_g = disp_min / s - 1.0
        hi_g = disp_max / s + 1.0
        a, b = pyr1[lev], pyr2[lev]
        if lo is None:
            lo = np.full(a.shape, lo_g, np.float32)
            hi = np.full(a.shape, hi_g, np.float32)
            ilo = np.full(b.shape, -hi_g, np.float32)
            ihi = np.full(b.shape, -lo_g, np.float32)
        dmin_l = int(np.floor(lo_g))
        D = int(np.ceil(hi_g)) - dmin_l + 1
        D = -(-D // 8) * 8
        dL_j, dR_j, okL_j, okR_j = _scale_step(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(lo), jnp.asarray(hi),
            jnp.asarray(ilo), jnp.asarray(ihi), dmin_l, D,
            self_sim=True, min_dist=float(min_dist))
        dL = np.asarray(dL_j, np.float32)
        dR = np.asarray(dR_j, np.float32)
        okL = np.asarray(okL_j)
        okR = np.asarray(okR_j)
        area = max(int(grain_area / s), 1)
        okL = _grain_filter(okL, area)
        okR = _grain_filter(okR, area)
        if lev > 0:
            lo_c, hi_c = _update_range_maps(dL, okL, lo_g, hi_g)
            ilo_c, ihi_c = _update_range_maps(dR, okR, -hi_g, -lo_g)
            s_next = 2.0 ** (lev - 1)
            lo, hi = _upsample_range(lo_c, hi_c, pyr1[lev - 1].shape,
                                     disp_min / s_next - 1.0,
                                     disp_max / s_next + 1.0)
            ilo, ihi = _upsample_range(ilo_c, ihi_c, pyr2[lev - 1].shape,
                                       -(disp_max / s_next + 1.0),
                                       -(disp_min / s_next - 1.0))

    disp = np.where(okL, dL, np.nan).astype(np.float32)
    return disp, okL
