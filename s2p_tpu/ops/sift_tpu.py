"""Full-device SIFT detection pipeline (TPU-first flow).

The host flow in :mod:`s2p_tpu.ops.sift` computes the gaussian pyramid with
scipy and ships per-(octave, scale) gradient fields to the device for the
orientation/descriptor stages.  Through the axon tunnel that costs one
remote compile per distinct field shape (minutes each) and ~40 MB of
uploads per image.  This module keeps the whole detection on device with a
shape budget of THREE compiled programs per crop-size bucket:

  1. ``pyramid program``: bilinear x2 upsample, the cascade of separable
     gaussian blurs (symmetric boundary, IPOL convention), DoG, strict
     26-neighbor extremum masks, per-octave top-K candidate extraction and
     the 5-iteration quadratic refinement (vmapped 3x3x3 gathers + Cramer
     solves) -- plus packing all (octave, scale) gaussian fields into one
     fixed-shape ATLAS image that stays on device;
  2. ``orientation kernel``: 36-bin gradient histograms over the atlas
     (per-job field bounds, so one compile serves every octave/scale);
  3. ``descriptor kernel``: the 4x4x8 trilinear descriptor as batched
     matmuls over the atlas.

Only small tables cross the tunnel: the padded crop up (<=1 MB), candidate
tables, histograms and descriptors down (~2 MB) -- the ~10 MB/s fetch
bandwidth never sees a field.

Numerical parity with the host flow: the input crop is padded by symmetric
extension to the bucket size; symmetric (even) extension commutes with the
symmetric-boundary gaussian blur, so interior pyramid values match the
unpadded computation wherever the padding is wider than the accumulated
kernel radius, and candidates outside the original per-octave domain are
culled exactly like the reference's border exclusion (cf.
/root/reference/s2p/sift.py:33-114 for the output contract).
"""

from __future__ import annotations

import functools
import math

import numpy as np

from .sift import (DELTA_MIN, SIGMA_MIN, SIGMA_IN, N_SPO, C_EDGE, LAMBDA_ORI,
                   LAMBDA_DESCR, N_BINS, N_HIST, N_ORI, _gauss_kernel,
                   _hist_peaks, _fetch_all, _fetch_concat)

_CHUNK = 512          # jobs per orientation/descriptor dispatch
_MARGIN = 64          # atlas outer margin (>= max patch radius)
_R_ORI = 24           # shared orientation patch radius (covers sigma_oct<=5)
_R_DESC = 56          # shared descriptor patch radius
_K0 = 8192            # candidate capacity, octave 0 (halved per octave)
_WAVE = 16            # crops per breadth-first detection wave (memory cap)


def _octave_layout(hb, wb, n_octaves):
    """Static per-octave field sizes for a padded crop (hb, wb) and the
    atlas slot offsets.  Octaves stop when the NEXT octave would have
    min dim < 24 (the host loop's `min//2 < 12` break)."""
    sizes = []
    h, w = 2 * hb, 2 * wb
    for _ in range(n_octaves):
        sizes.append((h, w))
        if min(h, w) // 2 < 12:
            break
        h, w = (h + 1) // 2, (w + 1) // 2
    # atlas: octaves stacked vertically, the n_spo+1 descriptor scales of
    # each octave side by side horizontally
    slots = {}
    y = _MARGIN
    width = 0
    for o, (ho, wo) in enumerate(sizes):
        for s in range(1, N_SPO + 2):
            slots[(o, s)] = (y, _MARGIN + (s - 1) * (wo + _MARGIN))
        width = max(width, (N_SPO + 1) * (wo + _MARGIN))
        y += ho + _MARGIN
    Ha = -(-(y + _MARGIN) // 8) * 8
    Wa = -(-(width + _MARGIN) // 128) * 128
    return sizes, slots, (Ha, Wa)


def _blur_jnp(img, sigma):
    """Separable gaussian, symmetric boundary (matches sift._blur)."""
    import jax.numpy as jnp
    k = _gauss_kernel(sigma)
    kj = jnp.asarray(k)
    r = (len(k) - 1) // 2
    p = jnp.pad(img, ((r, r), (0, 0)), mode='symmetric')
    img = sum(kj[i] * p[i:i + img.shape[0], :] for i in range(len(k)))
    p = jnp.pad(img, ((0, 0), (r, r)), mode='symmetric')
    img = sum(kj[i] * p[:, i:i + img.shape[1]] for i in range(len(k)))
    return img


def _upsample2_jnp(img):
    import jax.numpy as jnp
    h, w = img.shape
    ys = jnp.arange(2 * h) * 0.5
    xs = jnp.arange(2 * w) * 0.5
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    fy = (ys - y0)[:, None].astype(jnp.float32)
    fx = (xs - x0)[None, :].astype(jnp.float32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    a = img[y0[:, None], x0[None, :]]
    b = img[y0[:, None], x1[None, :]]
    c = img[y1[:, None], x0[None, :]]
    d = img[y1[:, None], x1[None, :]]
    return a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx \
        + c * fy * (1 - fx) + d * fy * fx


def _extrema_mask_jnp(dog):
    import jax.numpy as jnp
    S, H, W = dog.shape
    c = dog[1:-1, 1:-1, 1:-1]
    is_max = jnp.ones_like(c, dtype=bool)
    is_min = jnp.ones_like(c, dtype=bool)
    for ds in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == 0 and dy == 0 and dx == 0:
                    continue
                nb = dog[1 + ds:S - 1 + ds, 1 + dy:H - 1 + dy,
                         1 + dx:W - 1 + dx]
                is_max = is_max & (c > nb)
                is_min = is_min & (c < nb)
    return jnp.pad(is_max | is_min, ((1, 1), (1, 1), (1, 1)))


def _refine_device(dog, cand_s, cand_y, cand_x, alive0, c_dog, ho, wo):
    """Vectorized 5-attempt quadratic refinement (parity with
    sift._refine_candidates, f32).  Returns (s, y, x, offs, vals, keep)."""
    import jax
    import jax.numpy as jnp

    S = dog.shape[0]

    def solve3(Hm, g):
        # Cramer / adjugate solve of H x = -g
        a, b, c = Hm[0, 0], Hm[0, 1], Hm[0, 2]
        d, e, f = Hm[1, 1], Hm[1, 2], Hm[2, 2]
        det = (a * (d * f - e * e) - b * (b * f - e * c)
               + c * (b * e - d * c))
        A00 = d * f - e * e
        A01 = c * e - b * f
        A02 = b * e - c * d
        A11 = a * f - c * c
        A12 = b * c - a * e
        A22 = a * d - b * b
        x0 = -(A00 * g[0] + A01 * g[1] + A02 * g[2])
        x1 = -(A01 * g[0] + A11 * g[1] + A12 * g[2])
        x2 = -(A02 * g[0] + A12 * g[1] + A22 * g[2])
        safe = jnp.abs(det) > 1e-30
        inv = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)
        return jnp.stack([x0, x1, x2]) * inv, safe

    def refine_one(s, y, x, alive):
        def body(_, carry):
            s, y, x, off, val, alive, done = carry
            nb = jax.lax.dynamic_slice(dog, (s - 1, y - 1, x - 1), (3, 3, 3))
            c0 = nb[1, 1, 1]
            g = jnp.stack([0.5 * (nb[2, 1, 1] - nb[0, 1, 1]),
                           0.5 * (nb[1, 2, 1] - nb[1, 0, 1]),
                           0.5 * (nb[1, 1, 2] - nb[1, 1, 0])])
            hss = nb[2, 1, 1] + nb[0, 1, 1] - 2 * c0
            hyy = nb[1, 2, 1] + nb[1, 0, 1] - 2 * c0
            hxx = nb[1, 1, 2] + nb[1, 1, 0] - 2 * c0
            hsy = 0.25 * (nb[2, 2, 1] - nb[2, 0, 1] - nb[0, 2, 1]
                          + nb[0, 0, 1])
            hsx = 0.25 * (nb[2, 1, 2] - nb[2, 1, 0] - nb[0, 1, 2]
                          + nb[0, 1, 0])
            hyx = 0.25 * (nb[1, 2, 2] - nb[1, 2, 0] - nb[1, 0, 2]
                          + nb[1, 0, 0])
            Hm = jnp.array([[hss, hsy, hsx], [hsy, hyy, hyx],
                            [hsx, hyx, hxx]])
            sol, ok = solve3(Hm, g)
            act = alive & ~done
            alive = alive & (ok | ~act)
            interior = jnp.all(jnp.abs(sol) < 0.6)
            w_interp = c0 + 0.5 * jnp.dot(g, sol)
            fin = act & ok & interior
            off = jnp.where(fin, sol, off)
            val = jnp.where(fin, w_interp, val)
            done = done | fin
            move = act & ok & ~interior
            step = jnp.clip(jnp.round(sol), -1, 1).astype(jnp.int32)
            s2 = jnp.where(move, s + step[0], s)
            y2 = jnp.where(move, y + step[1], y)
            x2 = jnp.where(move, x + step[2], x)
            inb = ((s2 >= 1) & (s2 <= S - 2) & (y2 >= 1) & (y2 <= ho - 2)
                   & (x2 >= 1) & (x2 <= wo - 2))
            alive = alive & (inb | ~move)
            s2 = jnp.clip(s2, 1, S - 2)
            y2 = jnp.clip(y2, 1, dog.shape[1] - 2)
            x2 = jnp.clip(x2, 1, dog.shape[2] - 2)
            return (s2, y2, x2, off, val, alive, done)

        init = (s, y, x, jnp.zeros(3, jnp.float32), jnp.float32(0.0),
                alive, jnp.bool_(False))
        s, y, x, off, val, alive, done = jax.lax.fori_loop(0, 5, body, init)
        keep = alive & done & (jnp.abs(val) >= c_dog)

        # edge-response test on the 2D spatial hessian
        nb = jax.lax.dynamic_slice(dog, (s, y - 1, x - 1), (1, 3, 3))[0]
        c0 = nb[1, 1]
        hyy = nb[2, 1] + nb[0, 1] - 2 * c0
        hxx = nb[1, 2] + nb[1, 0] - 2 * c0
        hyx = 0.25 * (nb[2, 2] - nb[2, 0] - nb[0, 2] + nb[0, 0])
        tr = hxx + hyy
        det2 = hxx * hyy - hyx * hyx
        keep = keep & (det2 > 0) & (tr * tr * C_EDGE < (C_EDGE + 1) ** 2 * det2)
        return s, y, x, off, val, keep

    return jax.vmap(refine_one)(cand_s, cand_y, cand_x, alive0)


@functools.lru_cache(maxsize=8)
def _pyramid_program(hb, wb, n_octaves, n_scales):
    """Jitted: padded crop -> (atlas, per-octave candidate tables).

    Static on the bucketed crop shape only.  ``thresh`` and the original
    crop dims (h, w) are traced, so DoG-threshold retries and every crop
    within the bucket share the compile.
    """
    import jax
    import jax.numpy as jnp

    assert n_scales == N_SPO
    sizes, slots, (Ha, Wa) = _octave_layout(hb, wb, n_octaves)

    def program(img, h, w, thresh):
        img = img.astype(jnp.float32)   # uint16 upload path (lossless)
        sigma0 = math.sqrt(SIGMA_MIN ** 2 - SIGMA_IN ** 2) / DELTA_MIN
        v = _blur_jnp(_upsample2_jnp(img), sigma0)
        atlas = jnp.zeros((Ha, Wa), jnp.float32)
        tables = []
        ho_f = 2.0 * h
        wo_f = 2.0 * w
        for o, (hso, wso) in enumerate(sizes):
            imgs = [v]
            for s in range(1, N_SPO + 3):
                rho = (SIGMA_MIN / DELTA_MIN) * math.sqrt(
                    2 ** (2.0 * s / N_SPO) - 2 ** (2.0 * (s - 1) / N_SPO))
                imgs.append(_blur_jnp(imgs[-1], rho))
            g = jnp.stack(imgs)
            dog = g[1:] - g[:-1]

            # original (unpadded) octave dims; candidates beyond are culled
            ho = jnp.ceil(ho_f).astype(jnp.int32)
            wo = jnp.ceil(wo_f).astype(jnp.int32)

            S, Hh, Ww = dog.shape
            mask = _extrema_mask_jnp(dog) & (jnp.abs(dog) >= 0.8 * thresh)
            sg = jax.lax.broadcasted_iota(jnp.int32, dog.shape, 0)
            yg = jax.lax.broadcasted_iota(jnp.int32, dog.shape, 1)
            xg = jax.lax.broadcasted_iota(jnp.int32, dog.shape, 2)
            mask = mask & (yg <= ho - 2) & (xg <= wo - 2)
            K = max(256, _K0 >> o)
            score = jnp.where(mask, jnp.abs(dog), 0.0).reshape(-1)
            top, idx = jax.lax.top_k(score, min(K, score.shape[0]))
            cs = idx // (Hh * Ww)
            cy = (idx // Ww) % Hh
            cx = idx % Ww
            alive = top > 0.0
            rs, ry, rx, off, val, keep = _refine_device(
                dog, cs, cy, cx, alive, thresh, ho, wo)
            tables.append(jnp.stack([
                rs.astype(jnp.float32), ry.astype(jnp.float32),
                rx.astype(jnp.float32), off[:, 0], off[:, 1], off[:, 2],
                val, (keep & alive).astype(jnp.float32)], axis=1))

            for s in range(1, N_SPO + 2):
                oy, ox = slots[(o, s)]
                atlas = jax.lax.dynamic_update_slice(atlas, g[s], (oy, ox))
            if o + 1 < len(sizes):
                v = g[N_SPO][::2, ::2]
                ho_f = jnp.ceil(ho_f) / 2.0
                wo_f = jnp.ceil(wo_f) / 2.0
        return atlas, tables

    return jax.jit(program)


@functools.lru_cache(maxsize=8)
def _grad_fields_atlas():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def grads(atlas):
        gy = 0.5 * (jnp.concatenate([atlas[1:], atlas[-1:]], axis=0)
                    - jnp.concatenate([atlas[:1], atlas[:-1]], axis=0))
        gx = 0.5 * (jnp.concatenate([atlas[:, 1:], atlas[:, -1:]], axis=1)
                    - jnp.concatenate([atlas[:, :1], atlas[:, :-1]], axis=1))
        return jnp.hypot(gx, gy), jnp.arctan2(gx, gy)
    return grads


@functools.lru_cache(maxsize=4)
def _ori_kernel_atlas(R=_R_ORI):
    import jax
    import jax.numpy as jnp

    side = 2 * R + 1

    def kernel(gmag, gori, yc, xc, sigma, ylo, yhi, xlo, xhi, valid):
        """yc/xc in atlas coords; [ylo,yhi]x[xlo,xhi] the per-job valid
        sample box (field interior, original-dims bounds) in atlas coords."""
        y0 = (jnp.round(yc) - R).astype(jnp.int32)
        x0 = (jnp.round(xc) - R).astype(jnp.int32)
        gather = jax.vmap(lambda f, yy, xx: jax.lax.dynamic_slice(
            f, (yy, xx), (side, side)), in_axes=(None, 0, 0))
        m = gather(gmag, y0, x0)
        o = gather(gori, y0, x0)

        off = jnp.arange(-R, R + 1, dtype=jnp.float32)
        ry = jnp.round(yc)[:, None, None] + off[None, :, None]
        rx = jnp.round(xc)[:, None, None] + off[None, None, :]
        inb = ((ry >= ylo[:, None, None]) & (ry <= yhi[:, None, None])
               & (rx >= xlo[:, None, None]) & (rx <= xhi[:, None, None]))

        d2 = (ry - yc[:, None, None]) ** 2 + (rx - xc[:, None, None]) ** 2
        sig = sigma[:, None, None]
        w = jnp.exp(-d2 / (2 * (LAMBDA_ORI * sig) ** 2)) * m
        win = jnp.maximum(jnp.abs(ry - jnp.round(yc)[:, None, None]),
                          jnp.abs(rx - jnp.round(xc)[:, None, None]))
        w = jnp.where((win <= jnp.round(3 * LAMBDA_ORI * sig)) & inb
                      & valid[:, None, None], w, 0.0)

        bins = (jnp.round(N_BINS / (2 * np.pi) * (o % (2 * np.pi)))
                .astype(jnp.int32) % N_BINS)
        hist = []
        for b in range(N_BINS):
            hist.append(jnp.sum(jnp.where(bins == b, w, 0.0), axis=(1, 2)))
        hist = jnp.stack(hist, axis=1)
        for _ in range(6):
            hist = (jnp.roll(hist, 1, axis=1) + hist
                    + jnp.roll(hist, -1, axis=1)) / 3.0
        return hist

    return jax.jit(kernel)


@functools.lru_cache(maxsize=4)
def _desc_kernel_atlas(R=_R_DESC):
    import jax
    import jax.numpy as jnp

    lam = LAMBDA_DESCR
    lim_win = lam * (N_HIST + 1.0) / N_HIST
    side = 2 * R + 1

    def kernel(gmag, gori, yc, xc, sigma, theta, ylo, yhi, xlo, xhi, valid):
        y0 = (jnp.round(yc) - R).astype(jnp.int32)
        x0 = (jnp.round(xc) - R).astype(jnp.int32)
        gather = jax.vmap(lambda f, yy, xx: jax.lax.dynamic_slice(
            f, (yy, xx), (side, side)), in_axes=(None, 0, 0))
        m = gather(gmag, y0, x0)
        o = gather(gori, y0, x0)

        off = jnp.arange(-R, R + 1, dtype=jnp.float32)
        ry = jnp.round(yc)[:, None, None] + off[None, :, None]
        rx = jnp.round(xc)[:, None, None] + off[None, None, :]
        inb = ((ry >= ylo[:, None, None]) & (ry <= yhi[:, None, None])
               & (rx >= xlo[:, None, None]) & (rx <= xhi[:, None, None]))

        dy = ry - yc[:, None, None]
        dx = rx - xc[:, None, None]
        ct = jnp.cos(theta)[:, None, None]
        st = jnp.sin(theta)[:, None, None]
        sig = sigma[:, None, None]
        u = (ct * dy + st * dx) / sig
        v = (-st * dy + ct * dx) / sig

        sel = ((jnp.abs(u) < lim_win) & (jnp.abs(v) < lim_win) & inb
               & valid[:, None, None])
        w = jnp.where(sel, m * jnp.exp(-(u * u + v * v) / (2 * lam * lam)),
                      0.0)
        ang = (o - theta[:, None, None]) % (2 * np.pi)

        N = yc.shape[0]
        P = side * side
        cu = ((u + lam) * N_HIST / (2 * lam) - 0.5).reshape(N, P)
        cv = ((v + lam) * N_HIST / (2 * lam) - 0.5).reshape(N, P)
        co = (ang * N_ORI / (2 * np.pi)).reshape(N, P)
        w = w.reshape(N, P)

        iu = jnp.arange(N_HIST, dtype=jnp.float32)
        Au = jnp.maximum(0.0, 1.0 - jnp.abs(cu[..., None] - iu))
        Av = jnp.maximum(0.0, 1.0 - jnp.abs(cv[..., None] - iu))
        io = jnp.arange(N_ORI, dtype=jnp.float32)
        dcirc = jnp.abs((co[..., None] - io + N_ORI / 2) % N_ORI - N_ORI / 2)
        Ao = jnp.maximum(0.0, 1.0 - dcirc)

        rows = []
        for k in range(N_HIST):
            wk = w * Au[..., k]
            rows.append(jnp.einsum('npv,npo->nvo', Av * wk[..., None], Ao,
                                   precision='highest'))
        desc = jnp.stack(rows, axis=1).reshape(N, 128)

        nrm = jnp.linalg.norm(desc, axis=1, keepdims=True)
        desc = jnp.minimum(desc, 0.2 * nrm)
        nrm2 = jnp.linalg.norm(desc, axis=1, keepdims=True)
        q = jnp.minimum(jnp.floor(512.0 * desc / jnp.maximum(nrm2, 1e-30)),
                        255.0)
        return jnp.where(jnp.isfinite(q), q, 0.0).astype(jnp.float32)

    return jax.jit(kernel)


def _dispatch_atlas(kern, gmag, gori, cols, n):
    handles = []
    for i in range(0, n, _CHUNK):
        j = min(i + _CHUNK, n)
        pad = _CHUNK - (j - i)
        args = [np.pad(a[i:j].astype(np.float32), (0, pad),
                       constant_values=(1.0 if name == 's' else 0.0))
                for name, a in cols]
        val = np.zeros(_CHUNK, bool)
        val[:j - i] = True
        handles.append(kern(gmag, gori, *args, val))
    return handles


def _crop_bucket(arr):
    """Padded crop shape: 128-px grid.  Coarser than strictly necessary
    on purpose -- every distinct bucket is a compiled pyramid program plus
    a distinct atlas shape for the orientation/descriptor/gradient
    kernels, and each one costs a cold compile (minutes through the
    tunnel) or a cache-load + first-execution (~2 s) in EVERY fresh
    process.  128-rounding collapses the reference pair scene from 5
    bucket shapes to 3.  NOTE the bucket choice is part of the output
    contract: mirror padding does not commute with the pyramid
    decimation at deep octaves, so a crop's keypoints are only
    reproducible at the SAME bucket -- which is why this is a fixed
    deterministic rule, not a scene-dependent clustering."""
    h, w = arr.shape
    return (-(-h // 128) * 128, -(-w // 128) * 128)


def _dispatch_pyramid(arr, thresh_dog, n_octaves, n_scales, bucket=None,
                      device=None):
    """Phase A (no host sync): pad, dispatch the pyramid program and the
    gradient fields; returns a state dict of DEVICE handles + metadata.
    ``device`` pins the crop's whole detection to one local device (the
    multi-chip wave round-robins crops across local devices)."""
    import jax
    import jax.numpy as jnp

    arr = np.asarray(arr, dtype=np.float32)
    h, w = arr.shape
    hb, wb = bucket if bucket is not None else _crop_bucket(arr)
    # symmetric-pad to the bucket (numpy symmetric == IPOL half-sample
    # reflection); symmetric extension commutes with the blur cascade
    img = np.pad(arr, ((0, hb - h), (0, wb - w)), mode='symmetric') \
        if (hb != h or wb != w) else arr

    sizes, slots, _ = _octave_layout(hb, wb, n_octaves)
    prog = _pyramid_program(hb, wb, n_octaves, n_scales)
    # satellite crops are integer-valued: upload uint16 when lossless
    # (halves the h2d bytes through the ~10-20 MB/s tunnel; the program
    # casts back to f32 on device, bitwise identical)
    if img.dtype == np.float32:
        cand = img.astype(np.uint16)
        if np.array_equal(cand.astype(np.float32), img):
            img = cand
    img_dev = jnp.asarray(img) if device is None \
        else jax.device_put(img, device)
    atlas, tables_dev = prog(img_dev, h, w, np.float32(thresh_dog))
    gmag, gori = _grad_fields_atlas()(atlas)
    return dict(h=h, w=w, sizes=sizes, slots=slots, n_scales=n_scales,
                n_octaves=n_octaves, tables_dev=tables_dev,
                gmag=gmag, gori=gori)


def _build_groups(st, tables):
    """Phase B (host): candidate tables -> per-(octave, scale) job groups."""
    h, w = st['h'], st['w']
    n_scales = st['n_scales']
    # the bucketed dims can admit one more octave than the original crop
    # would (the host loop stops on the true dims); cull the extras
    n_host = 0
    hh, ww = 2 * h, 2 * w
    for _ in range(st['n_octaves']):
        n_host += 1
        if min(hh, ww) // 2 < 12:
            break
        hh, ww = (hh + 1) // 2, (ww + 1) // 2

    groups = []
    for o, tab in enumerate(tables[:n_host]):
        keep = tab[:, 7] > 0
        if not keep.any():
            continue
        tab = tab[keep]
        delta = DELTA_MIN * 2 ** o
        s_id = tab[:, 0].astype(np.int64)
        ho, wo = int(math.ceil(2 * h / 2 ** o)), int(math.ceil(2 * w / 2 ** o))
        for s_idx in range(1, n_scales + 2):
            sel = s_id == s_idx
            if not sel.any():
                continue
            ys = tab[sel, 1] + tab[sel, 4]
            xs = tab[sel, 2] + tab[sel, 5]
            ss = tab[sel, 0] + tab[sel, 3]
            sigma = delta / DELTA_MIN * SIGMA_MIN * 2.0 ** (ss / n_scales)
            oy, ox = st['slots'][(o, s_idx)]
            groups.append(dict(
                delta=delta, ys=ys, xs=xs, sigma=sigma,
                sigma_oct=sigma / delta, oy=oy, ox=ox,
                ylo=oy + 1.0, yhi=oy + ho - 2.0,
                xlo=ox + 1.0, xhi=ox + wo - 2.0))
    return groups


def _group_cols(groups, names_fns):
    """Concatenate per-group per-job columns into one job stream."""
    def col(name, per_grp):
        return (name, np.concatenate([np.broadcast_to(
            np.asarray(per_grp(g), np.float32), (len(g['_jobs']),))
            for g in groups]) if groups else np.zeros(0, np.float32))
    return [col(name, fn) for name, fn in names_fns]


def _dispatch_ori(st, groups):
    """Phase C dispatch: orientation histograms for ALL candidates of one
    image as ONE merged job stream (no host sync)."""
    for g in groups:
        g['_jobs'] = g['ys']            # phase-1 jobs = all candidates
    n_all = sum(len(g['ys']) for g in groups)
    cols = _group_cols(groups, [
        ('y', lambda g: g['ys'] + g['oy']),
        ('x', lambda g: g['xs'] + g['ox']),
        ('s', lambda g: g['sigma_oct']),
        ('ylo', lambda g: g['ylo']), ('yhi', lambda g: g['yhi']),
        ('xlo', lambda g: g['xlo']), ('xhi', lambda g: g['xhi'])])
    return _dispatch_atlas(_ori_kernel_atlas(), st['gmag'], st['gori'],
                           cols, n_all), n_all


def _dispatch_desc(st, groups, hist_all):
    """Phase D dispatch: histogram peaks -> oriented descriptor jobs, one
    merged stream per image (no host sync)."""
    pos = 0
    for grp in groups:
        n = len(grp['ys'])
        oris = _hist_peaks(hist_all[pos:pos + n])
        pos += n
        grp['job_kp'] = np.array([i for i, a in enumerate(oris) for _ in a],
                                 dtype=np.int64)
        grp['job_theta'] = np.array([t for a in oris for t in a],
                                    dtype=np.float32)
        grp['_jobs'] = grp['job_kp']    # phase-2 jobs = oriented keypoints
    m_all = sum(len(g['job_kp']) for g in groups)
    cols = _group_cols(groups, [
        ('y', lambda g: g['ys'][g['job_kp']] + g['oy']),
        ('x', lambda g: g['xs'][g['job_kp']] + g['ox']),
        ('s', lambda g: g['sigma_oct'][g['job_kp']]),
        ('t', lambda g: g['job_theta']),
        ('ylo', lambda g: g['ylo']), ('yhi', lambda g: g['yhi']),
        ('xlo', lambda g: g['xlo']), ('xhi', lambda g: g['xhi'])])
    return _dispatch_atlas(_desc_kernel_atlas(), st['gmag'], st['gori'],
                           cols, m_all), m_all


def _assemble_rows(groups, desc_all, offset):
    pos = 0
    rows = []
    for grp in groups:
        m = len(grp['job_kp'])
        desc = desc_all[pos:pos + m]
        pos += m
        if m == 0:
            continue
        jk = grp['job_kp']
        heads = np.column_stack([grp['xs'][jk] * grp['delta'],
                                 grp['ys'][jk] * grp['delta'],
                                 grp['sigma'][jk], grp['job_theta']])
        rows.append(np.hstack([heads, desc]))

    if not rows:
        return np.zeros((0, 132), dtype=np.float32)
    kp = np.vstack(rows).astype(np.float32)
    if offset is not None:
        kp[:, 0] += offset[0]
        kp[:, 1] += offset[1]
    return kp


def _concat_fetched(handle_lists, counts, width):
    """Fetch the chunked kernel outputs of MANY images together (one
    async-copy wave), then split them back per image."""
    flat = [h for hs in handle_lists for h in hs]
    fetched = _fetch_concat(flat)
    outs = []
    k = 0
    for hs, n in zip(handle_lists, counts):
        parts = fetched[k:k + len(hs)]
        k += len(hs)
        outs.append(np.concatenate(parts, axis=0)[:n] if parts
                    else np.zeros((0, width), np.float32))
    return outs


def keypoints_from_arrays_tpu(arrs, thresh_dogs, offsets=None, n_octaves=8,
                              n_scales=3, device_desc=False):
    """Device SIFT detection for MANY crops, pipelined across the tunnel.

    Per-image results are bitwise identical to
    :func:`keypoints_from_array_tpu` (each image's computation is
    independent; only the dispatch/fetch interleaving changes).  The
    phases run breadth-first over images so every device->host round trip
    is shared by the whole batch: N crops cost 3 fetch waves total
    instead of 3 waves each -- the stage-1 analogue of the batched
    stage-4 matcher (reference fans per-tile SIFT processes,
    parallel.py:58-110).

    ``device_desc=True`` keeps the 128-d descriptors ON DEVICE: returns
    per image ``{'meta': (m, 4) float32 [x, y, scale, theta],
    'desc_chunks': [device arrays], 'count': m}`` whose concatenated
    chunk rows [:m] align with the meta rows.  The descriptor volume
    (~0.5 KB/keypoint) is the dominant d2h traffic of stage 1 and is only
    ever consumed by the device match kernel -- fetching it through the
    tunnel (~27 MB for the pair scene, bandwidth-bound) just to re-upload
    it is the single biggest stage-1 cost (measured 2026-08-21).
    """
    import time as _time
    _t0 = _time.perf_counter()
    arrs = list(arrs)
    if offsets is None:
        offsets = [None] * len(arrs)
    buckets = [_crop_bucket(np.asarray(a)) for a in arrs]
    # memory bound: at most _WAVE crops' atlases + gradient fields live on
    # device at once (each is ~3 fields of the full pyramid)
    if len(arrs) > _WAVE:
        out = []
        for i in range(0, len(arrs), _WAVE):
            out.extend(keypoints_from_arrays_tpu(
                arrs[i:i + _WAVE], list(thresh_dogs)[i:i + _WAVE],
                offsets[i:i + _WAVE], n_octaves, n_scales, device_desc))
        return out
    import jax
    devs = jax.local_devices()
    # crops arrive pair-ordered (ref crop, sec crop per tile pair):
    # keep both halves of a pair on the SAME device so the match kernel
    # consumes their device-resident descriptors without a cross-device
    # copy
    states = [_dispatch_pyramid(a, t, n_octaves, n_scales, bucket=b,
                                device=devs[(i // 2) % len(devs)]
                                if len(devs) > 1 else None)
              for i, (a, t, b) in enumerate(zip(arrs, thresh_dogs, buckets))]
    _t1 = _time.perf_counter()

    # one fetch wave for every image's candidate tables (single concat
    # round trip; per-array latency dominates through the tunnel)
    flat_tables = [t for st in states for t in st['tables_dev']]
    fetched = _fetch_concat(flat_tables)
    _t2 = _time.perf_counter()
    k = 0
    all_groups = []
    for st in states:
        n = len(st['tables_dev'])
        all_groups.append(_build_groups(st, fetched[k:k + n]))
        k += n

    ori = [_dispatch_ori(st, groups)
           for st, groups in zip(states, all_groups)]
    hists = _concat_fetched([h for h, _ in ori], [n for _, n in ori], N_BINS)
    _t3 = _time.perf_counter()

    desc = [_dispatch_desc(st, groups, hist_all)
            for st, groups, hist_all in zip(states, all_groups, hists)]
    if device_desc:
        out = [{'meta': _assemble_heads(groups, off),
                'desc_chunks': hs, 'count': m}
               for (hs, m), groups, off in zip(desc, all_groups, offsets)]
        descs = None
    else:
        descs = _concat_fetched([h for h, _ in desc],
                                [n for _, n in desc], 128)
    _t4 = _time.perf_counter()
    import os as _os
    if _os.environ.get('S2P_TPU_SIFT_TIMING'):
        n_ori = sum(n for _, n in ori)
        n_desc = sum(n for _, n in desc)
        print(f'      sift wave: dispatch {_t1-_t0:.2f}s tables '
              f'{_t2-_t1:.2f}s ori {_t3-_t2:.2f}s ({n_ori} jobs) desc '
              f'{_t4-_t3:.2f}s ({n_desc} jobs)', flush=True)

    if device_desc:
        return out
    return [_assemble_rows(groups, d, off)
            for groups, d, off in zip(all_groups, descs, offsets)]


def _assemble_heads(groups, offset):
    """The (x, y, scale, theta) head columns of _assemble_rows, in the
    same job-stream order as the concatenated descriptor chunks [:m]."""
    rows = []
    for grp in groups:
        jk = grp['job_kp']
        if len(jk) == 0:
            continue
        rows.append(np.column_stack([grp['xs'][jk] * grp['delta'],
                                     grp['ys'][jk] * grp['delta'],
                                     grp['sigma'][jk], grp['job_theta']]))
    if not rows:
        return np.zeros((0, 4), dtype=np.float32)
    kp = np.vstack(rows).astype(np.float32)
    if offset is not None:
        kp[:, 0] += offset[0]
        kp[:, 1] += offset[1]
    return kp


def keypoints_from_array_tpu(arr, thresh_dog=0.0133, n_octaves=8,
                             n_scales=3, offset=None):
    """Device SIFT detection; same output contract as
    sift.keypoints_from_array (rows of x, y, scale, orientation, 128-d)."""
    return keypoints_from_arrays_tpu([arr], [thresh_dog], [offset],
                                     n_octaves, n_scales)[0]
