"""SIFT keypoints, descriptors and matching.

From-scratch implementation of the IPOL "Anatomy of the SIFT Method"
(Rey-Otero & Delbracio) algorithm, the method behind the reference's
``libsift4ctypes.so`` (cf. /root/reference/s2p/sift.py:33-114 for the
parameters and output contract: rows of (x, y, scale, orientation,
128-descriptor), raw-intensity DoG threshold 0.0133, n_octaves 8, 3 scales
per octave).

Split of work:
  * dense stages (gaussian scale space, DoG, 26-neighbor extremum masks)
    are jitted JAX convolutions/reductions -- the per-pixel hot part;
  * sparse stages (quadratic refinement, orientation histograms,
    descriptors) run vectorized on host over the extracted candidates
    (variable-length; batched numpy).

Matching (ratio test + epipolar gate) is a dense descriptor-distance matmul
-- MXU work -- over the two keypoint sets.
"""

from __future__ import annotations

import functools
import math
import time

import numpy as np

# IPOL reference parameters
DELTA_MIN = 0.5
SIGMA_MIN = 0.8
SIGMA_IN = 0.5
N_SPO = 3
C_EDGE = 10.0
LAMBDA_ORI = 1.5
LAMBDA_DESCR = 6.0
N_BINS = 36
N_HIST = 4
N_ORI = 8


# --------------------------------------------------------------------- #
# Dense device stages
# --------------------------------------------------------------------- #

def _gauss_kernel(sigma):
    r = max(1, int(math.ceil(4.0 * sigma)))
    xs = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(img, sigma):
    """Separable gaussian blur, sampled kernel, symmetric (DCT-II) boundary
    (IPOL convention).  scipy's C path on host arrays; jax arrays use an
    equivalent padded tap sum (device path)."""
    k = _gauss_kernel(sigma)
    if isinstance(img, np.ndarray):
        from scipy.ndimage import convolve1d
        out = convolve1d(img, k, axis=0, mode='reflect')
        return convolve1d(out, k, axis=1, mode='reflect')
    import jax.numpy as jnp
    kj = jnp.asarray(k)
    r = (len(k) - 1) // 2
    p = jnp.pad(img, ((r, r), (0, 0)), mode='symmetric')
    img = sum(kj[i] * p[i:i + img.shape[0], :] for i in range(len(k)))
    p = jnp.pad(img, ((0, 0), (r, r)), mode='symmetric')
    img = sum(kj[i] * p[:, i:i + img.shape[1]] for i in range(len(k)))
    return img


def _upsample2(img):
    """Bilinear x2 upsampling to the delta_min = 0.5 grid (IPOL oversample)."""
    h, w = img.shape
    oh, ow = 2 * h, 2 * w
    ys = np.arange(oh) * 0.5
    xs = np.arange(ow) * 0.5
    y0 = np.floor(ys).astype(np.int32)
    x0 = np.floor(xs).astype(np.int32)
    fy = (ys - y0)[:, None].astype(np.float32)
    fx = (xs - x0)[None, :].astype(np.float32)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    a = img[y0[:, None], x0[None, :]]
    b = img[y0[:, None], x1[None, :]]
    c = img[y1[:, None], x0[None, :]]
    d = img[y1[:, None], x1[None, :]]
    out = a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx \
        + c * fy * (1 - fx) + d * fy * fx
    return np.asarray(out, dtype=np.float32)


def _build_scale_space(img, n_oct, n_spo):
    """Gaussian scale space + DoG pyramid (host-driven loop of jitted blurs).

    Returns per octave: (gauss (n_spo+3, h, w), dog (n_spo+2, h, w), delta).
    """
    octaves = []
    u = _upsample2(np.asarray(img, np.float32))
    sigma0 = math.sqrt(SIGMA_MIN ** 2 - SIGMA_IN ** 2) / DELTA_MIN
    v = _blur(u, sigma0)
    delta = DELTA_MIN
    for o in range(n_oct):
        imgs = [v]
        for s in range(1, n_spo + 3):
            rho = (SIGMA_MIN / DELTA_MIN) * math.sqrt(
                2 ** (2.0 * s / n_spo) - 2 ** (2.0 * (s - 1) / n_spo))
            imgs.append(_blur(imgs[-1], rho))
        g = np.stack(imgs)
        dog = g[1:] - g[:-1]
        octaves.append((g, dog, delta))
        if min(imgs[0].shape) // 2 < 12:
            break
        v = imgs[n_spo][::2, ::2]
        delta *= 2
    return octaves


def _extrema_mask(dog):
    """Strict 26-neighbor extrema of the DoG stack ((S, H, W) bool for
    scales 1..S-2, returned aligned with the full stack)."""
    S, H, W = dog.shape
    c = dog[1:-1, 1:-1, 1:-1]
    is_max = np.ones_like(c, dtype=bool)
    is_min = np.ones_like(c, dtype=bool)
    for ds in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == 0 and dy == 0 and dx == 0:
                    continue
                nb = dog[1 + ds:S - 1 + ds, 1 + dy:H - 1 + dy, 1 + dx:W - 1 + dx]
                is_max &= c > nb
                is_min &= c < nb
    out = np.zeros((S, H, W), dtype=bool)
    out[1:-1, 1:-1, 1:-1] = is_max | is_min
    return out


# --------------------------------------------------------------------- #
# Sparse host stages
# --------------------------------------------------------------------- #

def _refine_candidates(dog, cand, c_dog):
    """Vectorized 3D quadratic interpolation of extrema (IPOL: up to 5
    re-localization attempts, 0.6 offset gate, then |w| and edge tests).

    Args:
        dog: (S, H, W) numpy DoG stack of one octave.
        cand: (n, 3) integer candidates (s, y, x).

    Returns:
        (kept (m, 3) int, offsets (m, 3) float, vals (m,)).
    """
    S, H, W = dog.shape
    pos = cand.astype(np.int64).copy()
    n = len(pos)
    alive = np.ones(n, dtype=bool)
    done = np.zeros(n, dtype=bool)
    off = np.zeros((n, 3), dtype=np.float64)
    val = np.zeros(n, dtype=np.float64)

    for _ in range(5):
        idx = np.where(alive & ~done)[0]
        if len(idx) == 0:
            break
        s, y, x = pos[idx, 0], pos[idx, 1], pos[idx, 2]

        def at(ds, dy, dx):
            return dog[s + ds, y + dy, x + dx]

        g = np.stack([0.5 * (at(1, 0, 0) - at(-1, 0, 0)),
                      0.5 * (at(0, 1, 0) - at(0, -1, 0)),
                      0.5 * (at(0, 0, 1) - at(0, 0, -1))], axis=1)
        c0 = at(0, 0, 0)
        hss = at(1, 0, 0) + at(-1, 0, 0) - 2 * c0
        hyy = at(0, 1, 0) + at(0, -1, 0) - 2 * c0
        hxx = at(0, 0, 1) + at(0, 0, -1) - 2 * c0
        hsy = 0.25 * (at(1, 1, 0) - at(1, -1, 0) - at(-1, 1, 0) + at(-1, -1, 0))
        hsx = 0.25 * (at(1, 0, 1) - at(1, 0, -1) - at(-1, 0, 1) + at(-1, 0, -1))
        hyx = 0.25 * (at(0, 1, 1) - at(0, 1, -1) - at(0, -1, 1) + at(0, -1, -1))
        Hm = np.empty((len(idx), 3, 3))
        Hm[:, 0, 0], Hm[:, 0, 1], Hm[:, 0, 2] = hss, hsy, hsx
        Hm[:, 1, 0], Hm[:, 1, 1], Hm[:, 1, 2] = hsy, hyy, hyx
        Hm[:, 2, 0], Hm[:, 2, 1], Hm[:, 2, 2] = hsx, hyx, hxx
        det = np.linalg.det(Hm)
        ok = np.abs(det) > 1e-30
        sol = np.zeros_like(g)
        if ok.any():
            sol[ok] = np.linalg.solve(Hm[ok], -g[ok][..., None])[..., 0]
        alive[idx[~ok]] = False

        interior = np.all(np.abs(sol) < 0.6, axis=1)
        w_interp = c0 + 0.5 * np.sum(g * sol, axis=1)
        fin = idx[interior & ok]
        off[fin] = sol[interior & ok]
        val[fin] = w_interp[interior & ok]
        done[fin] = True

        move = idx[~interior & ok]
        step = np.round(sol[~interior & ok]).astype(np.int64)
        step = np.clip(step, -1, 1)
        pos[move] += step
        inb = ((pos[move, 0] >= 1) & (pos[move, 0] <= S - 2)
               & (pos[move, 1] >= 1) & (pos[move, 1] <= H - 2)
               & (pos[move, 2] >= 1) & (pos[move, 2] <= W - 2))
        alive[move[~inb]] = False

    keep = alive & done & (np.abs(val) >= c_dog)
    if not keep.any():
        return (np.zeros((0, 3), np.int64), np.zeros((0, 3)), np.zeros(0))

    # edge-response test on the 2D spatial hessian
    s, y, x = pos[keep, 0], pos[keep, 1], pos[keep, 2]
    c0 = dog[s, y, x]
    hyy = dog[s, y + 1, x] + dog[s, y - 1, x] - 2 * c0
    hxx = dog[s, y, x + 1] + dog[s, y, x - 1] - 2 * c0
    hyx = 0.25 * (dog[s, y + 1, x + 1] - dog[s, y + 1, x - 1]
                  - dog[s, y - 1, x + 1] + dog[s, y - 1, x - 1])
    tr = hxx + hyy
    det2 = hxx * hyy - hyx * hyx
    edge_ok = (det2 > 0) & (tr * tr * C_EDGE < (C_EDGE + 1) ** 2 * det2)
    kidx = np.where(keep)[0][edge_ok]
    return pos[kidx], off[kidx], val[kidx]


def _extract_patches(field, y, x, r, fill=0.0):
    """(n, 2r+1, 2r+1) patches of ``field`` centered at integer (y, x);
    out-of-image samples get ``fill``.  Fully vectorized gather."""
    H, W = field.shape
    dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
    yy = (y[:, None, None].astype(np.int32) + dy[None].astype(np.int32))
    xx = (x[:, None, None].astype(np.int32) + dx[None].astype(np.int32))
    inb = (yy >= 1) & (yy <= H - 2) & (xx >= 1) & (xx <= W - 2)
    vals = field[np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)]
    return np.where(inb, vals, np.float32(fill)), yy, xx, inb


def _chunked(fun, n, budget_elems, patch_elems, *arrays):
    """Apply ``fun`` over keypoint chunks sized to a memory budget and
    concatenate the results along axis 0."""
    chunk = max(1, int(budget_elems // max(patch_elems, 1)))
    if n <= chunk:
        return fun(*arrays)
    outs = []
    for i in range(0, n, chunk):
        outs.append(fun(*[a[i:i + chunk] for a in arrays]))
    if isinstance(outs[0], list):
        return [x for o in outs for x in o]
    return np.concatenate(outs, axis=0)


def _orientations(grad_mag, grad_ori, y, x, sigma_oct, delta):
    """Chunked driver for :func:`_orientations_impl` (bounds peak memory on
    large keypoint sets)."""
    n = len(y)
    if n == 0:
        return []
    r = int(round(3 * LAMBDA_ORI * float(np.max(sigma_oct))))
    return _chunked(
        lambda yy, xx, ss: _orientations_impl(grad_mag, grad_ori, yy, xx, ss),
        n, 8_000_000, (2 * r + 1) ** 2, y, x, np.asarray(sigma_oct))


def _hist_peaks(hist):
    """Orientation angles from smoothed 36-bin histograms (host, tiny):
    local maxima >= 0.8 * max, parabolic bin refinement."""
    n = len(hist)
    mx = hist.max(axis=1, keepdims=True)
    hp = np.roll(hist, 1, axis=1)
    hn = np.roll(hist, -1, axis=1)
    peak = (hist > hp) & (hist > hn) & (hist >= 0.8 * mx) & (mx > 0)
    den = hp + hn - 2 * hist
    with np.errstate(divide='ignore', invalid='ignore'):
        db = np.where(den != 0, (hp - hn) / (2 * den), 0.0)
    theta = 2 * np.pi * (np.arange(N_BINS)[None, :] + 0.5 + db) / N_BINS
    theta = np.where(theta <= np.pi, theta, theta - 2 * np.pi)
    return [theta[i][peak[i]] for i in range(n)]



def _orientations_impl(grad_mag, grad_ori, y, x, sigma_oct):
    """Principal orientations of keypoints from a 36-bin gradient histogram
    (IPOL: 3*lambda_ori*sigma window, 6x circular box smoothing, 0.8 gate,
    parabolic bin refinement).  Batched over keypoints: one shared patch
    radius (the per-octave max), per-keypoint gaussian weights.
    Returns a list of arrays of angles per kp."""
    n = len(y)
    r = int(round(3 * LAMBDA_ORI * float(np.max(sigma_oct))))
    m, yy, xx, inb = _extract_patches(grad_mag, np.rint(y), np.rint(x), r)
    o = _extract_patches(grad_ori, np.rint(y), np.rint(x), r)[0]

    d2 = ((yy - y[:, None, None]) ** 2 + (xx - x[:, None, None]) ** 2)
    sig = np.asarray(sigma_oct)[:, None, None]
    w = np.exp(-d2 / (2 * (LAMBDA_ORI * sig) ** 2)) * m
    # per-keypoint square window of half-width 3*lambda_ori*sigma
    win = np.maximum(np.abs(yy - np.rint(y)[:, None, None]),
                     np.abs(xx - np.rint(x)[:, None, None]))
    w = np.where((win <= np.rint(3 * LAMBDA_ORI * sig)) & inb, w, 0.0)

    bins = np.rint(N_BINS / (2 * np.pi) * (o % (2 * np.pi))).astype(np.int64) % N_BINS
    flat = (np.arange(n)[:, None, None] * N_BINS + bins).ravel()
    hist = np.bincount(flat, weights=w.ravel(),
                       minlength=n * N_BINS).reshape(n, N_BINS)
    for _ in range(6):
        hist = (np.roll(hist, 1, axis=1) + hist + np.roll(hist, -1, axis=1)) / 3.0

    mx = hist.max(axis=1, keepdims=True)
    hp = np.roll(hist, 1, axis=1)
    hn = np.roll(hist, -1, axis=1)
    peak = (hist > hp) & (hist > hn) & (hist >= 0.8 * mx) & (mx > 0)
    den = hp + hn - 2 * hist
    with np.errstate(divide='ignore', invalid='ignore'):
        db = np.where(den != 0, (hp - hn) / (2 * den), 0.0)
    theta = 2 * np.pi * (np.arange(N_BINS)[None, :] + 0.5 + db) / N_BINS
    theta = np.where(theta <= np.pi, theta, theta - 2 * np.pi)

    out = []
    for i in range(n):
        out.append(theta[i][peak[i]])
    return out


# SIFT execution placement: 'auto' (device iff the default backend is a
# TPU), 'device', or 'host'.  Set from Config.sift_device by the pipeline
# driver (pipeline.main) so the choice is part of the config snapshot;
# not an environment variable.
_DEVICE_MODE = 'auto'


def set_device_mode(mode: str):
    """Select the SIFT execution path ('auto' | 'device' | 'host')."""
    global _DEVICE_MODE
    if mode not in ('auto', 'device', 'host'):
        raise ValueError(f'unknown sift_device mode {mode!r}')
    _DEVICE_MODE = mode


def _use_device_sift():
    if _DEVICE_MODE == 'device':
        return True
    if _DEVICE_MODE == 'host':
        return False
    import jax
    return jax.default_backend() == 'tpu'


def _descriptors_batch(grad_mag, grad_ori, yc, xc, sigma, theta):
    """Chunked driver for the host descriptor stage."""
    n = len(yc)
    if n == 0:
        return np.zeros((0, 128), dtype=np.float32)
    lim_win = LAMBDA_DESCR * (N_HIST + 1.0) / N_HIST
    r = int(math.ceil(lim_win * float(np.max(sigma)) * math.sqrt(2.0)))
    return _chunked(
        lambda a, b, c, d: _descriptors_batch_impl(grad_mag, grad_ori, a, b, c, d),
        n, 8_000_000, (2 * r + 1) ** 2, np.asarray(yc), np.asarray(xc),
        np.asarray(sigma), np.asarray(theta))


# --------------------------------------------------------------------- #
# Device descriptor stage (TPU): patch gather by vmapped dynamic_slice +
# separable trilinear binning as batched matmuls (MXU work).  The per-job
# histogram D[u, v, o] = sum_p w_p * hat_u[p,u] * hat_v[p,v] * hat_o[p,o]
# factorizes over the three bin axes, so the scatter the host path does
# with bincount becomes four (4, P) x (P, 8) batched matmuls per chunk.
#
# Tunnel-latency discipline: a device<->host round trip through the axon
# tunnel costs ~50-100 ms regardless of size, so the per-octave drivers
# below are split into dispatch (returns device arrays immediately) and a
# single batched fetch at the end of the detection flow
# (:func:`_fetch_all`), giving 2 round trips per image instead of 2 per
# (octave, scale) group.
# --------------------------------------------------------------------- #

_DESC_CHUNK = 256


def _fetch_all(arrays):
    """Start all device->host copies, then materialize (overlaps the
    per-array tunnel latency)."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass
    return [np.asarray(a) for a in arrays]


@functools.lru_cache(maxsize=1)
def _concat_jit():
    import jax
    import jax.numpy as jnp
    return jax.jit(lambda *xs: jnp.concatenate(xs, axis=0))


def _fetch_concat(arrays):
    """Fetch MANY uniform-width device arrays as ONE device-side
    concatenation + ONE device->host copy, split back on the host.

    The tunnel charges a fixed per-request latency (~25 ms measured), so
    a 64-array wave costs ~1.8 s via _fetch_all but one round trip here;
    falls back to _fetch_all for mixed shapes/dtypes or host arrays."""
    arrs = list(arrays)
    if len(arrs) < 2:
        return _fetch_all(arrs)
    try:
        sig = {(a.shape[1:], str(a.dtype)) for a in arrs}
    except AttributeError:
        return _fetch_all(arrs)
    if len(sig) != 1:
        return _fetch_all(arrs)

    # crops round-robin over local devices: concat per device (one round
    # trip each; a single round trip on the one-chip production path)
    def dev_of(a):
        try:
            return next(iter(a.devices()))
        except Exception:
            return None
    by_dev = {}
    for i, a in enumerate(arrs):
        by_dev.setdefault(dev_of(a), []).append(i)
    out = [None] * len(arrs)
    for idxs in by_dev.values():
        if len(idxs) == 1:
            out[idxs[0]] = np.asarray(arrs[idxs[0]])
            continue
        host = np.asarray(_concat_jit()(*[arrs[i] for i in idxs]))
        k = 0
        for i in idxs:
            out[i] = host[k:k + arrs[i].shape[0]]
            k += arrs[i].shape[0]
    return out


def _descriptors_batch_impl(grad_mag, grad_ori, yc, xc, sigma, theta):
    """Batched 128-d SIFT descriptors (4x4x8, trilinear, 0.2 clip, 512
    quantization) for n (keypoint, orientation) jobs sharing one gradient
    field.  One scatter-add over all samples of all jobs."""
    n = len(yc)
    if n == 0:
        return np.zeros((0, 128), dtype=np.float32)
    lam = LAMBDA_DESCR
    lim_win = lam * (N_HIST + 1.0) / N_HIST
    r = int(math.ceil(lim_win * float(np.max(sigma)) * math.sqrt(2.0)))

    m, yy, xx, inb = _extract_patches(grad_mag, np.rint(yc), np.rint(xc), r)
    o = _extract_patches(grad_ori, np.rint(yc), np.rint(xc), r)[0]

    dy = (yy - yc[:, None, None])      # along rows ('x' in the IPOL frame)
    dx = (xx - xc[:, None, None])      # along cols ('y' in the IPOL frame)
    ct = np.cos(theta)[:, None, None]
    st = np.sin(theta)[:, None, None]
    sig = np.asarray(sigma)[:, None, None]
    u = (ct * dy + st * dx) / sig
    v = (-st * dy + ct * dx) / sig

    sel = (np.abs(u) < lim_win) & (np.abs(v) < lim_win) & inb
    # flatten to the selected samples only: the rotated support covers about
    # half of the gathered square patch
    kp_idx = np.broadcast_to(np.arange(n, dtype=np.int64)[:, None, None],
                             u.shape)[sel]
    m = m[sel]
    o = o[sel]
    u = u[sel]
    v = v[sel]
    w = m * np.exp(-(u * u + v * v) / (2 * lam * lam))
    ang = (o - np.asarray(theta, np.float32)[kp_idx]) % (2 * np.pi)

    cu = (u + lam) * N_HIST / (2 * lam) - 0.5
    cv = (v + lam) * N_HIST / (2 * lam) - 0.5
    co = ang * N_ORI / (2 * np.pi)
    iu0 = np.floor(cu).astype(np.int64)
    iv0 = np.floor(cv).astype(np.int64)
    io0 = np.floor(co).astype(np.int64)
    fu = (cu - iu0).astype(np.float64)
    fv = (cv - iv0).astype(np.float64)
    fo = (co - io0).astype(np.float64)

    desc = np.zeros(n * N_HIST * N_HIST * N_ORI)
    for du, wu in ((0, 1 - fu), (1, fu)):
        uu = iu0 + du
        mu = (uu >= 0) & (uu < N_HIST)
        for dv, wv in ((0, 1 - fv), (1, fv)):
            vv = iv0 + dv
            mv = mu & (vv >= 0) & (vv < N_HIST)
            for do, wo in ((0, 1 - fo), (1, fo)):
                oo = (io0 + do) % N_ORI
                # IPOL flattening order: (u-cell, v-cell, orientation)
                flat = ((kp_idx * N_HIST + uu) * N_HIST + vv) * N_ORI + oo
                wgt = (w * wu * wv * wo)[mv]
                desc += np.bincount(flat[mv], weights=wgt,
                                    minlength=len(desc))

    desc = desc.reshape(n, 128)
    nrm = np.linalg.norm(desc, axis=1, keepdims=True)
    desc = np.minimum(desc, 0.2 * nrm)
    nrm2 = np.linalg.norm(desc, axis=1, keepdims=True)
    with np.errstate(invalid='ignore', divide='ignore'):
        q = np.minimum(np.floor(512.0 * desc / nrm2), 255.0)
    q[~np.isfinite(q)] = 0.0
    return q.astype(np.float32)


def _describe_group_host(grp):
    """Host orientation + descriptor stages for one (octave, scale) group:
    returns (job_kp indices, job_theta, desc (m, 128))."""
    v = grp['g']
    gy = np.zeros_like(v)      # d/d(row)
    gx = np.zeros_like(v)      # d/d(col)
    gy[1:-1, :] = 0.5 * (v[2:, :] - v[:-2, :])
    gx[:, 1:-1] = 0.5 * (v[:, 2:] - v[:, :-2])
    gmag = np.hypot(gx, gy)
    # IPOL axis convention: the first image axis is 'x' (rows), so the
    # reference orientation is atan2(d/dcol, d/drow)
    gori = np.arctan2(gx, gy)

    ys, xs, sigma_oct = grp['ys'], grp['xs'], grp['sigma_oct']
    oris = _orientations(gmag, gori, ys, xs, sigma_oct, grp['delta'])
    job_kp = np.array([i for i, a in enumerate(oris) for _ in a],
                      dtype=np.int64)
    job_theta = np.array([t for a in oris for t in a], dtype=np.float64)
    if len(job_kp) == 0:
        return job_kp, job_theta, np.zeros((0, 128), np.float32)
    descs = _descriptors_batch(gmag, gori, ys[job_kp], xs[job_kp],
                               sigma_oct[job_kp], job_theta)
    return job_kp, job_theta, descs


@functools.lru_cache(maxsize=2)
def _jit_dense():
    import jax

    def dense(img, n_oct, n_spo):
        return _build_scale_space(img, n_oct, n_spo)
    return dense


def keypoints_from_array(arr, thresh_dog=0.0133, n_octaves=8, n_scales=3,
                         offset=None):
    """Detect SIFT keypoints + descriptors on a 2D array.

    Returns (n, 132) float32 rows (x, y, scale, orientation, descriptor),
    the contract of the reference ctypes wrapper (sift.py:33-82).
    """
    if _use_device_sift():
        from .sift_tpu import keypoints_from_array_tpu
        return keypoints_from_array_tpu(arr, thresh_dog, n_octaves,
                                        n_scales, offset)

    arr = np.asarray(arr, dtype=np.float32)
    octaves = _build_scale_space(arr, n_octaves, n_scales)

    groups = []
    for (g, dog, delta) in octaves:
        dog_np = np.asarray(dog)
        # pre-filter weak extrema before interpolation (IPOL 0.8 * C_DoG)
        mask = np.asarray(_extrema_mask(dog)) & (np.abs(dog_np) >= 0.8 * thresh_dog)
        cand = np.argwhere(mask)
        if len(cand) == 0:
            continue
        pos, off, val = _refine_candidates(dog_np, cand, thresh_dog)
        if len(pos) == 0:
            continue

        g_np = np.asarray(g)
        for s_idx in range(1, n_scales + 1 + 1):
            sel = pos[:, 0] == s_idx
            if not sel.any():
                continue
            ys = pos[sel, 1] + off[sel, 1]
            xs = pos[sel, 2] + off[sel, 2]
            ss = pos[sel, 0] + off[sel, 0]
            sigma = delta / DELTA_MIN * SIGMA_MIN * 2.0 ** (ss / n_scales)
            groups.append(dict(g=g_np[s_idx], delta=delta, ys=ys, xs=xs,
                               sigma=sigma, sigma_oct=sigma / delta))

    described = [_describe_group_host(grp) for grp in groups]

    rows = []
    for grp, (job_kp, job_theta, descs) in zip(groups, described):
        if len(job_kp) == 0:
            continue
        heads = np.column_stack([grp['xs'][job_kp] * grp['delta'],
                                 grp['ys'][job_kp] * grp['delta'],
                                 grp['sigma'][job_kp], job_theta])
        rows.append(np.hstack([heads, descs]))

    if not rows:
        return np.zeros((0, 132), dtype=np.float32)
    kp = np.vstack(rows).astype(np.float32)
    if offset is not None:
        kp[:, 0] += offset[0]
        kp[:, 1] += offset[1]
    return kp


def image_keypoints(img, x, y, w, h, max_nb=None, thresh_dog=0.0133,
                    n_octaves=8, n_scales=3):
    """Keypoints of a window of a (full) image array
    (reference sift.py:85-114 contract, ROI clipped to the image)."""
    img = np.asarray(img)
    if x < 0:
        w += x
        x = 0
    if y < 0:
        h += y
        y = 0
    w = min(w, img.shape[1] - x)
    h = min(h, img.shape[0] - y)
    kp = keypoints_from_array(img[int(y):int(y + h), int(x):int(x + w)],
                              thresh_dog, n_octaves, n_scales,
                              offset=(int(x), int(y)))
    if max_nb is not None:
        kp = kp[:max_nb]
    return kp


# --------------------------------------------------------------------- #
# Matching
# --------------------------------------------------------------------- #

@functools.lru_cache(maxsize=16)
def _match_kernel_jit():
    import jax
    import jax.numpy as jnp

    def kernel(k1, k2, n1, n2, fc, gate):
        """Nearest + second-nearest descriptor distances with the epipolar
        gate applied inside the search (the reference C matcher contract,
        sift.py:189-237).  The (N1, N2) distance matrix lives only on
        device; outputs are three (N1,) vectors."""
        d1 = k1[:, 4:]
        d2 = k2[:, 4:]
        sq = (jnp.sum(d1 * d1, axis=1)[:, None]
              + jnp.sum(d2 * d2, axis=1)[None, :]
              - 2.0 * jnp.dot(d1, d2.T, preferred_element_type=jnp.float32))
        sq = jnp.maximum(sq, 0.0)
        lin = (fc[0] * k2[None, :, 0] + fc[1] * k2[None, :, 1]
               + (fc[2] * k1[:, 0] + fc[3] * k1[:, 1] + fc[4])[:, None])
        big = jnp.float32(jnp.inf)
        cols = jnp.arange(k2.shape[0])[None, :]
        sq = jnp.where((jnp.abs(lin) > gate) | (cols >= n2), big, sq)
        nn = jnp.argmin(sq, axis=1)
        best = jnp.min(sq, axis=1)
        sq2 = jnp.where(cols == nn[:, None], big, sq)
        second = jnp.min(sq2, axis=1)
        # one (N1, 3) output: a wave of pairs fetches as ONE concat copy
        # (nn < 2^24 is exact in f32)
        return jnp.stack([nn.astype(jnp.float32), best, second], axis=1)

    return jax.jit(kernel)


@functools.lru_cache(maxsize=1)
def _match_kernel_split_jit():
    """The match kernel with (x, y, scale, theta) heads and 128-d
    descriptors as SEPARATE operands, so device-resident descriptor
    chunks feed it without a host round trip.  Same math and outputs as
    _match_kernel_jit (heads supply the epipolar line, descriptors the
    distances)."""
    import jax
    import jax.numpy as jnp

    def kernel(meta1, d1, meta2, d2, n1, n2, fc, gate):
        sq = (jnp.sum(d1 * d1, axis=1)[:, None]
              + jnp.sum(d2 * d2, axis=1)[None, :]
              - 2.0 * jnp.dot(d1, d2.T, preferred_element_type=jnp.float32))
        sq = jnp.maximum(sq, 0.0)
        lin = (fc[0] * meta2[None, :, 0] + fc[1] * meta2[None, :, 1]
               + (fc[2] * meta1[:, 0] + fc[3] * meta1[:, 1]
                  + fc[4])[:, None])
        big = jnp.float32(jnp.inf)
        cols = jnp.arange(d2.shape[0])[None, :]
        sq = jnp.where((jnp.abs(lin) > gate) | (cols >= n2), big, sq)
        nn = jnp.argmin(sq, axis=1)
        best = jnp.min(sq, axis=1)
        sq2 = jnp.where(cols == nn[:, None], big, sq)
        second = jnp.min(sq2, axis=1)
        return jnp.stack([nn.astype(jnp.float32), best, second], axis=1)

    return jax.jit(kernel)


@functools.lru_cache(maxsize=32)
def _pad_concat_jit(N: int):
    """Device-side concatenate + slice/pad of descriptor chunks to N
    rows (rows beyond the true count are garbage either way -- the match
    kernel masks them)."""
    import jax
    import jax.numpy as jnp

    def f(*chunks):
        cat = jnp.concatenate(chunks, axis=0) if len(chunks) > 1 \
            else chunks[0]
        if cat.shape[0] >= N:
            return cat[:N]
        return jnp.pad(cat, ((0, N - cat.shape[0]), (0, 0)))

    return jax.jit(f)


def _match_device(k1, k2, fc, gate, bucket=2048):
    """Bucket-padded device driver for the matching kernel."""
    n1, n2 = len(k1), len(k2)
    N1 = -(-n1 // bucket) * bucket
    N2 = -(-n2 // bucket) * bucket
    k1p = np.zeros((N1, k1.shape[1]), np.float32)
    k2p = np.zeros((N2, k2.shape[1]), np.float32)
    k1p[:n1] = k1
    k2p[:n2] = k2
    out = np.asarray(_match_kernel_jit()(k1p, k2p, n1, n2,
                                         fc.astype(np.float32),
                                         np.float32(gate)))[:n1]
    return (out[:, 0].astype(np.int64), out[:, 1], out[:, 2])

def keypoints_match(k1, k2, method='relative', sift_thresh=0.6, F=None,
                    epipolar_threshold=10, model=None, ransac_max_err=0.3):
    """Match two keypoint sets: epipolar-gated nearest-neighbor with ratio /
    absolute test, then optional RANSAC fundamental-matrix inlier filter.

    Parity: reference sift.py:145-237 (the C matcher applies the epipolar
    gate INSIDE the neighbor search, using the 5-coefficient affine F).
    The descriptor distances are one (n1, n2) matmul -- MXU work.
    """
    k1 = np.asarray(k1, dtype=np.float32)
    k2 = np.asarray(k2, dtype=np.float32)
    if len(k1) == 0 or len(k2) == 0:
        return np.zeros((0, 4), dtype=np.float32)

    if F is not None:
        Fm = np.asarray(F, dtype=np.float64)
        fc = np.array([Fm[0, 2], Fm[1, 2], Fm[2, 0], Fm[2, 1], Fm[2, 2]],
                      dtype=np.float32)
        gate = float(epipolar_threshold * math.hypot(fc[0], fc[1]))
    else:
        fc = np.zeros(5, dtype=np.float32)
        gate = float('inf')

    if _use_device_sift():
        nn, best, second = _match_device(k1, k2, fc, gate)
    else:
        # host BLAS distance matrix
        d1 = k1[:, 4:]
        d2 = k2[:, 4:]
        sq = (np.einsum('ij,ij->i', d1, d1)[:, None]
              + np.einsum('ij,ij->i', d2, d2)[None, :] - 2.0 * (d1 @ d2.T))
        np.maximum(sq, 0.0, out=sq)
        if F is not None:
            lin = (fc[0] * k2[None, :, 0] + fc[1] * k2[None, :, 1]
                   + (fc[2] * k1[:, 0] + fc[3] * k1[:, 1] + fc[4])[:, None])
            sq[np.abs(lin) > gate] = np.inf
        nn = np.argmin(sq, axis=1)
        best = sq[np.arange(len(sq)), nn]
        sq[np.arange(len(sq)), nn] = np.inf
        second = np.min(sq, axis=1)

    if method == 'relative':
        ok = np.sqrt(best) < sift_thresh * np.sqrt(second)
    else:
        ok = np.sqrt(best) < sift_thresh
    ok &= np.isfinite(best)

    matches = np.column_stack([k1[ok, 0], k1[ok, 1],
                               k2[nn[ok], 0], k2[nn[ok], 1]]).astype(np.float32)

    if model == 'fundamental' and len(matches) >= 7:
        inliers, _ = ransac_fundamental_matrix(matches, ntrials=1000,
                                               max_err=ransac_max_err)
        matches = matches[inliers]
    return matches


def ransac_fundamental_matrix(matches, ntrials=1000, max_err=0.3, seed=0):
    """RANSAC F-matrix inlier search (replaces the pip ``ransac`` package,
    reference sift.py:181-185): normalized 8-point minimal solver, symmetric
    epipolar distance, best-consensus model refit on inliers."""
    m = np.asarray(matches, dtype=np.float64)
    n = len(m)
    rng = np.random.RandomState(seed)
    p1 = np.column_stack([m[:, 0:2], np.ones(n)])
    p2 = np.column_stack([m[:, 2:4], np.ones(n)])

    def eight_point(sub):
        a = sub[:, 0:2]
        b = sub[:, 2:4]

        def normalize(p):
            c = p.mean(axis=0)
            s = np.sqrt(2) / max(np.mean(np.linalg.norm(p - c, axis=1)), 1e-12)
            T = np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1]])
            return (p - c) * s, T

        an, Ta = normalize(a)
        bn, Tb = normalize(b)
        X = np.column_stack([
            bn[:, 0] * an[:, 0], bn[:, 0] * an[:, 1], bn[:, 0],
            bn[:, 1] * an[:, 0], bn[:, 1] * an[:, 1], bn[:, 1],
            an[:, 0], an[:, 1], np.ones(len(sub))])
        f = np.linalg.svd(X)[2][-1].reshape(3, 3)
        U, S, Vt = np.linalg.svd(f)
        f = U @ np.diag([S[0], S[1], 0.0]) @ Vt
        return Tb.T @ f @ Ta

    def epi_errors(F):
        l2 = p1 @ F.T          # lines in image 2
        l1 = p2 @ F            # lines in image 1
        num = np.abs(np.sum(p2 * l2, axis=1))
        d2 = num / np.hypot(l2[:, 0], l2[:, 1])
        d1 = num / np.hypot(l1[:, 0], l1[:, 1])
        return np.maximum(d1, d2)

    # draw every trial's subset with the EXACT RandomState consumption of
    # the original per-trial loop (bitwise-stable inlier sets), then solve
    # all eight-point problems as one batched LAPACK call -- the Python
    # loop of 1000 small SVDs was ~0.25 s per pair (stage-1 probe)
    k = min(8, n)
    subs_idx = np.stack([rng.choice(n, size=k, replace=False)
                         for _ in range(ntrials)])
    try:
        a = m[subs_idx][:, :, 0:2]                     # (T, k, 2)
        b = m[subs_idx][:, :, 2:4]

        def normalize_b(p):
            c = p.mean(axis=1, keepdims=True)          # (T, 1, 2)
            d = np.linalg.norm(p - c, axis=2).mean(axis=1)
            s = np.sqrt(2) / np.maximum(d, 1e-12)      # (T,)
            return (p - c) * s[:, None, None], c[:, 0], s

        an, ca, sa = normalize_b(a)
        bn, cb, sb = normalize_b(b)
        one = np.ones((ntrials, k))
        X = np.stack([
            bn[:, :, 0] * an[:, :, 0], bn[:, :, 0] * an[:, :, 1],
            bn[:, :, 0],
            bn[:, :, 1] * an[:, :, 0], bn[:, :, 1] * an[:, :, 1],
            bn[:, :, 1],
            an[:, :, 0], an[:, :, 1], one], axis=2)    # (T, k, 9)
        f = np.linalg.svd(X)[2][:, -1].reshape(ntrials, 3, 3)
        U, S, Vt = np.linalg.svd(f)
        S = S.copy()
        S[:, 2] = 0.0
        f = U * S[:, None, :] @ Vt                     # rank-2 projection
        Ta = np.zeros((ntrials, 3, 3))
        Tb = np.zeros((ntrials, 3, 3))
        for T_, c, s in ((Ta, ca, sa), (Tb, cb, sb)):
            T_[:, 0, 0] = s
            T_[:, 1, 1] = s
            T_[:, 0, 2] = -s * c[:, 0]
            T_[:, 1, 2] = -s * c[:, 1]
            T_[:, 2, 2] = 1.0
        Fs = np.transpose(Tb, (0, 2, 1)) @ f @ Ta      # (T, 3, 3)

        l2 = np.einsum('nj,tij->tni', p1, Fs)          # p1 @ F.T per trial
        l1 = np.einsum('nj,tji->tni', p2, Fs)          # p2 @ F per trial
        num = np.abs(np.einsum('nj,tnj->tn', p2, l2))
        d2 = num / np.hypot(l2[:, :, 0], l2[:, :, 1])
        d1 = num / np.hypot(l1[:, :, 0], l1[:, :, 1])
        with np.errstate(invalid='ignore'):
            inls = np.maximum(d1, d2) < max_err        # (T, n)
        counts = inls.sum(axis=1)
        best_t = int(np.argmax(counts))                # first max, like the
        best_count = int(counts[best_t])               # loop's strict '>'
        best_inl = inls[best_t]
    except np.linalg.LinAlgError:
        # rare degenerate batch: fall back to the per-trial loop
        best_count = -1
        best_inl = np.zeros(n, dtype=bool)
        for t in range(ntrials):
            try:
                F = eight_point(m[subs_idx[t]])
            except np.linalg.LinAlgError:
                continue
            inl = epi_errors(F) < max_err
            cnt = int(inl.sum())
            if cnt > best_count:
                best_count = cnt
                best_inl = inl
    if best_count >= 8:
        F = eight_point(m[best_inl])
    else:
        F = None
    return np.where(best_inl)[0], F


def _clip_roi(img, x, y, w, h):
    """Clip an ROI to the image extent (the image_keypoints contract)."""
    if x < 0:
        w += x
        x = 0
    if y < 0:
        h += y
        y = 0
    w = min(w, img.shape[1] - x)
    h = min(h, img.shape[0] - y)
    return int(x), int(y), int(w), int(h)


def _match_finish(k1, k2, nn, best, second, method, sift_thresh,
                  ransac_max_err=0.3):
    """Host tail of keypoints_match: ratio/absolute test + RANSAC."""
    if method == 'relative':
        ok = np.sqrt(best) < sift_thresh * np.sqrt(second)
    else:
        ok = np.sqrt(best) < sift_thresh
    ok &= np.isfinite(best)
    matches = np.column_stack([k1[ok, 0], k1[ok, 1],
                               k2[nn[ok], 0], k2[nn[ok], 1]]) \
        .astype(np.float32)
    if len(matches) >= 7:
        inliers, _ = ransac_fundamental_matrix(matches, ntrials=1000,
                                               max_err=ransac_max_err)
        matches = matches[inliers]
    return matches


def matches_on_rpc_roi_batch(jobs):
    """Stage-1 batch driver: SIFT matches for MANY (tile, pair) jobs.

    Per-job results equal :func:`matches_on_rpc_roi` (same detection,
    matching, retry, and RANSAC per job); the work is re-ordered
    breadth-first so the whole batch shares each device round trip:
    one pipelined multi-crop detection wave
    (:func:`s2p_tpu.ops.sift_tpu.keypoints_from_arrays_tpu`), one match
    dispatch+fetch wave, then the host RANSAC fan-out on threads.  The
    DoG-threshold halving retry (reference sift.py:268-278) re-enters the
    wave with only the failed jobs.

    Args:
        jobs: list of dicts with keys im1, im2, rpc1, rpc2, x, y, w, h,
            method, sift_thresh, epipolar_threshold, alt_kwargs.

    Returns:
        list of (n, 4) match arrays (None where no matches were found).
    """
    from ..core import estimation, rpc_geom

    n_jobs = len(jobs)
    metas = []
    for j in jobs:
        x, y, w, h = j['x'], j['y'], j['w'], j['h']
        kw = j.get('alt_kwargs', {})
        x2, y2, w2, h2 = rpc_geom.corresponding_roi(
            j['rpc1'], j['rpc2'], x, y, w, h, **kw)
        rpc_matches = rpc_geom.matches_from_rpc(
            j['rpc1'], j['rpc2'], x, y, w, h, 5, **kw)
        F = estimation.affine_fundamental_matrix(rpc_matches)
        roi1 = _clip_roi(j['im1'], x, y, w, h)
        roi2 = _clip_roi(j['im2'], x2, y2, w2, h2)
        metas.append(dict(F=F, roi1=roi1, roi2=roi2))

    results = [None] * n_jobs
    pending = list(range(n_jobs))
    thresh_dog = {k: 0.0133 for k in pending}
    use_device = _use_device_sift()
    import os as _os
    timing = bool(_os.environ.get('S2P_TPU_SIFT_TIMING'))
    t_last = time.perf_counter()

    def tick(label):
        nonlocal t_last
        now = time.perf_counter()
        if timing:
            print(f'    stage1 {label}: {now - t_last:.2f} s', flush=True)
        t_last = now

    for _ in range(2):
        if not pending:
            break
        # process pending jobs in chunks: a chunk's crops live on the host
        # (and, staged, on device) at once -- 64 jobs = 128 crops bounds
        # that at a few hundred MB for full-size tiles
        finished = {}
        for c0 in range(0, len(pending), 64):
            _run_match_chunk(jobs, metas, pending[c0:c0 + 64], thresh_dog,
                             use_device, finished, tick)
        still = []
        for k in pending:
            m = finished[k]
            if m is not None and m.ndim == 2 and m.shape[0] > 10:
                results[k] = m
            else:
                thresh_dog[k] /= 2.0
                still.append(k)
        pending = still

    if pending:
        import warnings
        warnings.warn('sift.matches_on_rpc_roi_batch: found no matches for '
                      f'{len(pending)} tile pair(s)')
    return results


def _run_match_chunk(jobs, metas, chunk, thresh_dog, use_device, finished,
                     tick):
    """One detection + match + RANSAC wave over a chunk of pending jobs
    (the body of matches_on_rpc_roi_batch's attempt loop); fills
    ``finished[k]`` per job."""
    # detection wave: 2 crops per pending job
    crops, offs, ths = [], [], []
    for k in chunk:
        for img, (x, y, w, h) in ((jobs[k]['im1'], metas[k]['roi1']),
                                  (jobs[k]['im2'], metas[k]['roi2'])):
            crops.append(np.ascontiguousarray(
                img[y:y + h, x:x + w], dtype=np.float32))
            offs.append((x, y))
            ths.append(thresh_dog[k])
    if use_device:
        from .sift_tpu import keypoints_from_arrays_tpu
        # descriptors never leave the device: detection returns host
        # (x, y, scale, theta) heads + device descriptor chunks, and the
        # match kernel consumes the chunks in place (the ~0.5 KB/keypoint
        # descriptor stream is stage 1's dominant d2h volume)
        kps = keypoints_from_arrays_tpu(crops, ths, offs, device_desc=True)
    else:
        kps = [keypoints_from_array(c, t, offset=o)
               for c, t, o in zip(crops, ths, offs)]
    tick(f'detection wave ({len(crops)} crops)')

    # match wave: dispatch every pair's kernel, then fetch together
    match_in = []
    for idx, k in enumerate(chunk):
        k1, k2 = kps[2 * idx], kps[2 * idx + 1]
        Fm = np.asarray(metas[k]['F'], dtype=np.float64)
        fc = np.array([Fm[0, 2], Fm[1, 2], Fm[2, 0], Fm[2, 1],
                       Fm[2, 2]], dtype=np.float32)
        gate = float(jobs[k]['epipolar_threshold']
                     * math.hypot(fc[0], fc[1]))
        match_in.append((k, k1, k2, fc, gate))

    if use_device:
        bucket = 2048
        handles = []
        for k, m1, m2, fc, gate in match_in:
            n1, n2 = m1['count'], m2['count']
            if n1 == 0 or n2 == 0:
                handles.append(None)
                continue
            N1 = -(-n1 // bucket) * bucket
            N2 = -(-n2 // bucket) * bucket
            meta1 = np.zeros((N1, 4), np.float32)
            meta2 = np.zeros((N2, 4), np.float32)
            meta1[:n1] = m1['meta']
            meta2[:n2] = m2['meta']
            d1 = _pad_concat_jit(N1)(*m1['desc_chunks'])
            d2 = _pad_concat_jit(N2)(*m2['desc_chunks'])
            dev1, dev2 = (next(iter(d.devices())) for d in (d1, d2))
            if dev1 != dev2:      # safety net; detection co-places pairs
                import jax
                d2 = jax.device_put(d2, dev1)
            handles.append(_match_kernel_split_jit()(
                meta1, d1, meta2, d2, n1, n2, fc, np.float32(gate)))
        flat = [h for h in handles if h is not None]
        fetched = iter(_fetch_concat(flat))
        tick(f'match wave ({len(match_in)} pairs)')
        todo = []
        for (k, m1, m2, fc, gate), h in zip(match_in, handles):
            if h is None:
                finished[k] = np.zeros((0, 4), np.float32)
                continue
            out = next(fetched)[:m1['count']]
            todo.append((k, m1, m2, out))
        # the per-pair RANSAC is vectorized numpy (GIL-releasing linalg):
        # fan it out instead of running 0.2-0.3 s per pair serially
        import concurrent.futures as _cf
        with _cf.ThreadPoolExecutor(max_workers=min(8, max(1, len(todo)))) \
                as ex:
            for k, m in zip((k for k, *_ in todo), ex.map(
                    lambda t: _match_finish(
                        t[1]['meta'], t[2]['meta'],
                        t[3][:, 0].astype(np.int64), t[3][:, 1], t[3][:, 2],
                        jobs[t[0]]['method'], jobs[t[0]]['sift_thresh']),
                    todo)):
                finished[k] = m
    else:
        for k, k1, k2, fc, gate in match_in:
            finished[k] = keypoints_match(
                k1, k2, jobs[k]['method'], jobs[k]['sift_thresh'],
                metas[k]['F'],
                epipolar_threshold=jobs[k]['epipolar_threshold'],
                model='fundamental')
    tick('ransac/finish')


def matches_on_rpc_roi(im1, im2, rpc1, rpc2, x, y, w, h, method='relative',
                       sift_thresh=0.6, epipolar_threshold=10, **alt_kwargs):
    """SIFT matches between two full images over an ROI of the first.

    Parity: reference sift.py:240-282 (corresponding ROI via RPC, affine F
    gate, DoG-threshold halving retry, RANSAC inlier filter).
    """
    from ..core import estimation, rpc_geom

    if _use_device_sift():
        # one code path: the batch driver with a single job shares the
        # device machinery (paired detection wave, device-resident
        # descriptor matching).  The INDEPENDENT per-pair flow survives
        # as _matches_on_rpc_roi_independent so the batch==single
        # pinning test compares two distinct implementations.
        return matches_on_rpc_roi_batch([dict(
            im1=im1, im2=im2, rpc1=rpc1, rpc2=rpc2, x=x, y=y, w=w, h=h,
            method=method, sift_thresh=sift_thresh,
            epipolar_threshold=epipolar_threshold,
            alt_kwargs=alt_kwargs)])[0]
    return _matches_on_rpc_roi_independent(
        im1, im2, rpc1, rpc2, x, y, w, h, method, sift_thresh,
        epipolar_threshold, **alt_kwargs)


def _matches_on_rpc_roi_independent(im1, im2, rpc1, rpc2, x, y, w, h,
                                    method='relative', sift_thresh=0.6,
                                    epipolar_threshold=10, **alt_kwargs):
    """The original per-pair flow (sequential crop detections +
    keypoints_match + retry), kept as an implementation INDEPENDENT of
    the batch driver: the batched==single pinning test compares against
    this, and the host (non-device) public path runs it."""
    from ..core import estimation, rpc_geom

    x2, y2, w2, h2 = rpc_geom.corresponding_roi(rpc1, rpc2, x, y, w, h,
                                                **alt_kwargs)
    rpc_matches = rpc_geom.matches_from_rpc(rpc1, rpc2, x, y, w, h, 5,
                                            **alt_kwargs)
    F = estimation.affine_fundamental_matrix(rpc_matches)

    thresh_dog = 0.0133
    for _ in range(2):
        p1 = image_keypoints(im1, x, y, w, h, thresh_dog=thresh_dog)
        p2 = image_keypoints(im2, x2, y2, w2, h2, thresh_dog=thresh_dog)
        matches = keypoints_match(p1, p2, method, sift_thresh, F,
                                  epipolar_threshold=epipolar_threshold,
                                  model='fundamental')
        if matches is not None and matches.ndim == 2 and matches.shape[0] > 10:
            return matches
        thresh_dog /= 2.0
    import warnings
    warnings.warn('sift.matches_on_rpc_roi: found no matches')
    return None
