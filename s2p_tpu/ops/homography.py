"""Homography algebra and image warps.

Host helpers are numpy float64 (applied to small point sets); the dense warp
delegates to the JAX resampler in :mod:`s2p_tpu.ops.interp`.
"""

from __future__ import annotations

import functools

import numpy as np


def matrix_translation(x, y):
    """3x3 translation matrix (parity: reference common.py:97-101)."""
    t = np.eye(3)
    t[0, 2] = x
    t[1, 2] = y
    return t


def points_apply_homography(H, pts):
    """Apply a 3x3 homography to an (n, 2) list of points.

    Parity: reference common.py:183-211.
    """
    pts = np.asarray(pts, dtype=np.float64)
    if pts.ndim == 1:
        pts = pts[None, :]
    ones = np.ones((len(pts), 1))
    hp = np.hstack([pts[:, :2], ones]) @ np.asarray(H, dtype=np.float64).T
    return hp[:, :2] / hp[:, 2:3]


def bounding_box2D(pts):
    """(xmin, ymin, width, height) of a point list (common.py:214-221)."""
    pts = np.asarray(pts, dtype=np.float64)
    mins = pts.min(axis=0)
    maxs = pts.max(axis=0)
    return mins[0], mins[1], maxs[0] - mins[0], maxs[1] - mins[1]


def _spline5_inputs(img):
    """Host-side quintic spline prefilter (separable IIR, scipy) + NaN mask.

    The IIR prefilter would smear NaNs over whole rows/columns, so NaNs are
    zero-filled for filtering and tracked in a mask that the device sampler
    uses to re-invalidate any output whose 6x6 support touches one.
    """
    from scipy import ndimage
    img = np.asarray(img, dtype=np.float32)
    nan = ~np.isfinite(img)
    coeffs = ndimage.spline_filter(np.nan_to_num(img), order=5,
                                   mode='mirror', output=np.float32)
    mask = nan.astype(np.float32) if nan.any() else None
    return coeffs, mask


def image_apply_homography(img, H, w, h, order=5):
    """Warp an image array under homography H to a (h, w) output.

    out(x) = img(H^-1 x) -- the in-memory equivalent of the reference's
    ``homography`` binary invocation (common.py:159-180).  The default
    order-5 prefiltered B-spline matches the binary's interpolation
    (measured median |err| 0.25 intensity units on the reference's own
    rectified output vs 1.02 for bicubic).
    """
    import numpy as np
    from .interp import warp_homography
    hinv = np.linalg.inv(np.asarray(H, dtype=np.float64))
    src = np.asarray(img, dtype=np.float32)
    nanmask = None
    if order == 5:
        src, nanmask = _spline5_inputs(src)
    out = warp_homography(src, hinv.astype(np.float32), int(w), int(h),
                          order=order, nanmask=nanmask)
    return np.asarray(out)


@functools.lru_cache(maxsize=32)
def _warp_batch_jit(src_shape, hb, wb, order, masked):
    """Jitted batch warp: one compile per (source shape, output bucket);
    the homographies are traced, so every tile of a scene shares it."""
    import jax

    from .interp import warp_homography

    def fn(img, nanmask, hinvs):
        return jax.vmap(
            lambda hv: warp_homography(img, hv, wb, hb, order=order,
                                       nanmask=nanmask if masked else None)
        )(hinvs)

    return jax.jit(fn)


def warp_jobs_batched(jobs, order=5):
    """Warp many (img, H, w, h) jobs as vmapped device programs.

    Jobs sharing a source image and an output-shape bucket run as ONE
    program (the homography is a traced (3, 3) input); the spline
    prefilter runs once per distinct source array and its coefficients are
    uploaded once.  Because the warp is pointwise in output pixels,
    bucket padding + crop is bitwise identical to the per-job
    :func:`image_apply_homography`.  This is the stage-3 analogue of the
    batched stage-4 matcher: the reference fans per-tile ``homography``
    subprocesses over a pool (parallel.py:58-110); here the tile axis is a
    batch axis.

    Returns a list of (h, w) float32 arrays in job order.
    """
    import jax
    import numpy as np

    jobs = list(jobs)
    srcs = {}        # id(img) -> (dev_coeffs, dev_mask_or_None)
    for img, _, _, _ in jobs:
        key = id(img)
        if key in srcs:
            continue
        if order == 5:
            coeffs, mask = _spline5_inputs(np.asarray(img, dtype=np.float32))
        else:
            coeffs = np.asarray(img, dtype=np.float32)
            mask = None
        srcs[key] = (jax.device_put(coeffs),
                     None if mask is None else jax.device_put(mask))

    groups = {}      # (img_key, hb, wb) -> [(job_idx, hinv)]
    for k, (img, H, w, h) in enumerate(jobs):
        hb = -(-int(h) // 64) * 64
        wb = -(-int(w) // 128) * 128
        hinv = np.linalg.inv(np.asarray(H, dtype=np.float64)) \
            .astype(np.float32)
        groups.setdefault((id(img), hb, wb), []).append((k, hinv))

    # multi-chip: shard the batch (tile) axis over the process-local
    # devices, coefficients replicated -- same partitioning contract as
    # the batched stage-4 matcher (values unchanged: the warp is
    # independent per batch row)
    n_dev = jax.local_device_count()
    shard = repl = None
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import TileMesh
        mesh = TileMesh(devices=jax.local_devices()).mesh
        shard = NamedSharding(mesh, P('tiles'))
        repl = NamedSharding(mesh, P())
        srcs = {k: (jax.device_put(c, repl),
                    None if m is None else jax.device_put(m, repl))
                for k, (c, m) in srcs.items()}

    handles = [None] * len(jobs)
    for (key, hb, wb), all_members in groups.items():
        coeffs, mask = srcs[key]
        fn = _warp_batch_jit(tuple(coeffs.shape), hb, wb, order,
                             mask is not None)
        for i in range(0, len(all_members), 64):   # bound device memory
            members = all_members[i:i + 64]
            n = len(members)
            n_pad = 1 << max(0, (n - 1).bit_length())  # pow2 batch shapes
            n_pad = -(-max(n_pad, n_dev) // n_dev) * n_dev
            hinvs = np.stack([hv for _, hv in members]
                             + [members[0][1]] * (n_pad - n))
            if shard is not None:
                hinvs = jax.device_put(hinvs, shard)
            out = fn(coeffs, mask, hinvs)
            for row, (k, _) in enumerate(members):
                handles[k] = out[row]
    for a in handles:
        a.copy_to_host_async()
    return [np.asarray(a)[:int(h), :int(w)]
            for a, (_, _, w, h) in zip(handles, jobs)]


def image_apply_homographies(jobs, order=5):
    """Batch variant: dispatch all warps, then fetch together (one tunnel
    round-trip set instead of one blocking fetch per warp).

    jobs: iterable of (img, H, w, h); returns list of numpy arrays.
    """
    import numpy as np
    from .interp import warp_homography
    handles = []
    filtered = {}
    for img, H, w, h in jobs:
        hinv = np.linalg.inv(np.asarray(H, dtype=np.float64))
        src = np.asarray(img, dtype=np.float32)
        nanmask = None
        if order == 5:
            key = id(img)
            if key not in filtered:
                filtered[key] = _spline5_inputs(src)
            src, nanmask = filtered[key]
        handles.append(warp_homography(src, hinv.astype(np.float32), int(w),
                                       int(h), order=order, nanmask=nanmask))
    for a in handles:
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass
    return [np.asarray(a) for a in handles]
