"""3D outlier filtering of gridded point clouds.

Replaces the C routines ``count_3d_neighbors`` / ``remove_isolated_3d_points``
(/root/reference/c/disp_to_h.c:152-230) with array programs:

  * neighbor counting is a stencil reduction (jittable, runs on device),
  * the reject-then-rescue pass of the reference (a data-dependent flood
    loop) becomes a bounded iterative dilate-and-test -- a documented
    semantic variant (SURVEY.md section 7.6): each iteration un-rejects
    rejected points that touch a kept close neighbor, until fixpoint or the
    iteration cap.
"""

from __future__ import annotations

import functools

import numpy as np


def _count_neighbors_jax(xyz, r, p):
    import jax.numpy as jnp

    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]
    h, w = x.shape
    big = jnp.asarray(jnp.inf, x.dtype)
    xp = jnp.pad(x, p, constant_values=big)
    yp = jnp.pad(y, p, constant_values=big)
    zp = jnp.pad(z, p, constant_values=big)
    count = jnp.zeros_like(x, dtype=jnp.int32)
    r2 = r * r
    for dy in range(2 * p + 1):
        for dx in range(2 * p + 1):
            d2 = ((xp[dy:dy + h, dx:dx + w] - x) ** 2
                  + (yp[dy:dy + h, dx:dx + w] - y) ** 2
                  + (zp[dy:dy + h, dx:dx + w] - z) ** 2)
            count = count + (d2 < r2).astype(jnp.int32)
    return count


@functools.lru_cache(maxsize=4)
def _count_jit(r, p):
    import jax
    return jax.jit(lambda xyz: _count_neighbors_jax(xyz, r, p))


def count_3d_neighbors(xyz, r, p):
    """Number of 3D points within distance r in a (2p+1)^2 pixel window.

    Parity: reference disp_to_h.c:152-175 (the center point counts itself,
    like the C loop does).  NaN points yield count 0.
    """
    # Recenter in float64 BEFORE the float32 cast: raw UTM northings
    # (~7.7e6 m) quantize to 0.5 m steps in f32, poisoning 3D distances
    # against r of a few meters (the C code differences doubles,
    # disp_to_h.c:143-149).  Centered offsets stay sub-mm accurate in f32.
    xyz64 = np.asarray(xyz, dtype=np.float64)
    finite = np.isfinite(xyz64).all(axis=-1)
    center = (np.nanmean(np.where(finite[..., None], xyz64, np.nan),
                         axis=(0, 1)) if finite.any() else np.zeros(3))
    xyz32 = np.nan_to_num((xyz64 - center).astype(np.float32), nan=np.inf)
    xyz32[~finite] = np.inf
    out = np.array(_count_jit(float(r), int(p))(xyz32))
    out[~finite] = 0
    return out


def count_3d_neighbors_batch(xyzs, r, p):
    """Neighbor counts for MANY tiles in one vmapped device dispatch.

    Tiles pad to the max (h, w) with +inf coordinates; an inf neighbor
    contributes distance inf (never counted) exactly like the single-tile
    pad, so each cropped result is bitwise equal to
    :func:`count_3d_neighbors` on that tile alone.  This folds the
    per-tile stage-5-finish device round trips (one per tile through the
    tunnel) into one.
    """
    import jax

    xyzs = [np.asarray(a, dtype=np.float64) for a in xyzs]
    if len(xyzs) > 16:     # bound device memory on large scenes
        out = []
        for i in range(0, len(xyzs), 16):
            out.extend(count_3d_neighbors_batch(xyzs[i:i + 16], r, p))
        return out
    H = max(a.shape[0] for a in xyzs)
    W = max(a.shape[1] for a in xyzs)
    batch = np.full((len(xyzs), H, W, 3), np.inf, np.float32)
    finites = []
    for k, a in enumerate(xyzs):
        finite = np.isfinite(a).all(axis=-1)
        finites.append(finite)
        center = (np.nanmean(np.where(finite[..., None], a, np.nan),
                             axis=(0, 1)) if finite.any() else np.zeros(3))
        off = np.nan_to_num((a - center).astype(np.float32), nan=np.inf)
        off[~finite] = np.inf
        batch[k, :a.shape[0], :a.shape[1]] = off
    arg = batch
    if jax.local_device_count() > 1:
        # shard the tile axis over local devices (stage-4/5 contract)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import TileMesh
        n_dev = jax.local_device_count()
        pad = (-len(xyzs)) % n_dev
        if pad:
            arg = np.concatenate([batch, batch[:1].repeat(pad, 0)])
        mesh = TileMesh(devices=jax.local_devices()).mesh
        arg = jax.device_put(arg, NamedSharding(mesh, P('tiles')))
    counts = np.asarray(jax.vmap(_count_jit(float(r), int(p)))(arg))
    out = []
    for k, a in enumerate(xyzs):
        c = counts[k, :a.shape[0], :a.shape[1]].copy()
        c[~finites[k]] = 0
        out.append(c)
    return out


def remove_isolated_3d_points(xyz, r, p, n, q=1, max_rescue_iters=64,
                              count=None):
    """NaN-out (in place) points with < n neighbors, with rescue.

    A point is rejected when it has fewer than ``n`` 3D neighbors within
    ``r`` units inside a (2p+1)^2 window; rejected points adjacent (within a
    (2q+1)^2 window) to a kept point closer than ``r`` are rescued, and
    rescues propagate iteratively (reference disp_to_h.c:177-230; the
    reference iterates to fixpoint, here capped at ``max_rescue_iters``
    sweeps which is equivalent for any realistic tile).
    """
    xyz = np.asarray(xyz)
    valid = np.isfinite(xyz).all(axis=-1)
    if count is None:
        count = count_3d_neighbors(xyz, r, p)
    rejected = valid & (count < n)

    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    h, w = x.shape
    r2 = r * r
    pads = [(dy, dx) for dy in range(-q, q + 1) for dx in range(-q, q + 1)
            if (dy, dx) != (0, 0)]

    def shifted(a, dy, dx, fill):
        out = np.full_like(a, fill)
        ys0, ys1 = max(dy, 0), min(h + dy, h)
        xs0, xs1 = max(dx, 0), min(w + dx, w)
        out[ys0:ys1, xs0:xs1] = a[ys0 - dy:ys1 - dy, xs0 - dx:xs1 - dx]
        return out

    for _ in range(max_rescue_iters):
        kept = valid & ~rejected
        rescued = np.zeros_like(rejected)
        for dy, dx in pads:
            nk = shifted(kept, dy, dx, False)
            d2 = ((shifted(x, dy, dx, np.inf) - x) ** 2
                  + (shifted(y, dy, dx, np.inf) - y) ** 2
                  + (shifted(z, dy, dx, np.inf) - z) ** 2)
            rescued |= rejected & nk & (d2 < r2)
        if not rescued.any():
            break
        rejected &= ~rescued

    xyz[rejected] = np.nan
    return xyz


def filter_xyz(xyz, r, n, img_gsd, count=None):
    """Radius/count outlier filter (reference triangulation.py:346-365).

    ``count`` optionally supplies a precomputed neighbor count (the
    batched stage-5 driver computes all tiles' counts in one device
    dispatch, :func:`count_3d_neighbors_batch`)."""
    p = int(np.ceil(r / img_gsd))
    return remove_isolated_3d_points(xyz, r, p, n, count=count)
