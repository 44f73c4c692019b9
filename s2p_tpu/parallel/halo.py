"""Halo-exchange collectives for the tile mesh (shard_map + ppermute).

The reference's two cross-tile dataflows are file-mediated (SURVEY.md 2.4):
SIFT matches are read from the 8 neighboring tile directories, and DSM
rasterization re-flattens the neighbors' point clouds so splats near tile
borders land in the right cells (/root/reference/s2p/__init__.py:130-145,
:461-466).  On a device mesh those halos become collectives over ICI:

  * :func:`sharded_dsm` rasterizes a row of tiles sharded over the mesh.
    Each device scatter-adds its own points into a local grid WIDENED by a
    halo band, then sends the overflow bands to its lateral neighbors with
    ``ppermute`` and accumulates what it receives -- numerically identical
    to rasterizing the concatenated cloud on one device (weights are
    order-independent sums).
  * :func:`distributed_pointing_fit` solves the global pointing
    least-squares (reference pointing_accuracy.py:135-176) from per-tile
    normal-equation contributions reduced with ``psum``, so no host gather
    of per-tile matrices is needed.
"""

from __future__ import annotations

import functools

import numpy as np


def _splat_local(pts, w, xoff, yoff, res, halo, gw, gh):
    """Scatter-add points into a halo-widened local grid (jnp).

    pts: (n, 3) x, y, z (NaN rows ignored); the local grid covers
    x in [xoff - halo*res, xoff + (gw + halo)*res), rows likewise from the
    top edge yoff.
    """
    import jax.numpy as jnp

    W = gw + 2 * halo
    H = gh + 2 * halo
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    good = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z) & w
    j = jnp.floor((x - xoff) / res).astype(jnp.int32) + halo
    i = jnp.floor((yoff - y) / res).astype(jnp.int32) + halo
    inb = good & (j >= 0) & (j < W) & (i >= 0) & (i < H)
    flat = jnp.where(inb, i * W + j, 0)
    wgt = jnp.where(inb, 1.0, 0.0)
    acc = jnp.zeros(H * W).at[flat].add(wgt * jnp.where(inb, z, 0.0))
    cnt = jnp.zeros(H * W).at[flat].add(wgt)
    return acc.reshape(H, W), cnt.reshape(H, W)


def sharded_dsm(mesh, tile_points, tile_valid, xoffs, yoff, res, gw, gh,
                halo):
    """Rasterize one mesh-row of adjacent tiles with ppermute halo exchange.

    Args:
        mesh: :class:`s2p_tpu.parallel.TileMesh`.
        tile_points: (n_tiles, n_pts, 3) float32; tile k owns the x-band
            [xoffs[k], xoffs[k] + gw*res) (adjacent left-to-right in mesh
            order).  Points may spill beyond their band by up to
            ``halo`` cells (the splat halo).
        tile_valid: (n_tiles, n_pts) bool.
        xoffs: (n_tiles,) left edges; yoff: shared top edge.
        gw, gh: per-tile grid size in cells; halo: band width in cells.

    Returns:
        (n_tiles, gh, gw) mean-z rasters (NaN where empty), halo
        contributions from lateral neighbors included.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    ax = mesh.axis
    n = mesh.n

    def step(pts, w, xoff):
        acc, cnt = _splat_local(pts[0], w[0], xoff[0, 0], yoff, res,
                                halo, gw, gh)

        def exchange(a):
            # send the right overflow band to the right neighbor's left
            # halo position and vice versa; edge devices receive zeros
            right = a[:, gw + halo:]                 # (H, halo)
            left = a[:, :halo]
            fwd = [(i, (i + 1) % n) for i in range(n)]
            bwd = [(i, (i - 1) % n) for i in range(n)]
            from_left = jax.lax.ppermute(right, ax, fwd)
            from_right = jax.lax.ppermute(left, ax, bwd)
            idx = jax.lax.axis_index(ax)
            from_left = jnp.where(idx == 0, 0.0, from_left)
            from_right = jnp.where(idx == n - 1, 0.0, from_right)
            core = a[:, halo:gw + halo]
            core = core.at[:, :halo].add(from_left)
            core = core.at[:, gw - halo:].add(from_right)
            return core[halo:gh + halo]

        acc = exchange(acc)
        cnt = exchange(cnt)
        out = jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1), jnp.nan)
        return out[None]

    sh = NamedSharding(mesh.mesh, P(ax))
    fn = shard_map(step, mesh=mesh.mesh,
                   in_specs=(P(ax), P(ax), P(ax)),
                   out_specs=P(ax))
    pts = jax.device_put(jnp.asarray(tile_points, jnp.float32), sh)
    w = jax.device_put(jnp.asarray(tile_valid), sh)
    xo = jax.device_put(jnp.asarray(xoffs, jnp.float32)[:, None], sh)
    return np.asarray(jax.jit(fn)(pts, w, xo))


def distributed_pointing_fit(mesh, centers, corrected):
    """Global affine pointing fit from per-tile pairs via psum.

    The reference gathers every tile's (center, A @ center) pair on the
    driver and runs one least squares (pointing_accuracy.py:135-176,
    estimation.py:157-205).  Here each device accumulates the normal
    equations of ITS tiles; one psum produces the global system, solved
    replicated on every device.

    Args:
        centers: (n_tiles, 2) tile centers; corrected: (n_tiles, 2) the
        locally-corrected positions.  n_tiles a multiple of mesh.n.

    Returns:
        3x3 affine transform (numpy) mapping centers -> corrected, the
        collective equivalent of estimation.affine_transformation.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    ax = mesh.axis

    def step(c, d):
        # affine x' = M x + t, 6 unknowns: rows [x y 1] -> x', y'.
        # Hartley-style normalization before forming the normal equations:
        # raw tile centers reach 1e4-1e6 px/UTM, whose squares exhaust f32
        # significands (the reference centers points and solves in f64 SVD,
        # estimation.py:178-200); centering + isotropic scaling keeps the
        # f32 solve well-conditioned on TPU.
        k = jnp.asarray(c.shape[0], c.dtype)
        n_tot = jax.lax.psum(k, ax)
        mu_c = jax.lax.psum(jnp.sum(c, 0), ax) / n_tot
        mu_d = jax.lax.psum(jnp.sum(d, 0), ax) / n_tot
        cc, dc = c - mu_c, d - mu_d
        s_c = jnp.sqrt(jax.lax.psum(jnp.sum(cc * cc), ax) / n_tot) + 1e-12
        s_d = jnp.sqrt(jax.lax.psum(jnp.sum(dc * dc), ax) / n_tot) + 1e-12
        cn, dn = cc / s_c, dc / s_d
        A = jnp.concatenate([cn, jnp.ones((cn.shape[0], 1), cn.dtype)], axis=1)
        AtA = jax.lax.psum(A.T @ A, ax)
        Atb = jax.lax.psum(A.T @ dn, ax)
        sol = jnp.linalg.solve(AtA, Atb)             # (3, 2)
        Mn = jnp.concatenate([sol.T, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
        # denormalize: M = T_d @ Mn @ T_c^{-1}
        T_d = jnp.array([[s_d, 0.0, mu_d[0]], [0.0, s_d, mu_d[1]],
                         [0.0, 0.0, 1.0]])
        T_c_inv = jnp.array([[1.0 / s_c, 0.0, -mu_c[0] / s_c],
                             [0.0, 1.0 / s_c, -mu_c[1] / s_c],
                             [0.0, 0.0, 1.0]])
        return T_d @ Mn @ T_c_inv

    sh = NamedSharding(mesh.mesh, P(ax))
    fn = shard_map(step, mesh=mesh.mesh, in_specs=(P(ax), P(ax)),
                   out_specs=P())
    c = jax.device_put(jnp.asarray(centers, jnp.float32), sh)
    d = jax.device_put(jnp.asarray(corrected, jnp.float32), sh)
    return np.asarray(jax.jit(fn)(c, d))
