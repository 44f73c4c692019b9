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


def _splat_local(pts, w, xoff, yoff, res, halo, gw, gh, radius, sigma):
    """Gaussian scatter-add of points into a halo-widened local grid (jnp).

    Same splat model as :func:`s2p_tpu.ops.rasterize.plyflatten`: each point
    contributes to every cell within ``radius`` cells of its containing
    cell with weight exp(-d^2 / 2 sigma^2) of the point-to-cell-center
    distance (uniform weights when sigma is None).  pts: (n, 3) x, y, z;
    the local grid covers x in [xoff - halo*res, xoff + (gw + halo)*res)
    and rows likewise below the top edge yoff + halo*res.
    """
    import jax.numpy as jnp

    W = gw + 2 * halo
    H = gh + 2 * halo
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    good = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z) & w
    fj = (x - xoff) / res + halo
    fi = (yoff - y) / res + halo
    j0 = jnp.floor(fj).astype(jnp.int32)
    i0 = jnp.floor(fi).astype(jnp.int32)
    inv2s2 = 0.0 if sigma is None else 1.0 / (2.0 * sigma * sigma)

    acc = jnp.zeros(H * W)
    wacc = jnp.zeros(H * W)
    r = int(radius)
    for dj in range(-r, r + 1):
        for di in range(-r, r + 1):
            jj = j0 + dj
            ii = i0 + di
            inb = good & (jj >= 0) & (jj < W) & (ii >= 0) & (ii < H)
            # distance from the point to the center of cell (ii, jj),
            # in the local (halo-shifted) frame
            cx = xoff + (jj + 0.5 - halo) * res
            cy = yoff - (ii + 0.5 - halo) * res
            d2 = (x - cx) ** 2 + (y - cy) ** 2
            wgt = jnp.where(inb, jnp.exp(-d2 * inv2s2), 0.0)
            flat = jnp.where(inb, ii * W + jj, 0)
            acc = acc.at[flat].add(wgt * jnp.where(inb, z, 0.0))
            wacc = wacc.at[flat].add(wgt)
    return acc.reshape(H, W), wacc.reshape(H, W)


def sharded_dsm(mesh, tile_points, tile_valid, xoffs, yoffs, res, gw, gh,
                halo, grid_shape=None, radius=0, sigma=None):
    """Rasterize a 2-D grid of tiles with two-phase ppermute halo reduction.

    The collective form of the reference's 9-neighborhood plyflatten
    (__init__.py:461-466 with dsm_radius/dsm_sigma): each device
    gaussian-splats its own points into a halo-widened local grid, pushes
    the overflow bands to its 4 lateral neighbors (corner contributions
    ride the horizontal-then-vertical two-phase push), and the result is
    numerically identical to rasterizing the concatenated cloud on one
    device (weights are order-independent sums).

    Args:
        mesh: :class:`s2p_tpu.parallel.TileMesh` (1-D axis; the tile grid
            is laid out row-major on it).
        tile_points: (n_tiles, n_pts, 3) float32 x, y, z; tile k owns the
            cell block [xoffs[k], xoffs[k]+gw*res) x (yoffs[k]-gh*res,
            yoffs[k]].  Points may spill into neighbor blocks by up to
            halo - radius cells.
        tile_valid: (n_tiles, n_pts) bool.
        xoffs: (n_tiles,) west edges; yoffs: (n_tiles,) north edges.
        gw, gh: per-tile grid size in cells; halo: band width in cells
            (must be >= radius + max spill).
        grid_shape: (nty, ntx) tile-grid layout; default (1, n).
        radius, sigma: the plyflatten gaussian splat parameters.

    Returns:
        (n_tiles, gh, gw) weighted-mean-z rasters (NaN where empty).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    ax = mesh.axis
    n = mesh.n
    nty, ntx = grid_shape if grid_shape is not None else (1, n)
    assert nty * ntx == n, 'tile grid must fill the mesh axis'

    # neighbor permutations on the row-major 1-D layout (partial perms:
    # devices without a receiver contribute nothing / receive zeros)
    right = [(k, k + 1) for k in range(n) if (k % ntx) < ntx - 1]
    left = [(k, k - 1) for k in range(n) if (k % ntx) > 0]
    down = [(k, k + ntx) for k in range(n) if k + ntx < n]
    up = [(k, k - ntx) for k in range(n) if k - ntx >= 0]

    def step(pts, w, xoff, yoff):
        acc, wacc = _splat_local(pts[0], w[0], xoff[0, 0], yoff[0, 0], res,
                                 halo, gw, gh, radius, sigma)

        def push(a):
            # phase 1: horizontal, full-height bands (carries corners)
            from_left = jax.lax.ppermute(a[:, gw + halo:], ax, right)
            from_right = jax.lax.ppermute(a[:, :halo], ax, left)
            a = a.at[:, halo:2 * halo].add(from_left)
            a = a.at[:, gw:gw + halo].add(from_right)
            a = a[:, halo:gw + halo]
            # phase 2: vertical, core-width bands (already merged in x)
            from_above = jax.lax.ppermute(a[gh + halo:], ax, down)
            from_below = jax.lax.ppermute(a[:halo], ax, up)
            a = a.at[halo:2 * halo].add(from_above)
            a = a.at[gh:gh + halo].add(from_below)
            return a[halo:gh + halo]

        acc = push(acc)
        wacc = push(wacc)
        out = jnp.where(wacc > 0, acc / jnp.maximum(wacc, 1e-30), jnp.nan)
        return out[None]

    sh = NamedSharding(mesh.mesh, P(ax))
    fn = shard_map(step, mesh=mesh.mesh,
                   in_specs=(P(ax), P(ax), P(ax), P(ax)),
                   out_specs=P(ax))
    pts = jax.device_put(jnp.asarray(tile_points, jnp.float32), sh)
    w = jax.device_put(jnp.asarray(tile_valid), sh)
    xo = jax.device_put(jnp.asarray(xoffs, jnp.float32)[:, None], sh)
    yo = jax.device_put(jnp.asarray(yoffs, jnp.float32)[:, None], sh)
    return np.asarray(jax.jit(fn)(pts, w, xo, yo))


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
