"""RPC (Rational Polynomial Coefficient) camera models.

A satellite RPC model maps geographic coordinates (lon, lat, alt) to image
coordinates (col, row) through degree-3 rational polynomials of 20 terms
evaluated in a normalized coordinate space.  This module provides

  * :class:`RPCModel` -- host-side float64 model with ``projection`` /
    ``localization`` (the API surface of the ``rpcm`` package that the
    reference pipeline relies on, cf. /root/reference/s2p/rpc_utils.py:37-39),
  * a JAX pytree :class:`RpcParams` plus jittable batched kernels
    (``project_jax``, ``localize_jax``, ``triangulate_height_jax``) used by the
    device-side triangulation path (the TPU-native equivalent of
    /root/reference/c/rpc.c:279-514 and /root/reference/c/disp_to_h.c:70-140).

Design notes (TPU-first):
  - all device math happens in the *normalized* RPC space where every value is
    O(1), so float32 is sufficient end-to-end; results are denormalized once.
  - the inverse model (image -> ground) is solved by a fixed-iteration Newton
    scheme with the exact analytic Jacobian of the rational polynomials
    (the reference C code uses finite differences, rpc.c:378-411).
  - two-ray triangulation solves for the altitude on a fixed-size iteration
    schedule (lax.fori_loop) instead of a data-dependent while loop, keeping
    the computation trace-/vmap-friendly (replaces rpc_height, rpc.c:475-514).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

# The 20 monomials of the cubic RPC polynomial, in RPC-spec order, expressed
# as exponents (i, j, k) of (L, P, H) = (normalized lon, lat, alt).
# Order: 1, L, P, H, LP, LH, PH, L2, P2, H2, LPH, L3, LP2, LH2, L2P, P3,
#        PH2, L2H, P2H, H3   (cf. reference c/rpc.c:279-298)
_MONOMIAL_EXPONENTS = np.array([
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0),
    (1, 0, 1), (0, 1, 1), (2, 0, 0), (0, 2, 0), (0, 0, 2),
    (1, 1, 1), (3, 0, 0), (1, 2, 0), (1, 0, 2), (2, 1, 0),
    (0, 3, 0), (0, 1, 2), (2, 0, 1), (0, 2, 1), (0, 0, 3),
], dtype=np.int32)


def _poly20(c, L, P, H):
    """Evaluate the 20-term cubic polynomial with coefficients ``c``.

    Works for both numpy and jax arrays; L, P, H broadcast against each other
    and ``c`` has shape (..., 20) broadcastable on the leading axes.
    """
    LL, PP, HH = L * L, P * P, H * H
    return (c[..., 0]
            + c[..., 1] * L + c[..., 2] * P + c[..., 3] * H
            + c[..., 4] * L * P + c[..., 5] * L * H + c[..., 6] * P * H
            + c[..., 7] * LL + c[..., 8] * PP + c[..., 9] * HH
            + c[..., 10] * L * P * H
            + c[..., 11] * LL * L + c[..., 12] * L * PP + c[..., 13] * L * HH
            + c[..., 14] * LL * P + c[..., 15] * PP * P + c[..., 16] * P * HH
            + c[..., 17] * LL * H + c[..., 18] * PP * H + c[..., 19] * HH * H)


def _poly20_dL(c, L, P, H):
    """d/dL of :func:`_poly20`."""
    return (c[..., 1] + c[..., 4] * P + c[..., 5] * H
            + 2 * c[..., 7] * L + c[..., 10] * P * H
            + 3 * c[..., 11] * L * L + c[..., 12] * P * P + c[..., 13] * H * H
            + 2 * c[..., 14] * L * P + 2 * c[..., 17] * L * H)


def _poly20_dP(c, L, P, H):
    """d/dP of :func:`_poly20`."""
    return (c[..., 2] + c[..., 4] * L + c[..., 6] * H
            + 2 * c[..., 8] * P + c[..., 10] * L * H
            + 2 * c[..., 12] * L * P + 3 * c[..., 15] * P * P
            + c[..., 16] * H * H + 2 * c[..., 18] * P * H)


class RpcParams(NamedTuple):
    """Flat pytree of RPC inverse-model coefficients (ground -> image).

    All fields are arrays; shapes: coefficient vectors (20,), scale/offset
    scalars ().  Registered as a NamedTuple so it threads through jit/vmap.
    """
    col_num: np.ndarray
    col_den: np.ndarray
    row_num: np.ndarray
    row_den: np.ndarray
    lon_offset: np.ndarray
    lon_scale: np.ndarray
    lat_offset: np.ndarray
    lat_scale: np.ndarray
    alt_offset: np.ndarray
    alt_scale: np.ndarray
    col_offset: np.ndarray
    col_scale: np.ndarray
    row_offset: np.ndarray
    row_scale: np.ndarray

    def astype(self, dtype):
        return RpcParams(*[np.asarray(f, dtype=dtype) if isinstance(f, np.ndarray)
                           else f.astype(dtype) for f in self])


@dataclasses.dataclass
class RPCModel:
    """Host-side RPC camera model (float64, numpy).

    Mirrors the public attribute/method surface of ``rpcm.RPCModel`` used by
    the reference (attributes ``{col,row,lat,lon,alt}_{offset,scale}``,
    ``{col,row}_{num,den}``, methods ``projection`` and ``localization``;
    cf. SURVEY.md section 2.5).
    """
    col_num: np.ndarray
    col_den: np.ndarray
    row_num: np.ndarray
    row_den: np.ndarray
    lon_offset: float
    lon_scale: float
    lat_offset: float
    lat_scale: float
    alt_offset: float
    alt_scale: float
    col_offset: float
    col_scale: float
    row_offset: float
    row_scale: float
    # optional direct model (ground <- image); rarely provided by vendors
    lon_num: np.ndarray | None = None
    lon_den: np.ndarray | None = None
    lat_num: np.ndarray | None = None
    lat_den: np.ndarray | None = None

    def __post_init__(self):
        for f in ('col_num', 'col_den', 'row_num', 'row_den'):
            v = np.asarray(getattr(self, f), dtype=np.float64)
            if v.shape != (20,):
                raise ValueError(f'RPC coefficient {f} must have 20 terms, got {v.shape}')
            setattr(self, f, v)

    # ------------------------------------------------------------------ #
    def projection(self, lon, lat, alt):
        """Ground (lon, lat, alt) -> image (col, row).  Vectorized."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        alt = np.asarray(alt, dtype=np.float64)
        L = (lon - self.lon_offset) / self.lon_scale
        P = (lat - self.lat_offset) / self.lat_scale
        H = (alt - self.alt_offset) / self.alt_scale
        col = _poly20(self.col_num, L, P, H) / _poly20(self.col_den, L, P, H)
        row = _poly20(self.row_num, L, P, H) / _poly20(self.row_den, L, P, H)
        return (col * self.col_scale + self.col_offset,
                row * self.row_scale + self.row_offset)

    def localization(self, col, row, alt, return_normalized=False):
        """Image (col, row) + altitude -> ground (lon, lat).  Vectorized.

        Inverts the projection by Newton iteration with the exact Jacobian
        (the reference uses a finite-difference secant scheme,
        c/rpc.c:378-411; both converge to the same fixed point).
        """
        col = np.asarray(col, dtype=np.float64)
        row = np.asarray(row, dtype=np.float64)
        alt = np.asarray(alt, dtype=np.float64)
        cn = (col - self.col_offset) / self.col_scale
        rn = (row - self.row_offset) / self.row_scale
        H = (alt - self.alt_offset) / self.alt_scale

        L = np.zeros_like(cn + rn + H)
        P = np.zeros_like(L)
        for _ in range(12):
            L, P, err = self._newton_step(L, P, H, cn, rn)
            if err < 1e-13:
                break
        if return_normalized:
            return L, P
        return (L * self.lon_scale + self.lon_offset,
                P * self.lat_scale + self.lat_offset)

    def _newton_step(self, L, P, H, cn, rn):
        fc_n, fc_d = _poly20(self.col_num, L, P, H), _poly20(self.col_den, L, P, H)
        fr_n, fr_d = _poly20(self.row_num, L, P, H), _poly20(self.row_den, L, P, H)
        fc = fc_n / fc_d
        fr = fr_n / fr_d
        # Jacobian of (fc, fr) wrt (L, P) via quotient rule
        dc_dL = (_poly20_dL(self.col_num, L, P, H) - fc * _poly20_dL(self.col_den, L, P, H)) / fc_d
        dc_dP = (_poly20_dP(self.col_num, L, P, H) - fc * _poly20_dP(self.col_den, L, P, H)) / fc_d
        dr_dL = (_poly20_dL(self.row_num, L, P, H) - fr * _poly20_dL(self.row_den, L, P, H)) / fr_d
        dr_dP = (_poly20_dP(self.row_num, L, P, H) - fr * _poly20_dP(self.row_den, L, P, H)) / fr_d
        det = dc_dL * dr_dP - dc_dP * dr_dL
        ec = cn - fc
        er = rn - fr
        L = L + (dr_dP * ec - dc_dP * er) / det
        P = P + (-dr_dL * ec + dc_dL * er) / det
        return L, P, float(np.max(ec * ec + er * er)) if ec.size else 0.0

    # ------------------------------------------------------------------ #
    def params(self, dtype=np.float64) -> RpcParams:
        """Export the inverse-model coefficients as a jit-able pytree."""
        return RpcParams(
            col_num=np.asarray(self.col_num, dtype),
            col_den=np.asarray(self.col_den, dtype),
            row_num=np.asarray(self.row_num, dtype),
            row_den=np.asarray(self.row_den, dtype),
            lon_offset=np.asarray(self.lon_offset, dtype),
            lon_scale=np.asarray(self.lon_scale, dtype),
            lat_offset=np.asarray(self.lat_offset, dtype),
            lat_scale=np.asarray(self.lat_scale, dtype),
            alt_offset=np.asarray(self.alt_offset, dtype),
            alt_scale=np.asarray(self.alt_scale, dtype),
            col_offset=np.asarray(self.col_offset, dtype),
            col_scale=np.asarray(self.col_scale, dtype),
            row_offset=np.asarray(self.row_offset, dtype),
            row_scale=np.asarray(self.row_scale, dtype),
        )

    def to_dict(self):
        d = {
            'col_num': list(map(float, self.col_num)),
            'col_den': list(map(float, self.col_den)),
            'row_num': list(map(float, self.row_num)),
            'row_den': list(map(float, self.row_den)),
        }
        for f in ('lon_offset', 'lon_scale', 'lat_offset', 'lat_scale',
                  'alt_offset', 'alt_scale', 'col_offset', 'col_scale',
                  'row_offset', 'row_scale'):
            d[f] = float(getattr(self, f))
        return d

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: d[k] for k in (
            'col_num', 'col_den', 'row_num', 'row_den',
            'lon_offset', 'lon_scale', 'lat_offset', 'lat_scale',
            'alt_offset', 'alt_scale', 'col_offset', 'col_scale',
            'row_offset', 'row_scale')})


# ====================================================================== #
# JAX device kernels.  Import jax lazily so that pure-host users of this
# module never pay for it.
# ====================================================================== #

def _jnp():
    import jax.numpy as jnp
    return jnp


def project_normalized_jax(rpc: RpcParams, L, P, H):
    """Normalized ground coords -> normalized image coords (jax)."""
    col = _poly20(rpc.col_num, L, P, H) / _poly20(rpc.col_den, L, P, H)
    row = _poly20(rpc.row_num, L, P, H) / _poly20(rpc.row_den, L, P, H)
    return col, row


def project_jax(rpc: RpcParams, lon, lat, alt):
    """Ground -> image, denormalized (jax)."""
    L = (lon - rpc.lon_offset) / rpc.lon_scale
    P = (lat - rpc.lat_offset) / rpc.lat_scale
    H = (alt - rpc.alt_offset) / rpc.alt_scale
    col, row = project_normalized_jax(rpc, L, P, H)
    return col * rpc.col_scale + rpc.col_offset, row * rpc.row_scale + rpc.row_offset


def localize_normalized_jax(rpc: RpcParams, cn, rn, H, num_iters: int = 10):
    """Normalized image coords + normalized alt -> normalized (L, P) (jax).

    Fixed-iteration Newton solve; every operand is O(1) so float32 converges
    to ~1e-7 normalized units (~5e-5 px for a 512-px scale).
    """
    jnp = _jnp()
    L = jnp.zeros_like(cn)
    P = jnp.zeros_like(cn)

    def step(_, LP):
        L, P = LP
        fc = _poly20(rpc.col_num, L, P, H) / _poly20(rpc.col_den, L, P, H)
        fr = _poly20(rpc.row_num, L, P, H) / _poly20(rpc.row_den, L, P, H)
        dc_dL = (_poly20_dL(rpc.col_num, L, P, H) - fc * _poly20_dL(rpc.col_den, L, P, H)) \
            / _poly20(rpc.col_den, L, P, H)
        dc_dP = (_poly20_dP(rpc.col_num, L, P, H) - fc * _poly20_dP(rpc.col_den, L, P, H)) \
            / _poly20(rpc.col_den, L, P, H)
        dr_dL = (_poly20_dL(rpc.row_num, L, P, H) - fr * _poly20_dL(rpc.row_den, L, P, H)) \
            / _poly20(rpc.row_den, L, P, H)
        dr_dP = (_poly20_dP(rpc.row_num, L, P, H) - fr * _poly20_dP(rpc.row_den, L, P, H)) \
            / _poly20(rpc.row_den, L, P, H)
        det = dc_dL * dr_dP - dc_dP * dr_dL
        ec = cn - fc
        er = rn - fr
        return (L + (dr_dP * ec - dc_dP * er) / det,
                P + (-dr_dL * ec + dc_dL * er) / det)

    import jax
    L, P = jax.lax.fori_loop(0, num_iters, step, (L, P))
    return L, P


def localize_jax(rpc: RpcParams, col, row, alt, num_iters: int = 10):
    """Image (col, row, alt) -> ground (lon, lat) (jax, denormalized)."""
    cn = (col - rpc.col_offset) / rpc.col_scale
    rn = (row - rpc.row_offset) / rpc.row_scale
    H = (alt - rpc.alt_offset) / rpc.alt_scale
    L, P = localize_normalized_jax(rpc, cn, rn, H, num_iters)
    return L * rpc.lon_scale + rpc.lon_offset, P * rpc.lat_scale + rpc.lat_offset


def triangulate_height_jax(rpc_a: RpcParams, rpc_b: RpcParams,
                           xa, ya, xb, yb,
                           num_iters: int = 12, loc_iters: int = 8):
    """Two-ray altitude solve: the TPU replacement of ``rpc_height``.

    Given a correspondence (xa, ya) in image a and (xb, yb) in image b,
    find the altitude h minimizing the reprojection distance in image b of
    the ray through (xa, ya).  Same 1-D secant line search as the reference
    (c/rpc.c:475-514): project (xa, ya, h) into image b (via localization in
    a then projection in b), also at h + 1m, and jump along the chord.

    Returns (h, err) where err is the point-to-ray distance in pixels of
    image b (same error metric the reference stores, disp_to_h.c:128).

    All math is in float32-safe magnitudes: pixel coordinates stay in their
    natural units (OK up to ~1e7 rel eps) but the inner localization /
    projection run in normalized space.
    """
    import jax
    jnp = _jnp()

    hstep = jnp.asarray(1.0, dtype=xa.dtype)

    def corresp(h):
        # (xa, ya, h) --localize in a--> ground --project in b--> pixel in b
        lon, lat = localize_jax(rpc_a, xa, ya, h, loc_iters)
        return project_jax(rpc_b, lon, lat, h)

    def body(_, state):
        h, err = state
        px, py = corresp(h)
        qx, qy = corresp(h + hstep)
        ax_, ay_ = qx - px, qy - py
        bx_, by_ = xb - px, yb - py
        a2 = ax_ * ax_ + ay_ * ay_
        lam = (ax_ * bx_ + ay_ * by_) / jnp.maximum(a2, 1e-30)
        zx = px + lam * ax_
        zy = py + lam * ay_
        err = jnp.sqrt((zx - xb) ** 2 + (zy - yb) ** 2)
        return h + lam * hstep, err

    h0 = jnp.zeros_like(xa)
    err0 = jnp.full_like(xa, jnp.inf)
    h, err = jax.lax.fori_loop(0, num_iters, body, (h0, err0))
    return h, err
