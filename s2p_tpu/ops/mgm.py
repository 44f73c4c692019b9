"""Faithful MGM path aggregation (Facciolo BMVC'15) as a TPU wavefront scan.

The reference's default matcher is the ``mgm`` binary run with ``TSGM=3``
(/root/reference/s2p/block_matching.py:155-188).  Unlike classic SGM, the
MGM recursion at pixel p reads the aggregated costs of SEVERAL causal
neighbors of the raster traversal -- for a top-down/left-right raster these
are W, NW, N, NE -- so information propagates over a 2D fan instead of a
1D ray, which is what removes SGM's streaking artifacts at object borders.
``TSGM`` is the number of neighbors used per traversal (1 = SGM,
2 = the BMVC'15 recursion, 3/4 widen the causal set).

The raster recursion has a wavefront dependency (pixel (y,x) needs
(y,x-1) from the SAME row and three pixels from the previous row), which
serializes a naive scan to H*W steps.  TPU-first formulation: skew the
volume along t = x + 2y.  In skewed coordinates every causal neighbor
lives in one of the THREE previous diagonals:

    W  = (y, x-1)   -> t-1, same row
    NE = (y-1, x+1) -> t-1, row above
    N  = (y-1, x)   -> t-2, row above
    NW = (y-1, x-1) -> t-3, row above

so one ``lax.scan`` over t = 0..W+2H-2 with a 3-slab carry of (H, D)
diagonals computes an exact raster-order recursion, with every step doing
fully vectorized (H, D) min-convolutions.  One forward scan evaluates the
four traversals whose primary directions are causal (->, dr, down, dl);
flipping the volume yields the other four.  All 8 traversals are batched
in one leading dimension, so the scan body is a (8, H, D) VPU slab.

The final volume applies mgm's energy overcount fix (TSGM_FIX_OVERCOUNT=1,
the binary's default): S = sum_r L_r - (ndir-1) * c, so the data term
counts once against ndir smoothness terms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# causal neighbors of a top-down/left-right raster, as (slab, row-shift)
# where slab 0/1/2 = diagonals t-1/t-2/t-3 and shift 1 reads the row above
_W, _NE, _N, _NW = ('W', 'NE', 'N', 'NW')
_NEIGHBOR_TAPS = {_W: (0, 0), _NE: (0, 1), _N: (1, 1), _NW: (2, 1)}

# neighbor sets per traversal primary direction, ordered by TSGM level:
# the first entry is the SGM predecessor p - r, the rest widen the causal
# fan per the MGM generalization (paper fig. 3: the 2-neighbor set pairs r
# with the previous-line direction closest to it).  The binary's exact
# neighbor choice beyond the published 2-neighbor recursion is not pinned
# down by the invocation contract, so several candidate fans are exposed
# and measured against its fixture output (tools/harness_match.py).
_FANS = {
    # r-perpendicular first, then the diagonal behind the scan
    'a': {
        'E':  (_W, _N, _NW, _NE),    # r = (1, 0), scan ->
        'SE': (_NW, _N, _W, _NE),    # r = (1, 1)
        'S':  (_N, _W, _NW, _NE),    # r = (0, 1)
        'SW': (_NE, _N, _NW, _W),    # r = (-1, 1)
    },
    # symmetric fan around the primary direction where causality allows
    'b': {
        'E':  (_W, _NW, _NE, _N),
        'SE': (_NW, _N, _W, _NE),
        'S':  (_N, _NW, _NE, _W),
        'SW': (_NE, _N, _NW, _W),
    },
    # tsgm=2 alternative: diagonals pair with the W-side neighbor
    'd': {
        'E':  (_W, _N, _NW, _NE),
        'SE': (_NW, _W, _N, _NE),
        'S':  (_N, _W, _NW, _NE),
        'SW': (_NE, _NW, _N, _W),
    },
    # r-perpendicular first, then the diagonal ahead of the scan
    'c': {
        'E':  (_W, _N, _NE, _NW),
        'SE': (_NW, _N, _W, _NE),
        'S':  (_N, _NE, _NW, _W),
        'SW': (_NE, _N, _W, _NW),
    },
}
_TRAVERSALS = _FANS['a']


def _skew(vol, W, H):
    """(H, W, D) -> (T, H, D) with skew[t, y] = vol[y, t - 2y]."""
    T = W + 2 * (H - 1)
    padded = jnp.pad(vol, ((0, 0), (0, 1), (0, 0)))    # zero column at x = W
    ts = jnp.arange(T)[:, None]
    ys = jnp.arange(H)[None, :]
    xs = ts - 2 * ys                                   # (T, H)
    xs_c = jnp.where((xs >= 0) & (xs < W), xs, W)      # out-of-range -> pad col
    return padded[ys, xs_c]                            # (T, H, D)


def _unskew(skewed, W, H):
    """(T, H, D|...) -> (H, W, ...) inverse of :func:`_skew`."""
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    return skewed[xs + 2 * ys, ys]


def _min_conv(L, p1, p2):
    """min(L[d], L[d+-1]+P1, min_d L+P2) - min_d L on the last axis."""
    big = jnp.asarray(jnp.float32(1e30))
    lm = jnp.concatenate([jnp.full_like(L[..., :1], big), L[..., :-1]], -1)
    lp = jnp.concatenate([L[..., 1:], jnp.full_like(L[..., :1], big)], -1)
    m = jnp.min(L, axis=-1, keepdims=True)
    return jnp.minimum(jnp.minimum(L, jnp.minimum(lm, lp) + p1), m + p2) - m


@functools.partial(jax.jit, static_argnames=('tsgm', 'directions', 'fan'))
def _half_pass(cost, p1, p2_map, tsgm: int, directions: tuple, fan: str = 'a'):
    """Aggregate the causal traversals of one raster order.

    Args:
        cost: (H, W, D) float32 (finite everywhere).
        p1: scalar; p2_map: (H, W) per-pixel P2.
        directions: traversal names from _TRAVERSALS.

    Returns:
        (S, votes): (H, W, D) sum of the traversals' L volumes and
        (n_dir, H, W) int32 per-traversal WTA (for consensus confidence).
    """
    H, W, D = cost.shape
    T = W + 2 * (H - 1)
    nd = len(directions)

    skew_c = _skew(cost, W, H)                          # (T, H, D)
    skew_p2 = _skew(p2_map[..., None], W, H)            # (T, H, 1)

    ys = jnp.arange(H)

    def step(carry, inputs):
        A1, A2, A3 = carry                              # each (nd, H, D)
        c_t, p2_t, t = inputs                           # (H, D), (H, 1)
        x = t - 2 * ys                                  # (H,)
        cur_ok = (x >= 0) & (x < W)

        def shifted(slab, shift):
            # slab: (H, D); row y reads the row above (y-1) when shift=1
            if shift == 0:
                return slab
            return jnp.concatenate(
                [jnp.zeros_like(slab[:1]), slab[:-1]], axis=0)

        # neighbor validity masks (same for every traversal)
        okW = cur_ok & (x >= 1)
        okNE = cur_ok & (ys >= 1) & (x + 1 < W)
        okN = cur_ok & (ys >= 1)
        okNW = cur_ok & (ys >= 1) & (x >= 1)
        ok_by_name = {_W: okW, _NE: okNE, _N: okN, _NW: okNW}

        slabs = (A1, A2, A3)
        new_L = []
        for k, d in enumerate(directions):
            contrib = jnp.zeros_like(c_t)
            cnt = jnp.zeros((H,), jnp.float32)
            for name in _FANS[fan][d][:tsgm]:
                slab_i, shift = _NEIGHBOR_TAPS[name]
                Lnb = shifted(slabs[slab_i][k], shift)
                ok = ok_by_name[name]
                mc = _min_conv(Lnb, p1, p2_t)
                contrib = contrib + jnp.where(ok[:, None], mc, 0.0)
                cnt = cnt + ok.astype(jnp.float32)
            L = c_t + contrib / jnp.maximum(cnt, 1.0)[:, None]
            L = jnp.where(cur_ok[:, None], L, 0.0)
            new_L.append(L)
        Lst = jnp.stack(new_L)                          # (nd, H, D)
        S_t = jnp.sum(Lst, axis=0)                      # (H, D)
        votes_t = jnp.argmin(Lst, axis=-1).astype(jnp.int32).T  # (H, nd)
        return (Lst, A1, A2), (S_t, votes_t)

    init = tuple(jnp.zeros((nd, H, D), jnp.float32) for _ in range(3))
    ts = jnp.arange(T)
    (_, _, _), (S_skew, votes_skew) = jax.lax.scan(
        step, init, (skew_c, skew_p2, ts))

    S = _unskew(S_skew, W, H)                           # (H, W, D)
    votes = jnp.moveaxis(_unskew(votes_skew, W, H), -1, 0)  # (nd, H, W)
    return S, votes


def mgm_aggregate(cost, p1, p2, nb_dir: int = 8, tsgm: int = 3,
                  p2_map=None, overcount_fix: bool = True, fan: str = 'a'):
    """Full MGM aggregation over ``nb_dir`` traversals.

    Args:
        cost: (H, W, D) float32 matching cost (finite everywhere).
        p1, p2: scalar penalties (mgm binary defaults 8/32).
        nb_dir: 2, 4 or 8 traversals (the mgm ``-O`` flag).
        tsgm: causal neighbors per traversal (mgm ``TSGM`` env; s2p uses 3).
        p2_map: optional (H, W) per-pixel P2 (edge weights, mgm -wl).
        overcount_fix: subtract (nb_dir-1)*cost from the sum
            (TSGM_FIX_OVERCOUNT=1, the binary's default).

    Returns:
        (S, votes): (H, W, D) aggregated volume, (nb_dir, H, W) WTA of each
        traversal.
    """
    H, W, D = cost.shape
    if p2_map is None:
        p2_map = jnp.full((H, W), p2, jnp.float32)
    p1 = jnp.asarray(p1, jnp.float32)

    if nb_dir >= 8:
        dirs = ('E', 'SE', 'S', 'SW')
    elif nb_dir >= 4:
        dirs = ('E', 'S')
    else:
        dirs = ('E',)

    S_f, votes_f = _half_pass(cost, p1, p2_map, tsgm, dirs, fan)
    # reverse raster order: flip both axes -> the opposite 4 traversals
    S_b, votes_b = _half_pass(cost[::-1, ::-1], p1, p2_map[::-1, ::-1],
                              tsgm, dirs, fan)
    S = S_f + S_b[::-1, ::-1]
    votes = jnp.concatenate([votes_f, votes_b[:, ::-1, ::-1]], axis=0)
    if overcount_fix:
        n_trav = 2 * len(dirs)
        S = S - (n_trav - 1) * cost
    return S, votes
