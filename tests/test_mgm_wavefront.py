"""The skewed-wavefront MGM aggregation (ops/mgm.py) must reproduce the
raster-order recursion exactly (it is a reformulation, not an approximation).

The naive reference below evaluates the recursion in plain raster order with
python loops: L_dir(p, d) = c(p, d) + mean over the traversal's first
``tsgm`` causal neighbors of the P1/P2 min-convolution of their L rows
(Facciolo BMVC'15 generalized to TSGM neighbor sets).
"""

import numpy as np
import pytest

from s2p_tpu.ops.mgm import _TRAVERSALS, mgm_aggregate

_NEIGHBOR_OFFSETS = {'W': (0, -1), 'NE': (-1, 1), 'N': (-1, 0), 'NW': (-1, -1)}


def _min_conv_np(L, p1, p2):
    lm = np.concatenate([[1e30], L[:-1]])
    lp = np.concatenate([L[1:], [1e30]])
    m = L.min()
    return np.minimum(np.minimum(L, np.minimum(lm, lp) + p1), m + p2) - m


def _naive_half(cost, p1, p2_map, tsgm, directions):
    H, W, D = cost.shape
    S = np.zeros_like(cost)
    votes = []
    for d in directions:
        L = np.zeros_like(cost)
        for y in range(H):
            for x in range(W):
                contrib = np.zeros(D)
                cnt = 0
                for name in _TRAVERSALS[d][:tsgm]:
                    dy, dx = _NEIGHBOR_OFFSETS[name]
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < H and 0 <= xx < W:
                        contrib += _min_conv_np(L[yy, xx], p1, p2_map[y, x])
                        cnt += 1
                L[y, x] = cost[y, x] + (contrib / cnt if cnt else 0.0)
        S += L
        votes.append(np.argmin(L, axis=-1))
    return S, np.stack(votes)


@pytest.mark.parametrize('tsgm', [1, 2, 3])
def test_wavefront_equals_raster_order(tsgm):
    rng = np.random.RandomState(tsgm)
    H, W, D = 7, 9, 6
    cost = rng.rand(H, W, D).astype(np.float32) * 10
    p2_map = np.full((H, W), 32.0, np.float32)
    dirs = ('E', 'SE', 'S', 'SW')

    S_ref_f, votes_ref_f = _naive_half(cost.astype(np.float64), 8.0,
                                       p2_map, tsgm, dirs)
    S_ref_b, _ = _naive_half(cost[::-1, ::-1].astype(np.float64), 8.0,
                             p2_map[::-1, ::-1], tsgm, dirs)
    S_ref = S_ref_f + S_ref_b[::-1, ::-1] - 7 * cost

    S, votes = mgm_aggregate(cost, 8.0, 32.0, nb_dir=8, tsgm=tsgm)
    np.testing.assert_allclose(np.asarray(S), S_ref, rtol=1e-4, atol=1e-3)
    # forward-half votes (rows 0..3 of the vote stack) match the reference
    np.testing.assert_array_equal(np.asarray(votes)[:4], votes_ref_f)


def test_wavefront_edge_aware_p2():
    rng = np.random.RandomState(7)
    cost = rng.rand(6, 8, 4).astype(np.float32) * 5
    p2_map = rng.uniform(16, 64, size=(6, 8)).astype(np.float32)
    S_ref_f, _ = _naive_half(cost.astype(np.float64), 8.0, p2_map, 2,
                             ('E', 'SE', 'S', 'SW'))
    S_ref_b, _ = _naive_half(cost[::-1, ::-1].astype(np.float64), 8.0,
                             p2_map[::-1, ::-1], 2, ('E', 'SE', 'S', 'SW'))
    S_ref = S_ref_f + S_ref_b[::-1, ::-1] - 7 * cost
    S, _ = mgm_aggregate(cost, 8.0, 32.0, nb_dir=8, tsgm=2, p2_map=p2_map)
    np.testing.assert_allclose(np.asarray(S), S_ref, rtol=1e-4, atol=1e-3)
