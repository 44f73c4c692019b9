"""Semi-global matching: multi-direction path aggregation on TPU.

The compute core of the pipeline -- the TPU-native equivalent of the mgm
binary the reference shells out to (More Global Matching, Facciolo BMVC'15;
invocation contract at /root/reference/s2p/block_matching.py:155-188).

Design (TPU-first, cf. SURVEY.md section 7.5):
  * the cost volume (H, W, D) keeps disparity as the innermost, vectorized
    lane dimension (D padded to lane multiples by the caller);
  * each aggregation direction is a ``lax.scan`` along rows or columns whose
    per-step body does the O(D) min-convolution on a (W, D) or (H, D) slab
    -- fully vectorized VPU work; diagonal directions reuse the row scan
    with a per-step lateral shift of the carry;
  * disparity selection (WTA), vfit subpixel, median filter, left-right
    consistency and consensus confidence are fused elementwise stages.

Aggregation engines (params.mgm):
  * mgm=True: the faithful MGM raster recursion with TSGM causal neighbors
    per traversal, evaluated exactly as a skewed wavefront scan
    (:mod:`s2p_tpu.ops.mgm`) -- the mgm binary's TSGM=3 semantics;
  * mgm=False: classic SGM, 8 independent directional scans (also the
    Pallas fast path, :mod:`s2p_tpu.ops.sgm_pallas`).

The left-right test either re-aggregates with the roles swapped
(lr_mode='full', the reference TESTLRRL contract) or derives the
right-reference disparity from the left volume (lr_mode='volume', faster).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .census import census_cost_volume

_DIRS_8 = ((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, -1), (1, -1), (-1, 1))


@dataclasses.dataclass(frozen=True)
class SgmParams:
    """Aggregation parameters (defaults = the reference's mgm invocation)."""
    census_win: int = 5
    cost: str = 'census'        # 'census' or 'bt' (Birchfield-Tomasi)
    p1: float = 8.0
    p2: float = 32.0
    nb_dir: int = 8
    subpix: str = 'vfit'        # 'vfit', 'parabola' or 'none'
    median: bool = True         # MEDIAN=1 3x3 median filter
    lr_tau: float = 1.0         # TESTLRRL_TAU
    lr_enabled: bool = True     # TESTLRRL
    speckle_min_area: int = 0   # REMOVESMALLCC (0 = off)
    mgm: bool = True            # faithful MGM raster recursion (ops/mgm.py)
    #                             vs classic SGM independent scans
    mgm_neighbors: int = 3      # causal predecessors per traversal when
    #                             mgm: the binary's TSGM env var (s2p sets
    #                             TSGM=3; 2 = the BMVC'15 recursion)
    min_confidence: float = 0.0  # drop pixels below this consensus score
    uniqueness_ratio: float = 0.0  # OpenCV-SGBM uniqueness check: reject
    #                             when a candidate outside +-1 of the WTA
    #                             is within this percentage of the minimum
    #                             (stereosgbm.cpp:775; 0 = off)
    lr_mode: str = 'volume'     # 'volume': dual-volume RL; 'full': true
    #                             second aggregation with swapped images
    p2_edge_scale: float = 1.0  # P2 multiplier at strong intensity edges
    #                             (1.0 = constant P2, the mgm behavior)
    lr_int: bool = False        # LR test on rounded (integer WTA)
    #                             disparities instead of subpixel maps
    median_first: bool = False  # apply the median filter BEFORE the LR
    #                             test (both maps smoothed, then compared)
    median_fill: bool = False   # the final median may fill (resurrect)
    #                             rejected pixels from valid neighbors
    fill_coh_tau: float = 0.0   # when > 0, fill only pixels whose 3x3
    #                             valid-neighbor disparity spread is <= tau
    #                             (suppresses fg/bg-mixed fill values at
    #                             occlusion boundaries); 0 = always fill
    overcount_fix: bool = True  # MGM energy overcount fix
    #                             (TSGM_FIX_OVERCOUNT, mgm engine only)
    backend: str = 'auto'       # 'auto' (pallas on TPU, lax elsewhere),
    #                             'pallas', 'lax', or 'interpret' (pallas
    #                             interpreter mode, for CPU testing)


def _min_convolution(L, p1, p2):
    """SGM penalty term from a predecessor cost row: (N, D) -> (N, D).

    min(L[d], L[d-1]+P1, L[d+1]+P1, min_d L + P2) - min_d L
    p2 may be a scalar or an (N, 1) per-pixel penalty (edge-aware mode).
    """
    big = jnp.asarray(jnp.inf, L.dtype)
    lm = jnp.concatenate([jnp.full_like(L[:, :1], big), L[:, :-1]], axis=1)
    lp = jnp.concatenate([L[:, 1:], jnp.full_like(L[:, :1], big)], axis=1)
    m = jnp.min(L, axis=1, keepdims=True)
    return jnp.minimum(jnp.minimum(L, jnp.minimum(lm, lp) + p1), m + p2) - m


def _shifted_carry(L_prev, shift):
    """Roll the carry laterally; returns (rolled L, edge mask of rolled-in
    lanes that have no predecessor)."""
    if shift == 0:
        return L_prev, jnp.zeros(L_prev.shape[0], dtype=bool)
    Lp = jnp.roll(L_prev, shift, axis=0)
    edge = jnp.zeros(L_prev.shape[0], dtype=bool)
    if shift > 0:
        edge = edge.at[:shift].set(True)
    else:
        edge = edge.at[shift:].set(True)
    return Lp, edge


def _scan_pass(cost, dx, dy, p1, p2, mgm=True, p2_vol=None, mgm_neighbors=2):
    """One directional aggregation L_r over the whole volume.

    With ``mgm`` (the reference's More Global Matching recursion,
    Facciolo BMVC'15), each pass averages the penalty contributions of TWO
    predecessor directions: the scan direction r and its 45-degree rotation
    toward the scan axis -- both predecessors then live in the previous
    scan line, so every pass stays one vectorized ``lax.scan`` (the
    traversal reads 2 neighbors from the previous row, exactly the mgm
    scheme; SURVEY.md 2.3).  With mgm=False this is classic SGM.

    The scan axis is y when dy != 0, else x; the lateral carry offset
    handles diagonal predecessors.  Returns the (H, W, D) volume.
    """
    if dy == 0:
        # horizontal: scan over x, carry (H, D); lateral axis = y
        vol = jnp.swapaxes(cost, 0, 1)          # (W, H, D)
        flip = dx < 0
        main_lat = 0
        partner_lat = dx                        # partner (dx, dx): dy offset
    else:
        vol = cost                               # (H, W, D)
        flip = dy < 0
        main_lat = dx                            # diagonal predecessor
        # partner of a diagonal is the axis direction (0, dy) -> lateral 0;
        # partner of an axis vertical dir is the diagonal (dy, dy) -> dy
        partner_lat = 0 if dx != 0 else dy
    if flip:
        vol = vol[::-1]

    laterals = [main_lat]
    if mgm:
        laterals.append(partner_lat)
        if mgm_neighbors >= 3:
            laterals.append(-(main_lat + partner_lat))

    def step(carry, xs):
        c_row, p2_row = xs
        L_prev, first = carry
        contrib = None
        for lat in laterals:
            Lp, edge = _shifted_carry(L_prev, lat)
            c = _min_convolution(Lp, p1, p2_row)
            c = jnp.where((first | edge)[:, None], 0.0, c)
            contrib = c if contrib is None else contrib + c
        contrib = contrib / len(laterals)
        L = c_row + contrib
        return (L, jnp.zeros((), bool)), L

    n, m, D = vol.shape
    if p2_vol is None:
        p2_rows = jnp.broadcast_to(jnp.asarray(p2, vol.dtype), (n, m, 1))
    else:
        pv = jnp.swapaxes(p2_vol, 0, 1) if dy == 0 else p2_vol
        if flip:
            pv = pv[::-1]
        p2_rows = pv[..., None]
    init = (jnp.zeros((m, D), vol.dtype), jnp.ones((), bool))
    _, out = jax.lax.scan(step, init, (vol, p2_rows))
    if flip:
        out = out[::-1]
    if dy == 0:
        out = jnp.swapaxes(out, 0, 1)
    return out


def _nan_median3(x):
    """3x3 NaN-aware median (lower-median for even valid counts).

    Sorting-network formulation: jnp.sort lowers to a slow generic sort on
    TPU; an odd-even transposition network over the 9 taps is pure
    min/max VPU work.
    """
    h, w = x.shape
    pad = jnp.pad(x, 1, constant_values=jnp.nan)
    taps = [pad[dy:dy + h, dx:dx + w]
            for dy in range(3) for dx in range(3)]
    big = jnp.asarray(jnp.inf, x.dtype)
    n = sum(jnp.isfinite(t).astype(jnp.int32) for t in taps)
    v = [jnp.where(jnp.isnan(t), big, t) for t in taps]
    # odd-even transposition sort, 9 rounds (provably sorts 9 inputs)
    for r in range(9):
        for i in range(r % 2, 8, 2):
            lo = jnp.minimum(v[i], v[i + 1])
            hi = jnp.maximum(v[i], v[i + 1])
            v[i], v[i + 1] = lo, hi
    idx = jnp.maximum(n - 1, 0) // 2
    med = v[0]
    for k in range(1, 9):
        med = jnp.where(idx == k, v[k], med)
    return jnp.where(n > 0, med, jnp.nan)


def _nan_spread3(x):
    """max - min of the valid values in each 3x3 neighborhood (NaN-aware)."""
    h, w = x.shape
    pad = jnp.pad(x, 1, constant_values=jnp.nan)
    lo = jnp.full_like(x, jnp.inf)
    hi = jnp.full_like(x, -jnp.inf)
    for dy in range(3):
        for dx in range(3):
            t = pad[dy:dy + h, dx:dx + w]
            fin = jnp.isfinite(t)
            lo = jnp.minimum(lo, jnp.where(fin, t, jnp.inf))
            hi = jnp.maximum(hi, jnp.where(fin, t, -jnp.inf))
    return hi - lo


def _median_fill(disp, valid, coh_tau):
    """NaN-aware 3x3 median that also fills invalid pixels from their valid
    neighbors; with ``coh_tau`` > 0 a rejected pixel is only resurrected
    when the neighborhood disparity spread is <= tau, so occlusion-boundary
    fills (foreground/background mixtures) stay invalid."""
    med = _nan_median3(disp)
    if coh_tau > 0:
        coherent = _nan_spread3(disp) <= coh_tau
        med = jnp.where(valid | coherent, med, jnp.nan)
    return med, jnp.isfinite(med)


def _subpixel(S, d_int, mode):
    """Subpixel offset from the aggregated costs around the WTA disparity."""
    D = S.shape[-1]
    c1 = jnp.take_along_axis(S, d_int[..., None], axis=-1)[..., 0]
    c0 = jnp.take_along_axis(S, jnp.maximum(d_int - 1, 0)[..., None], axis=-1)[..., 0]
    c2 = jnp.take_along_axis(S, jnp.minimum(d_int + 1, D - 1)[..., None], axis=-1)[..., 0]
    # guard against inf sentinels (invalid candidates at range edges)
    big = c1 + 1e6
    c0 = jnp.where(jnp.isfinite(c0), c0, big)
    c2 = jnp.where(jnp.isfinite(c2), c2, big)
    interior = (d_int > 0) & (d_int < D - 1)
    if mode == 'vfit':
        # fit a symmetric V through the three samples (mgm '-s vfit')
        den = 2.0 * (jnp.maximum(c0, c2) - c1)
        off = (c0 - c2) / jnp.maximum(den, 1e-9)
    elif mode == 'parabola':
        den = c0 - 2.0 * c1 + c2
        off = 0.5 * (c0 - c2) / jnp.maximum(den, 1e-9)
    else:
        return jnp.zeros_like(c1)
    off = jnp.clip(off, -0.5, 0.5)
    return jnp.where(interior, off, 0.0)


def _right_disparity(S, disp_min, subpix_mode='vfit'):
    """Right-reference WTA disparity from the left aggregated volume.

    S_R[y, x2, k] = S_L[y, x2 - (disp_min + k), k]; returns the (negated)
    subpixel right disparity dR(x2) = -(disp_min + argmin_k S_R + offset),
    so the left-right test compares two subpixel maps like the reference's
    TESTLRRL does.  ``disp_min`` may be a traced scalar.
    """
    h, w, D = S.shape
    dm = jnp.asarray(disp_min, jnp.int32)
    xs = jnp.arange(w)[:, None] - (dm + jnp.arange(D))[None, :]
    inb = (xs >= 0) & (xs < w)
    xs_c = jnp.clip(xs, 0, w - 1)
    S_R = S[:, xs_c, jnp.arange(D)[None, :]]
    S_R = jnp.where(inb[None], S_R, jnp.inf)
    kR = jnp.argmin(S_R, axis=-1)
    off = _subpixel(S_R, kR, subpix_mode)
    return -(dm.astype(S.dtype) + kR.astype(S.dtype) + off)


def _edge_p2_map(im1, p2, scale):
    """Edge-aware penalty: scale P2 down across strong intensity edges."""
    g = jnp.nan_to_num(im1)
    gy = jnp.abs(jnp.gradient(g, axis=0))
    gx = jnp.abs(jnp.gradient(g, axis=1))
    gm = jnp.maximum(gx, gy)
    # moment-based edge threshold (percentile would need a sort, which
    # compiles poorly on the TPU backend)
    thr = jnp.mean(gm) + 2.0 * jnp.std(gm)
    return jnp.where(gm > thr, p2 * scale, jnp.asarray(p2, g.dtype))


def _use_pallas(im1, im2, disp_min, disp_max, params) -> bool:
    if params.mgm:
        # the pallas kernel implements the independent-scan aggregation;
        # faithful MGM (wavefront recursion) runs through ops/mgm.py
        return False
    if params.backend in ('pallas', 'interpret'):
        want = True
    elif params.backend == 'auto':
        want = jax.default_backend() == 'tpu'
    else:
        want = False
    D = disp_max - disp_min + 1
    return (want and params.cost == 'census'
            and params.census_win ** 2 - 1 <= 24
            and im1.shape == im2.shape
            and im1.shape[0] % 8 == 0 and im1.shape[1] % 8 == 0
            and D % 8 == 0)


def _p2_map(im1, params, p2_scale=None):
    """Per-pixel P2 penalty: edge-aware attenuation and/or an external
    multiplicative weight map (the mgm -wl LSD weights contract)."""
    p2_vol = None
    if params.p2_edge_scale != 1.0:
        p2_vol = _edge_p2_map(im1, params.p2, params.p2_edge_scale)
    if p2_scale is not None:
        base = p2_vol if p2_vol is not None else jnp.full(
            im1.shape, params.p2, jnp.float32)
        p2_vol = base * p2_scale
    return p2_vol


def _aggregate(im1, im2, disp_min, D, params, p2_scale=None,
               allow_pallas=True):
    """Cost volume + multi-direction aggregation: returns
    (S, valid, votes).  ``disp_min`` may be a traced scalar when
    ``allow_pallas`` is False (the vmapped batch path); ``D`` is static."""
    p2_vol = _p2_map(im1, params, p2_scale)
    static_range = isinstance(disp_min, (int, np.integer))

    if allow_pallas and static_range and _use_pallas(
            im1, im2, disp_min, disp_min + D - 1, params):
        from .sgm_pallas import aggregate as aggregate_pallas
        return aggregate_pallas(im1, im2, disp_min, disp_min + D - 1, params,
                                p2map=p2_vol,
                                interpret=(params.backend == 'interpret'))

    if params.cost == 'bt':
        if not static_range:
            raise NotImplementedError(
                'Birchfield-Tomasi cost needs a static disparity range')
        from .census import birchfield_tomasi_cost_volume
        cost, val1 = birchfield_tomasi_cost_volume(im1, im2, disp_min,
                                                   disp_min + D - 1,
                                                   params.census_win)
    else:
        from .census import census_cost_volume_dyn
        cost, val1 = census_cost_volume_dyn(im1, im2, disp_min, D,
                                            params.census_win)
    p1 = jnp.asarray(params.p1, cost.dtype)
    p2 = jnp.asarray(params.p2, cost.dtype)

    if params.mgm:
        # faithful MGM: exact raster-order recursion with TSGM causal
        # neighbors per traversal (the mgm binary's TSGM=3 contract),
        # evaluated as a wavefront scan (ops/mgm.py)
        from .mgm import mgm_aggregate
        pm = None if p2_vol is None else jnp.broadcast_to(p2_vol, im1.shape)
        S, votes = mgm_aggregate(cost, params.p1, params.p2,
                                 nb_dir=params.nb_dir,
                                 tsgm=params.mgm_neighbors, p2_map=pm,
                                 overcount_fix=params.overcount_fix)
        return S, val1, list(votes)

    dirs = _DIRS_8[:max(2, min(params.nb_dir, 8))]
    S = jnp.zeros_like(cost)
    votes = []
    for (dx, dy) in dirs:
        L = _scan_pass(cost, dx, dy, p1, p2, False, p2_vol,
                       params.mgm_neighbors)
        votes.append(jnp.argmin(L, axis=-1))
        S = S + L
    return S, val1, votes


def _match_core(im1, im2, disp_min, D: int, params: SgmParams,
                p2_scale=None, p2_scale_r=None, allow_pallas=True):
    """Shared matcher body.  ``disp_min`` is an int (static entry, pallas
    eligible) or a traced int32 scalar (batch entry); ``D`` is static."""
    static_range = isinstance(disp_min, (int, np.integer))
    disp_max = disp_min + D - 1 if static_range else None
    dmf = jnp.asarray(disp_min, jnp.float32)

    if allow_pallas and static_range and _use_pallas(im1, im2, disp_min,
                                                     disp_max, params):
        from .sgm_pallas import match_pallas
        p2map = _p2_map(im1, params, p2_scale)
        r = match_pallas(im1, im2, disp_min, disp_max, params, p2map,
                         interpret=(params.backend == 'interpret'))
        d_int, votes, val1 = r['d_int'], r['votes'], r['valid1']
        disp = r['disp_raw']
        S = None
        dR_vol = r['dR']
    else:
        S, val1, votes = _aggregate(im1, im2, disp_min, D, params,
                                    p2_scale, allow_pallas)
        d_int = jnp.argmin(S, axis=-1)
        off = _subpixel(S, d_int, params.subpix)
        disp = dmf + d_int.astype(jnp.float32) + off
        dR_vol = None

    dirs = _DIRS_8[:max(2, min(params.nb_dir, 8))]
    consensus = sum((jnp.abs(v - d_int) <= 1) for v in votes)
    confidence = consensus.astype(jnp.float32) / len(dirs)

    # val1 is false where the census window leaves the image or no valid
    # disparity candidate exists (NaN borders of the rectified crops)
    valid = val1
    if params.min_confidence > 0:
        valid = valid & (confidence >= params.min_confidence)
    if params.uniqueness_ratio > 0 and S is not None:
        # OpenCV SGBM uniqueness: any candidate farther than 1 from the
        # WTA must cost more than minS by the given margin
        ks = jnp.arange(S.shape[-1])
        far = jnp.abs(ks[None, None, :] - d_int[..., None]) > 1
        second = jnp.min(jnp.where(far, S, jnp.inf), axis=-1)
        minS = jnp.take_along_axis(S, d_int[..., None], axis=-1)[..., 0]
        valid = valid & (second * (100.0 - params.uniqueness_ratio)
                         >= minS * 100.0)

    if params.median and params.median_first:
        # mgm-style order: smooth the raw maps first, then the LR test
        # compares the two smoothed maps
        disp = jnp.where(valid, _nan_median3(jnp.where(valid, disp, jnp.nan)),
                         jnp.nan)
        valid = valid & jnp.isfinite(disp)

    if params.lr_enabled:
        if params.lr_mode == 'full':
            # true RL pass: aggregate with the roles swapped (the reference
            # TESTLRRL contract) over the mirrored disparity range
            # [-disp_max, -disp_min]; the swapped pass carries the SECONDARY
            # image's weight map (the mgm -wr contract,
            # block_matching.py:191-245)
            dmin_r = -(disp_min + D - 1)
            if allow_pallas and static_range and _use_pallas(
                    im2, im1, dmin_r, -disp_min, params):
                from .sgm_pallas import match_pallas
                p2r = _p2_map(im2, params, p2_scale_r)
                dR = match_pallas(im2, im1, dmin_r, -disp_min, params,
                                  p2r,
                                  interpret=(params.backend == 'interpret')
                                  )['disp_raw']
            else:
                S_R, _, _ = _aggregate(im2, im1, dmin_r, D,
                                       params, p2_scale_r, allow_pallas)
                kR = jnp.argmin(S_R, axis=-1)
                dR = (jnp.asarray(dmin_r, S_R.dtype)
                      + kR.astype(S_R.dtype)
                      + _subpixel(S_R, kR, params.subpix))
        elif dR_vol is not None:
            dR = dR_vol
        else:
            dR = _right_disparity(S, disp_min)
        if params.median and params.median_first:
            dR = _nan_median3(dR)
        w = im1.shape[1]
        x2 = jnp.clip(jnp.round(jnp.arange(w)[None, :] + disp).astype(jnp.int32),
                      0, dR.shape[1] - 1)
        dR_at = jnp.take_along_axis(dR, x2, axis=1)
        if params.lr_int:
            lr_ok = jnp.abs(jnp.round(disp) + jnp.round(dR_at)) <= params.lr_tau
        else:
            lr_ok = jnp.abs(disp + dR_at) <= params.lr_tau
        valid = valid & lr_ok

    disp = jnp.where(valid, disp, jnp.nan)
    if params.median and not params.median_first:
        if params.median_fill:
            # NaN-aware median that fills rejected pixels from valid
            # neighbors (densifies like the binary's output)
            disp, valid = _median_fill(disp, valid, params.fill_coh_tau)
        else:
            # smoothing only: must not resurrect LR-rejected pixels with
            # foreground/background-mixed values
            med = _nan_median3(disp)
            disp = jnp.where(valid, med, jnp.nan)
            valid = valid & jnp.isfinite(disp)
    elif params.median and params.median_first and params.median_fill:
        disp, valid = _median_fill(disp, valid, params.fill_coh_tau)

    return {'disp': disp, 'valid': valid, 'confidence': confidence}


@functools.partial(jax.jit, static_argnames=('disp_min', 'disp_max', 'params'))
def sgm_match(im1, im2, disp_min: int, disp_max: int, params: SgmParams,
              p2_scale=None, p2_scale_r=None):
    """Dense disparity of a rectified pair by census + SGM aggregation.

    Args:
        im1, im2: rectified reference/secondary images (NaN = invalid).
        disp_min, disp_max: inclusive integer disparity bounds (static).
        params: aggregation parameters.

    Returns:
        dict with 'disp' (float32, NaN invalid), 'valid' (bool), and
        'confidence' (float32 in [0, 1], direction-consensus score).
    """
    return _match_core(im1, im2, int(disp_min), disp_max - disp_min + 1,
                       params, p2_scale, p2_scale_r, allow_pallas=True)


@functools.partial(jax.jit, static_argnames=('D', 'params'))
def sgm_match_batch(im1_b, im2_b, disp_min_b, D: int, params: SgmParams):
    """Batched matcher: one compiled program for a whole tile bucket.

    The tile axis vmaps over images of a common padded shape with PER-TILE
    traced disparity bases (disp_min_b int32 (n,)), so tiles with different
    local search ranges share the program -- the mesh execution engine's
    stage-4 kernel.  Shard the leading axis over a device mesh to scale
    (XLA partitions the vmapped program along the batch dimension).
    """
    def one(a, b, dm):
        return _match_core(a, b, dm, D, params, allow_pallas=False)
    return jax.vmap(one)(im1_b, im2_b, jnp.asarray(disp_min_b, jnp.int32))


def match_pair(im1, im2, disp_min, disp_max, params: SgmParams = SgmParams(),
               d_pad_multiple: int = 16, hw_pad_multiple: int = 64,
               p2_scale=None, p2_scale_r=None):
    """Host wrapper: pads the disparity range to a lane-friendly multiple and
    the image shapes to ``hw_pad_multiple`` buckets (NaN margin), so all the
    tiles of a scene share a handful of compiled programs.  Returns numpy
    outputs cropped back to the input shape."""
    disp_min = int(np.floor(disp_min))
    disp_max = int(np.ceil(disp_max))
    D = disp_max - disp_min + 1
    D_pad = -(-D // d_pad_multiple) * d_pad_multiple
    disp_max_p = disp_min + D_pad - 1

    im1 = np.asarray(im1, dtype=np.float32)
    im2 = np.asarray(im2, dtype=np.float32)
    h, w = im1.shape
    Hp = -(-h // hw_pad_multiple) * hw_pad_multiple
    Wp = -(-max(w, im2.shape[1]) // hw_pad_multiple) * hw_pad_multiple

    def pad(a):
        out = np.full((Hp, Wp), np.nan, dtype=np.float32)
        out[:a.shape[0], :a.shape[1]] = a
        return out

    def pad_scale(sc):
        if sc is None:
            return None
        out = np.ones((Hp, Wp), dtype=np.float32)
        out[:sc.shape[0], :sc.shape[1]] = sc
        return jnp.asarray(out)

    out = sgm_match(jnp.asarray(pad(im1)), jnp.asarray(pad(im2)),
                    disp_min, disp_max_p, params, pad_scale(p2_scale),
                    pad_scale(p2_scale_r))
    disp = np.array(out['disp'])[:h, :w]
    valid = np.array(out['valid'])[:h, :w]
    conf = np.asarray(out['confidence'])[:h, :w]
    # discard candidates introduced by the disparity padding
    bad = disp > disp_max + 0.5
    disp[bad] = np.nan
    valid &= ~bad
    return disp, valid, conf
