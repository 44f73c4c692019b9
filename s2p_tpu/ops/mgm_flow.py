"""The mgm binary's end-to-end output flow, reproduced step by step.

The reference's default matcher is the ``mgm`` binary (Facciolo BMVC'15)
invoked as ``mgm -r dmin -R dmax -s vfit -t census -O 8`` with env
``MEDIAN=1 TSGM=3 TESTLRRL=1 TESTLRRL_TAU=1.0 MINDIFF=-1`` and its default
penalties P1=8 / P2=32 (/root/reference/s2p/block_matching.py:155-188,
config.py:135-160).  This module reproduces the BINARY's output semantics,
measured knob by knob against its committed fixture disparity
(tests/data/input_triangulation/pair_1) with tools/harness_match.py:

  * census on raw values: NaN pixels participate as data (IEEE comparisons
    give 0 bits, exactly like out-of-image window samples), costs are
    computed everywhere -- invalid inputs are culled AFTERWARD by s2p's
    rejection mask, not masked inside the volume;
  * out-of-range candidates (x+d outside the secondary) cost
    truncDist*nch = +inf: never winners, and their min-convolution
    contribution degenerates to min_d L + P2 exactly like the C code;
  * the aggregation that matches the fixture is the CLASSIC 8-direction
    SGM recursion (one causal neighbor per scan).  The multi-neighbor
    TSGM recursions (ops/mgm.py wavefront, any fan/level) all measure
    FARTHER from the binary's output -- harness series of 2026-08-20:
    tsgm=1 rms 0.466 / >1px 0.27% / validity IoU 0.981 vs tsgm=2 best
    0.602 / 0.49% / 0.977 -- so despite the TSGM=3 env the shipped
    binary behaves as plain SGM, and that is what production uses;
  * vfit subpixel (offset = (c0-c2) / 2(max(c0,c2)-c1), clipped to +-.5),
    measured better than parabola (p50 0.047 vs 0.066);
  * MEDIAN=1 = 3x3 NaN-discarding median applied to BOTH maps BEFORE the
    left-right test (IoU 0.981 vs 0.972 for median-after-LR; the fixture's
    87 isolated interior NaNs also rule out a filling final median);
  * the left-right test indexes the right map by the ROUNDED left
    disparity, kills out-of-image landings, and keeps C float semantics:
    a NaN at the landing pixel compares FALSE, so the pixel survives.

Batched tiles: padding a tile with NaN would corrupt these border
semantics (NaN census signatures match each other with zero cost), so the
batch entry takes per-tile true extents and (1) zeroes the cost over
reference-side padding -- a zero cost row keeps the scan carry identically
zero, so the first real pixel receives exactly the fresh-border
contribution -- (2) invalidates padding disparities before the median,
reproducing the binary's clipped border windows, and (3) bounds the LR
landing test by the true secondary width.  Padded output == unpadded
output bitwise, for any padding.

Fast path: on TPU both entries route the aggregation + WTA through the
Pallas kernels (ops/sgm_pallas.py) -- measured bitwise-identical to the
lax path on hardware and ~2x faster.  The batch entry keeps ONE compiled
program per bucket despite per-tile traced bases/extents by rebasing
every tile to a static base-0 disparity axis: the base rides a gather of
the secondary census signatures (census is translation-equivariant
including its out-of-image bits), the true extents ride signature bits
(_VALID_BIT -> out-of-range BIG, _PAD_BIT -> fresh-border zero cost), and
the tile's true candidate count is a (D,) mask input.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = jnp.float32(1e9)          # out-of-range sentinel (binary: +inf;
#                                 finite here so argmin/overcount stay NaN-free)

_DIRS_8 = ((1, 0), (-1, 0), (0, 1), (0, -1),
           (1, 1), (-1, -1), (1, -1), (-1, 1))


@dataclasses.dataclass(frozen=True)
class MgmVariant:
    """Semantics knobs of the binary flow.  Defaults are the MEASURED
    best-fit semantics (see module docstring); the other values remain
    so the harness can re-measure any of them."""
    p1: float = 8.0
    p2: float = 32.0
    nb_dir: int = 8
    tsgm: int = 1                  # measured: the binary aggregates as
    #                                classic SGM; >=2 = ops/mgm.py wavefront
    census_win: int = 5
    subpix: str = 'vfit'
    lr_enabled: bool = True
    lr_tau: float = 1.0
    lr_nan_survives: bool = True   # NaN at the LR landing pixel -> survive
    median_order: str = 'before_lr'  # 'before_lr' | 'after_lr' | 'none'
    median_fill: bool = False      # median writes at NaN centers too
    median_even: str = 'upper'     # pick v[n/2] ('upper') or v[(n-1)/2]
    median_shape: str = 'box'      # 3x3 'box' or 5-tap 'cross' window
    subpix_plateau: str = 'clip'   # plateau (den=0): clip to +-0.5 or zero
    edge_subpix: bool = False      # vfit at candidates flanked by oor costs
    overcount_fix: bool = True     # TSGM_FIX_OVERCOUNT=1 (binary default)
    fan: str = 'a'                 # causal-neighbor fan (ops/mgm._FANS)
    backend: str = 'auto'          # 'auto' (pallas on TPU, lax elsewhere),
    #                                'pallas', 'lax', 'interpret'


def census_bits_raw(img, win: int):
    """Bit-packed census signature with the binary's conventions: raw IEEE
    comparisons (NaN neighbors/centers give 0 bits), outside-image window
    samples give 0 bits."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape
    r = win // 2
    nbits = win * win - 1
    n_words = (nbits + 31) // 32
    pad = jnp.pad(img, r, constant_values=jnp.nan)
    words = [jnp.zeros((h, w), jnp.uint32) for _ in range(n_words)]
    bit = 0
    for dy in range(win):
        for dx in range(win):
            if dy == r and dx == r:
                continue
            nb = pad[dy:dy + h, dx:dx + w]
            words[bit // 32] = words[bit // 32] | (
                (nb < img).astype(jnp.uint32) << jnp.uint32(bit % 32))
            bit += 1
    return jnp.stack(words, axis=-1)


def _pad_mask(h, w, h_true, w_true):
    """(h, w) bool: True over the padding region beyond the true extents."""
    ys = jnp.arange(h)[:, None] >= jnp.asarray(h_true, jnp.int32)
    xs = jnp.arange(w)[None, :] >= jnp.asarray(w_true, jnp.int32)
    return ys | xs


def census_cost_raw(im1, im2, disp_min, D: int, win: int,
                    h1=None, w1=None, w2=None, d_true=None):
    """(h, w, D) hamming cost; out-of-range candidates get BIG.

    ``disp_min`` and the true extents may be traced int32 scalars (the
    batched-tiles entry).  ``h1``/``w1`` bound the real data of the
    reference side: cost is ZERO over its padding so scan carries stay
    identically zero until the first real pixel (see module docstring).
    ``w2`` is the true secondary width bounding in-range candidates;
    ``d_true`` the tile's true candidate count -- the disparity-axis
    padding of a bucket must NOT widen the search the binary ran, so
    candidates beyond it also get BIG."""
    sig1 = census_bits_raw(im1, win)
    sig2 = census_bits_raw(im2, win)
    h, w = sig1.shape[:2]
    pad_zero = h1 is not None or w1 is not None
    if w2 is None:
        w2 = sig2.shape[1]
    disp_min = jnp.asarray(disp_min, jnp.int32)
    ks = jnp.arange(D)
    xs = jnp.arange(w)[:, None] + disp_min + ks[None, :]
    inb = (xs >= 0) & (xs < jnp.asarray(w2, jnp.int32))
    if d_true is not None:
        inb = inb & (ks < jnp.asarray(d_true, jnp.int32))[None, :]
    xs_c = jnp.clip(xs, 0, sig2.shape[1] - 1)
    sig2_g = sig2[:, xs_c, :]
    xor = jnp.bitwise_xor(sig1[:, :, None, :], sig2_g)
    ham = jnp.sum(jax.lax.population_count(xor), axis=-1).astype(jnp.float32)
    cost = jnp.where(inb[None], ham, BIG)
    if pad_zero:
        padding = _pad_mask(h, w, h if h1 is None else h1,
                            w if w1 is None else w1)
        cost = jnp.where(padding[..., None], 0.0, cost)
    return cost


def _aggregate_flow(cost, v: MgmVariant, p2_map=None):
    """Multi-direction aggregation + per-direction votes.

    tsgm == 1 (the measured binary semantics) runs the classic independent
    scans -- O(H) or O(W) scan steps, the Pallas-friendly form; tsgm >= 2
    runs the exact multi-neighbor wavefront recursion (ops/mgm.py)."""
    if v.tsgm >= 2:
        from .mgm import mgm_aggregate
        S, votes = mgm_aggregate(cost, v.p1, v.p2, nb_dir=v.nb_dir,
                                 tsgm=v.tsgm, p2_map=p2_map,
                                 overcount_fix=v.overcount_fix, fan=v.fan)
        return S, list(votes)
    from .sgm import _scan_pass
    p1 = jnp.asarray(v.p1, cost.dtype)
    p2 = jnp.asarray(v.p2, cost.dtype)
    dirs = _DIRS_8[:max(2, min(v.nb_dir, 8))]
    S = jnp.zeros_like(cost)
    votes = []
    for (dx, dy) in dirs:
        L = _scan_pass(cost, dx, dy, p1, p2, False, p2_map)
        votes.append(jnp.argmin(L, axis=-1))
        S = S + L
    if v.overcount_fix:
        S = S - (len(dirs) - 1) * cost
    return S, votes


def _wta_refine(S, disp_min, v: MgmVariant):
    """WTA + subpixel refinement with the binary's edge handling."""
    D = S.shape[-1]
    d_int = jnp.argmin(S, axis=-1)
    c1 = jnp.take_along_axis(S, d_int[..., None], -1)[..., 0]
    c0 = jnp.take_along_axis(S, jnp.maximum(d_int - 1, 0)[..., None], -1)[..., 0]
    c2 = jnp.take_along_axis(S, jnp.minimum(d_int + 1, D - 1)[..., None], -1)[..., 0]
    ok = (d_int > 0) & (d_int < D - 1)
    if not v.edge_subpix:
        # oor neighbors carry ~BIG cost: the C vfit on an infinite side
        # slope returns no refinement
        ok = ok & (c0 < BIG / 2) & (c2 < BIG / 2)
    if v.subpix == 'vfit':
        den = 2.0 * (jnp.maximum(c0, c2) - c1)
        off = (c0 - c2) / jnp.maximum(den, 1e-9)
    elif v.subpix == 'parabola':
        den = c0 - 2.0 * c1 + c2
        off = 0.5 * (c0 - c2) / jnp.maximum(den, 1e-9)
    else:
        den = jnp.ones_like(c1)
        off = jnp.zeros_like(c1)
    off = jnp.clip(off, -0.5, 0.5)
    if v.subpix_plateau == 'zero':
        off = jnp.where(den > 1e-9, off, 0.0)
    disp = (jnp.asarray(disp_min, jnp.float32) + d_int.astype(jnp.float32)
            + jnp.where(ok, off, 0.0))
    # a pixel with no in-range candidate at all (possible when the whole
    # range lies outside the secondary) is invalid from the start
    disp = jnp.where(c1 < BIG / 2, disp, jnp.nan)
    return disp, d_int


def _median3x3(x, v: MgmVariant):
    """3x3 NaN-discarding median via an odd-even sorting network (9 taps).

    ``median_even`` picks v[n/2] (the C std::sort middle, upper) or the
    lower middle; ``median_fill`` controls writing at NaN centers."""
    h, w = x.shape
    pad = jnp.pad(x, 1, constant_values=jnp.nan)
    taps = [pad[dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)]
    if v.median_shape == 'cross':
        taps = [taps[i] for i in (1, 3, 4, 5, 7)] + [
            jnp.full_like(x, jnp.nan)] * 4
    n = sum(jnp.isfinite(t).astype(jnp.int32) for t in taps)
    vals = [jnp.where(jnp.isnan(t), jnp.inf, t) for t in taps]
    for r in range(9):
        for i in range(r % 2, 8, 2):
            lo = jnp.minimum(vals[i], vals[i + 1])
            hi = jnp.maximum(vals[i], vals[i + 1])
            vals[i], vals[i + 1] = lo, hi
    idx = n // 2 if v.median_even == 'upper' else jnp.maximum(n - 1, 0) // 2
    idx = jnp.clip(idx, 0, 8)
    med = vals[0]
    for k in range(1, 9):
        med = jnp.where(idx == k, vals[k], med)
    med = jnp.where(n > 0, med, jnp.nan)
    if not v.median_fill:
        med = jnp.where(jnp.isfinite(x), med, jnp.nan)
    return med


def _lr_kill(dL, dR, v: MgmVariant, w2, k_lo=None, k_cnt: int = None):
    """main_mgm leftright_test: index the right map at x + round(dL);
    out-of-image landings (by the TRUE secondary width) die; |dL + dR| >
    tau dies; NaN dR at the landing makes the C comparison false ->
    survives (lr_nan_survives).

    When the caller knows the landing-offset window (``k_lo`` traced
    lower bound, ``k_cnt`` STATIC count -- every finite rounded disparity
    lies in [k_lo, k_lo + k_cnt)), the per-pixel landing lookup runs as a
    dynamic slice + k_cnt static shift-selects instead of a
    take_along_axis gather: XLA:TPU lowers the gather to a scalar loop
    (~3.2 ms/tile measured, tools/probe_ablate.py) while the shifted
    selects fuse into one vector pass.  Pixels whose rounded offset falls
    outside the window read NaN -- only possible for NaN disparities or
    out-of-image landings, where the output is NaN either way, so both
    paths are bitwise identical."""
    h, w = dL.shape
    r = jnp.round(jnp.nan_to_num(dL)).astype(jnp.int32)
    xx = jnp.arange(w)[None, :] + r
    inb = (xx >= 0) & (xx < jnp.asarray(w2, jnp.int32))
    if k_cnt is None:
        dR_at = jnp.take_along_axis(dR, jnp.clip(xx, 0, dR.shape[1] - 1),
                                    axis=1)
    else:
        k_lo = jnp.asarray(k_lo, jnp.int32)
        pad = w + k_cnt
        dRw = jnp.pad(dR, ((0, 0), (pad, pad)),
                      constant_values=jnp.nan)
        dRw = jax.lax.dynamic_slice(dRw, (jnp.int32(0), pad + k_lo),
                                    (h, w + k_cnt))
        kk = r - k_lo
        dR_at = jnp.full_like(dL, jnp.nan)
        for j in range(k_cnt):
            dR_at = jnp.where(kk == j, dRw[:, j:j + w], dR_at)
    bad = jnp.abs(dL + dR_at) > v.lr_tau
    if v.lr_nan_survives:
        bad = bad & jnp.isfinite(dR_at)
    else:
        bad = bad | ~jnp.isfinite(dR_at)
    return jnp.where(inb & ~bad, dL, jnp.nan)


def _use_pallas_flow(im1, im2, disp_min, D, v: MgmVariant,
                     h1, w1, w2, d_true) -> bool:
    """The Pallas fast path serves the static-extent (host) entry; the
    vmapped batch entry with traced scalars stays on the lax path."""
    import jax
    if v.backend in ('pallas', 'interpret'):
        want = True
    elif v.backend == 'auto':
        want = jax.default_backend() == 'tpu'
    else:
        want = False
    static = all(x is None or isinstance(x, (int, np.integer))
                 for x in (disp_min, h1, w1, w2, d_true))
    from .sgm_pallas import scan_vmem_plan
    return (want and static and v.tsgm == 1
            and v.census_win ** 2 - 1 <= 32
            and im1.shape == im2.shape
            and im1.shape[0] % 8 == 0 and im1.shape[1] % 8 == 0
            # huge buckets (large D x lanes) exceed the VMEM arena and
            # hard-crash the remote compiler: lax path instead
            and scan_vmem_plan(im1.shape[0], im1.shape[1], D)[0])


def _mgm_one_side(im1, im2, disp_min, D: int, v: MgmVariant,
                  h1=None, w1=None, w2=None, p2_map=None, d_true=None,
                  need_votes=True):
    if _use_pallas_flow(im1, im2, disp_min, D, v, h1, w1, w2, d_true):
        from .sgm_pallas import flow_one_side_pallas
        ext = None
        if any(x is not None for x in (h1, w1, w2, d_true)):
            ext = (im1.shape[0] if h1 is None else int(h1),
                   im1.shape[1] if w1 is None else int(w1),
                   im2.shape[1] if w2 is None else int(w2),
                   D if d_true is None else int(d_true))
        disp, d_int, votes = flow_one_side_pallas(
            im1, im2, int(disp_min), D, v, p2_map,
            interpret=(v.backend == 'interpret'), ext=ext,
            emit_votes=need_votes)
        if ext is not None:
            h, w = disp.shape
            disp = jnp.where(_pad_mask(h, w, ext[0], ext[1]), jnp.nan, disp)
        return disp, d_int, votes
    cost = census_cost_raw(im1, im2, disp_min, D, v.census_win, h1, w1, w2,
                           d_true)
    # materialization point: when the L and R sides compile into ONE
    # program (the vmapped batch entry), XLA:TPU mis-fuses the shared
    # census producers with the two different gather consumers and the
    # first side's WTA comes out wrong at >=~350px tiles (measured
    # 2026-08-20: 6% of pixels off by >=1px, absmax = the full range,
    # deterministic, CPU unaffected).  The barrier restores bitwise
    # equality with the single-tile program at zero measurable cost.
    cost = jax.lax.optimization_barrier(cost)
    S, votes = _aggregate_flow(cost, v, p2_map)
    disp, d_int = _wta_refine(S, disp_min, v)
    if h1 is not None or w1 is not None:
        h, w = disp.shape
        disp = jnp.where(_pad_mask(h, w, h if h1 is None else h1,
                                   w if w1 is None else w1), jnp.nan, disp)
    return disp, d_int, votes


def _flow_post(dL, dR, d_int, votes, v: MgmVariant, w2_true,
               k_lo=None, k_cnt=None):
    """The flow's post chain: median placement, LR test, confidence.
    ``k_lo``/``k_cnt``: the LR landing-offset window (see _lr_kill)."""
    if v.median_order == 'before_lr':
        dL = _median3x3(dL, v)
        if dR is not None:
            dR = _median3x3(dR, v)
    if dR is not None:
        dL = _lr_kill(dL, dR, v, w2_true, k_lo, k_cnt)
    if v.median_order == 'after_lr':
        dL = _median3x3(dL, v)
    consensus = sum((jnp.abs(w - d_int) <= 1) for w in votes)
    confidence = consensus.astype(jnp.float32) / len(votes)
    return dL, confidence


def _flow_core(im1, im2, disp_min, D: int, v: MgmVariant,
               h1=None, w1=None, w2=None, p2_map=None, p2_map_r=None,
               d_true=None):
    """Shared body; ``disp_min`` and the true extents are static ints or
    traced int32 scalars (the batch entry vmaps over them)."""
    dL, d_int, votes = _mgm_one_side(im1, im2, disp_min, D, v,
                                     h1, w1, w2, p2_map, d_true)
    dR = None
    if v.lr_enabled:
        # mirrored range [-dmax_true, -dmin]: the right scan of the binary
        # covers exactly the negated true range, so under D-padding the
        # right base shifts with d_true, not with the padded D
        dt = D if d_true is None else d_true
        dmin_r = -(disp_min + dt - 1)
        w1_true = im1.shape[1] if w1 is None else w1
        dR, _, _ = _mgm_one_side(im2, im1, dmin_r, D, v,
                                 h1, w2, w1_true, p2_map_r, d_true,
                                 need_votes=False)
    w2_true = im2.shape[1] if w2 is None else w2
    return _flow_post(dL, dR, d_int, votes, v, w2_true,
                      k_lo=jnp.asarray(disp_min, jnp.int32) - 1,
                      k_cnt=D + 2)


@functools.partial(jax.jit, static_argnames=('disp_min', 'D', 'variant'))
def _flow_jit(im1, im2, disp_min: int, D: int, variant: MgmVariant):
    return _flow_core(im1, im2, disp_min, D, variant)


def mgm_binary_match(im1, im2, disp_min: int, disp_max: int,
                     variant: MgmVariant = MgmVariant()):
    """Binary-faithful disparity of a rectified pair (host entry).

    Returns (disp, confidence): float32 disparity (NaN = rejected, exactly
    the binary's rectified_disp.tif contract) and the consensus-confidence
    map (the -confidence_consensusL output).  Shapes are padded to the
    Pallas-friendly multiple with STATIC true extents, so the fast path
    applies and the output is bitwise the unpadded result (the
    padding-exactness construction)."""
    im1 = np.asarray(im1, np.float32)
    im2 = np.asarray(im2, np.float32)
    D = int(disp_max) - int(disp_min) + 1
    h1, w1 = im1.shape
    h2, w2 = im2.shape
    Hp = -(-max(h1, h2) // 8) * 8
    Wp = -(-max(w1, w2) // 8) * 8
    if (Hp, Wp) == im1.shape == im2.shape:
        disp, conf = _flow_jit(jnp.asarray(im1), jnp.asarray(im2),
                               int(disp_min), D, variant)
        return disp, conf

    def pad(a):
        out = np.full((Hp, Wp), np.nan, np.float32)
        out[:a.shape[0], :a.shape[1]] = a
        return jnp.asarray(out)

    disp, conf = _flow_ext_jit(pad(im1), pad(im2), int(disp_min), D,
                               variant, h1, w1, w2)
    return disp[:h1, :w1], conf[:h1, :w1]


@functools.partial(jax.jit, static_argnames=('disp_min', 'D', 'variant',
                                             'h1', 'w1', 'w2'))
def _flow_ext_jit(im1, im2, disp_min: int, D: int, variant: MgmVariant,
                  h1: int, w1: int, w2: int):
    return _flow_core(im1, im2, disp_min, D, variant, h1, w1, w2,
                      d_true=D)


def _shift_sig_cols(sig, shift, w_true, extra: int = 0):
    """shifted[y, x] = sig[y, x + shift] for x in [0, W + extra), with the
    _VALID_BIT set only where the source column lies in [0, w_true) -- the
    disparity rebase (census is translation-equivariant including its NaN
    border bits, so shifting the SIGNATURE equals matching at base
    ``shift``).  ``extra`` widens the output so every candidate position
    x + k of the kernel exists even when the rebase shifts content right
    (base < w_true - W; the margin must cover the candidate count).

    The shift is a traced scalar, so this is a ``dynamic_slice`` of a
    padded row, NOT a gather -- XLA:TPU lowers per-pixel gathers to
    scalar loops (measured ~2.5 ms/tile, tools/probe_ablate.py) while a
    dynamic slice is a contiguous copy.  Out-of-range positions carry
    zero signatures with _VALID_BIT clear; their values are never read
    (the kernel costs them BIG), matching the old clamped-gather
    contract bitwise."""
    H, W = sig.shape
    shift = jnp.asarray(shift, jnp.int32)
    # any shift with a valid candidate lies in (-(W+extra), w_true <= W):
    # pad so the slice start never clamps inside that range
    pad = W + extra
    padded = jnp.pad(sig, ((0, 0), (pad, pad)))
    g = jax.lax.dynamic_slice(padded, (jnp.int32(0), pad + shift),
                              (H, W + extra))
    xs = jnp.arange(W + extra)[None, :] + shift
    ok = (xs >= 0) & (xs < jnp.asarray(w_true, jnp.int32))
    from .sgm_pallas import _VALID_BIT
    return g | (jnp.broadcast_to(ok, (H, W + extra)).astype(jnp.uint32)
                << _VALID_BIT)


def _flow_one_batched_pallas(a, b, dm, D, h1, w1, w2, dt, v: MgmVariant):
    """One tile of the batched Pallas flow.  The kernel's disparity base
    is STATIC 0 for every tile: the per-tile traced base rides a gather
    of the secondary census signatures (``_shift_sig_cols``), the true
    extents ride signature bits, and the tile's true candidate count is a
    (D,) mask input -- so one compiled program serves the whole bucket
    and each tile's output is bitwise its unpadded single run."""
    from .sgm_pallas import (_PAD_BIT, _VALID_BIT, _wta_pallas,
                             flow_partials_from_sigs)
    H, W = a.shape
    s1 = census_bits_raw(a, v.census_win)[..., 0]
    s2 = census_bits_raw(b, v.census_win)[..., 0]
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    one = jnp.uint32(1)
    allowed = (jnp.arange(D) < dt).astype(jnp.int32)
    interp = v.backend == 'interpret'

    def side(sig_ref, sig_sec, base, h_ref, w_ref, w_sec,
             need_votes=True):
        pad = (ys >= h_ref) | (xs >= w_ref)
        sr = (sig_ref | (one << _VALID_BIT)
              | (pad.astype(jnp.uint32) << _PAD_BIT))
        # margin D: candidate positions x + k reach W - 1 + D - 1 and the
        # rebase may shift content right by up to the full range
        ss = _shift_sig_cols(sig_sec, base, w_sec, extra=D)
        parts, votes = flow_partials_from_sigs(sr, ss, 0, D, v,
                                               allowed=allowed,
                                               interpret=interp,
                                               emit_votes=need_votes)
        off, d_int, _ = _wta_pallas(parts, 0, v.subpix, interpret=interp,
                                    big_guard=float(BIG) / 2,
                                    with_dr=False, emit_offset=True)
        # (base + d_int) + off: the same float composition as the lax and
        # static-base paths, so the rebase stays bitwise-neutral
        disp = (jnp.asarray(base, jnp.float32)
                + d_int.astype(jnp.float32)) + off
        disp = jnp.where(pad, jnp.nan, disp)
        return disp, d_int, votes

    dL, d_int, votes = side(s1, s2, dm, h1, w1, w2)
    dR = None
    if v.lr_enabled:
        dmax = dm + dt - 1
        # the R side's votes feed nothing (confidence is L-consensus):
        # skip their reductions and output volumes
        dR, _, _ = side(s2, s1, -dmax, h1, w2, w1, need_votes=False)
    return _flow_post(dL, dR, d_int, votes, v, w2,
                      k_lo=jnp.asarray(dm, jnp.int32) - 1, k_cnt=D + 2)


def _flow_lane_folded(a_bt, b_bt, dm_b, D: int, h_b, w1_b, w2_b, dt_b,
                      v: MgmVariant):
    """Lane-folded batch flow: B tiles concatenated along the Pallas lane
    axis so each sequential DP step of the aggregation carries B tiles of
    independent work (PERF.md lever 2; sgm_pallas.flow_partials_folded has
    the construction).  Per-tile traced bases/extents ride the same
    signature-gather/bit contract as the per-tile batched path, and each
    tile's output is bitwise its single unpadded run."""
    from .sgm_pallas import (_PAD_BIT, _VALID_BIT, _wta_pallas,
                             flow_partials_folded, lane_fold_plan,
                             unfold_lanes_v)
    B, H, W = a_bt.shape
    _, G, presum, Wseg = lane_fold_plan(H, W, D)
    extra = Wseg - W
    interp = v.backend == 'interpret'
    census = jax.vmap(lambda im: census_bits_raw(im, v.census_win)[..., 0])
    s1_raw = census(a_bt)
    s2_raw = census(b_bt)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(Wseg)[None, :]
    one = jnp.uint32(1)
    dm_b = jnp.asarray(dm_b, jnp.int32)
    dt_b = jnp.asarray(dt_b, jnp.int32)
    allowed = (jnp.arange(D)[None, :]
               < dt_b[:, None]).astype(jnp.int32)          # (B, D)

    def side(sig_ref, sig_sec, base_b, h_ref_b, w_ref_b, w_sec_b,
             need_votes=True):
        def annotate(sig, h_ref, w_ref):
            srp = jnp.pad(sig, ((0, 0), (0, extra)))
            pad = (ys >= h_ref) | (xs >= w_ref)
            return (srp | (one << _VALID_BIT)
                    | (pad.astype(jnp.uint32) << _PAD_BIT))

        sr = jax.vmap(annotate)(sig_ref, h_ref_b, w_ref_b)
        ss = jax.vmap(
            lambda s, sh, wt: _shift_sig_cols(s, sh, wt, extra=extra))(
                sig_sec, base_b, w_sec_b)
        parts, votes = flow_partials_folded(sr, ss, D, v,
                                            allowed_bt=allowed, G=G,
                                            interpret=interp,
                                            emit_votes=need_votes)
        if presum and len(parts) > 1:
            # one extra volume round-trip, but the WTA's VMEM windows
            # halve -- the plan decides from the budget
            parts = [sum(parts[1:], parts[0])]
        off_f, dint_f, _ = _wta_pallas(parts, 0, v.subpix,
                                       interpret=interp,
                                       big_guard=float(BIG) / 2,
                                       with_dr=False, emit_offset=True)
        off = unfold_lanes_v(off_f, B)[:, :, :W]
        d_int = unfold_lanes_v(dint_f, B)[:, :, :W]
        votes = [unfold_lanes_v(vo, B)[:, :, :W] for vo in votes
                 if vo is not None]
        disp = (base_b[:, None, None].astype(jnp.float32)
                + d_int.astype(jnp.float32)) + off
        pad = ((ys[None] >= h_ref_b[:, None, None])
               | (jnp.arange(W)[None, None, :] >= w_ref_b[:, None, None]))
        return jnp.where(pad, jnp.nan, disp), d_int, votes

    dL, d_int, votes = side(s1_raw, s2_raw, dm_b, h_b, w1_b, w2_b)
    if v.lr_enabled:
        dmax_b = dm_b + dt_b - 1
        dR, _, _ = side(s2_raw, s1_raw, -dmax_b, h_b, w2_b, w1_b,
                        need_votes=False)
        return jax.vmap(
            lambda dl, dr, di, vo, w2, kl: _flow_post(
                dl, dr, di, vo, v, w2, k_lo=kl, k_cnt=D + 2))(
                dL, dR, d_int, votes, w2_b, dm_b - 1)
    return jax.vmap(
        lambda dl, di, vo, w2: _flow_post(dl, None, di, vo, v, w2))(
            dL, d_int, votes, w2_b)


def _use_pallas_batch(im1_b, D: int, v: MgmVariant) -> bool:
    import jax
    if v.backend in ('pallas', 'interpret'):
        want = True
    elif v.backend == 'auto':
        want = jax.default_backend() == 'tpu'
    else:
        want = False
    from .sgm_pallas import scan_vmem_plan
    # the rebased batch widens the secondary to W + D
    return (want and v.tsgm == 1 and v.census_win ** 2 - 1 <= 24
            and im1_b.shape[1] % 8 == 0 and im1_b.shape[2] % 8 == 0
            and scan_vmem_plan(im1_b.shape[1],
                               im1_b.shape[2] + D, D)[0])


@functools.partial(jax.jit, static_argnames=('D', 'variant'))
def mgm_binary_match_batch(im1_b, im2_b, disp_min_b, D: int,
                           h_b, w1_b, w2_b, d_b=None,
                           variant: MgmVariant = MgmVariant()):
    """Batched binary-faithful matcher: one program for a tile bucket.

    Tiles share a padded (n, Hp, Wp) shape; per-tile TRACED disparity
    bases and true extents keep one compiled program per bucket while the
    padding-exactness construction (module docstring) guarantees each
    tile's output equals its unpadded run bitwise.  Shard the leading axis
    over the device mesh to scale.

    Returns dict with 'disp' (NaN = rejected) and 'confidence'.
    """
    if d_b is None:
        d_b = jnp.full(jnp.asarray(disp_min_b).shape, D)

    # the confidence map is consensus/n_votes with consensus in 0..8:
    # ship it across the tunnel as uint8 counts (confidence_u8); the
    # driver reconstructs count/n in f32 -- the identical IEEE division
    # the device performs -- at 1/4 the fetched bytes
    nv = max(2, min(variant.nb_dir, 8))

    def finish(out):
        out['confidence_u8'] = (out['confidence'] * nv).astype(jnp.uint8)
        return out

    args = (im1_b, im2_b,
            jnp.asarray(disp_min_b, jnp.int32),
            jnp.asarray(h_b, jnp.int32),
            jnp.asarray(w1_b, jnp.int32),
            jnp.asarray(w2_b, jnp.int32),
            jnp.asarray(d_b, jnp.int32))

    if _use_pallas_batch(im1_b, D, variant):
        def one(a, b, dm, h1, w1, w2, dt):
            d, c = _flow_one_batched_pallas(a, b, dm, D, h1, w1, w2, dt,
                                            variant)
            return {'disp': d, 'confidence': c}

        from .sgm_pallas import lane_fold_plan
        n, H, W = im1_b.shape
        Bf = min(lane_fold_plan(H, W, D)[0], n)
        if Bf > 1:
            # lane-folded groups of Bf tiles share one DP slab (PERF.md
            # lever 2); the tail short of a group runs the per-tile path
            m, r = divmod(n, Bf)

            def grp(a, b, dm, h1, w1, w2, dt):
                d, c = _flow_lane_folded(a, b, dm, D, h1, w1, w2, dt,
                                         variant)
                return {'disp': d, 'confidence': c}

            folded = jax.vmap(grp)(*(
                a[:m * Bf].reshape((m, Bf) + a.shape[1:]) for a in args))
            folded = jax.tree.map(
                lambda x: x.reshape((m * Bf,) + x.shape[2:]), folded)
            if r == 0:
                return finish(folded)
            tail = jax.vmap(one)(*(a[m * Bf:] for a in args))
            return finish(jax.tree.map(
                lambda x, y: jnp.concatenate([x, y], axis=0), folded,
                tail))
    else:
        def one(a, b, dm, h1, w1, w2, dt):
            d, c = _flow_core(a, b, dm, D, variant, h1, w1, w2, d_true=dt)
            return {'disp': d, 'confidence': c}
    return finish(jax.vmap(one)(*args))


# --------------------------------------------------------------------- #
# mgm_multi: the -S 6 multiscale cascade
# --------------------------------------------------------------------- #
#
# The reference's production matcher for real scenes is the mgm_multi
# binary: ``mgm_multi -r dmin -R dmax -S 6 -s vfit -t census -O 8
# -P1 8m -P2 32m`` with env REMOVESMALLCC=25, SUBPIX=2, TESTLRRL=1,
# CENSUS_NCC_WIN=5 and NO median (/root/reference/s2p/block_matching.py:
# 268-310; the lsd variant additionally passes per-image weight maps,
# MEDIAN=1 and P1/P2 = 12/48, :191-245).  Structure: a gaussian image
# pyramid where each level runs the full single-scale flow over a
# PER-PIXEL disparity interval derived from the coarser level's output
# (min/max over a 3x3 window of the upsampled map, +- a safety margin;
# pixels with no coarse information search the full range), with
# candidate steps of 1/SUBPIX, mutual left-right tests at every level,
# and the speckle filter applied by the caller at the end.  There is no
# committed mgm_multi fixture to measure against, so the cascade is
# faithful by construction to this published structure.


def _downsample2_img(img):
    """Binomial 5-tap blur + 2x decimation (the binary's gaussian zoom-out;
    C float semantics: NaN spreads through the blur)."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0
    h, w = img.shape
    p = jnp.pad(img, ((2, 2), (0, 0)), mode='edge')
    v = sum(p[i:i + h] * k[i] for i in range(5))
    p = jnp.pad(v, ((0, 0), (2, 2)), mode='edge')
    v = sum(p[:, i:i + w] * k[i] for i in range(5))
    return v[::2, ::2]


def _minmax3_nan(x):
    """NaN-ignoring 3x3 min and max (all-NaN windows give +inf/-inf)."""
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
    return lo, hi


def _upsample2_vals(d, out_h, out_w):
    """Nearest 2x upsample of a coarse map, cropped to the fine shape."""
    up = jnp.repeat(jnp.repeat(d, 2, axis=0), 2, axis=1)
    return up[:out_h, :out_w]


def _range_maps_from_coarse(d_coarse, out_h, out_w, lo_glob, hi_glob,
                            margin: float = 2.0):
    """Per-pixel disparity interval for the finer level: 2x the coarse
    disparities, min/max over a 3x3 window, +- margin; no-information
    pixels (coarse NaN) fall back to the global range."""
    up = 2.0 * _upsample2_vals(d_coarse, out_h, out_w)
    lo, hi = _minmax3_nan(up)
    lo_glob = jnp.asarray(lo_glob, jnp.float32)
    hi_glob = jnp.asarray(hi_glob, jnp.float32)
    lo = jnp.where(jnp.isfinite(lo), jnp.maximum(lo - margin, lo_glob),
                   lo_glob)
    hi = jnp.where(jnp.isfinite(hi), jnp.minimum(hi + margin, hi_glob),
                   hi_glob)
    return lo, hi


def _census_cost_frac(im1, im2, disp_min, D: int, sd: int, win: int,
                      h1=None, w1=None, w2=None, d_true=None,
                      lo_map=None, hi_map=None):
    """Census cost over fractional candidates val_k = disp_min + k/sd.

    ``sd`` = SUBPIX: candidates step 1/sd, matching the secondary's census
    signature interpolated at the fractional shifts.  ``lo_map``/``hi_map``
    are per-pixel disparity intervals (value units) from the coarser
    cascade level; candidates outside get BIG like out-of-range ones."""
    sigs = []
    im2 = jnp.asarray(im2, jnp.float32)
    for f in range(sd):
        if f == 0:
            sigs.append(census_bits_raw(im2, win))
        else:
            frac = f / sd
            shifted = (1.0 - frac) * im2 + frac * jnp.concatenate(
                [im2[:, 1:], jnp.full_like(im2[:, :1], jnp.nan)], axis=1)
            sigs.append(census_bits_raw(shifted, win))
    sig1 = census_bits_raw(im1, win)
    h, w = sig1.shape[:2]
    if w2 is None:
        w2 = im2.shape[1]
    disp_min = jnp.asarray(disp_min, jnp.int32)
    ks = jnp.arange(D)
    vals = disp_min.astype(jnp.float32) + ks.astype(jnp.float32) / sd
    parts = []
    n_per = -(-D // sd)       # equal-length phase groups (k = f + sd*j)
    for f in range(sd):
        ks_f = f + sd * jnp.arange(n_per)
        xs = jnp.arange(w)[:, None] + disp_min + ks_f[None, :] // sd
        # a fractional candidate interpolates x2 and x2+1: both must exist
        last_ok = jnp.asarray(w2, jnp.int32) - (1 if f else 0)
        inb = (xs >= 0) & (xs < last_ok) & (ks_f < D)[None, :]
        if d_true is not None:
            inb = inb & (ks_f < jnp.asarray(d_true, jnp.int32))[None, :]
        xs_c = jnp.clip(xs, 0, sigs[f].shape[1] - 1)
        sig2_g = sigs[f][:, xs_c, :]
        xor = jnp.bitwise_xor(sig1[:, :, None, :], sig2_g)
        ham = jnp.sum(jax.lax.population_count(xor), axis=-1) \
            .astype(jnp.float32)
        parts.append(jnp.where(inb[None], ham, BIG))
    cost = jnp.stack(parts, axis=-1).reshape(h, w, -1)[:, :, :D]
    if lo_map is not None:
        ok = ((vals[None, None, :] >= lo_map[..., None] - 1e-4)
              & (vals[None, None, :] <= hi_map[..., None] + 1e-4))
        cost = jnp.where(ok, cost, BIG)
    if h1 is not None or w1 is not None:
        padding = _pad_mask(h, w, h if h1 is None else h1,
                            w if w1 is None else w1)
        cost = jnp.where(padding[..., None], 0.0, cost)
    return cost


def _one_side_frac(im1, im2, disp_min, D: int, sd: int, v: MgmVariant,
                   h1, w1, w2, d_true, lo_map, hi_map, p2_map=None):
    cost = _census_cost_frac(im1, im2, disp_min, D, sd, v.census_win,
                             h1, w1, w2, d_true, lo_map, hi_map)
    cost = jax.lax.optimization_barrier(cost)   # cf. _mgm_one_side
    S, votes = _aggregate_flow(cost, v, p2_map)
    disp_idx, d_int = _wta_refine(S, 0, v)      # index units
    disp = jnp.asarray(disp_min, jnp.float32) + disp_idx / sd
    if h1 is not None or w1 is not None:
        h, w = disp.shape
        disp = jnp.where(_pad_mask(h, w, h if h1 is None else h1,
                                   w if w1 is None else w1), jnp.nan, disp)
    return disp, d_int, votes


def _ceil_div(a, b):
    if isinstance(a, (int, np.integer)):
        return -(-a // b)
    return -((-jnp.asarray(a, jnp.int32)) // b)


def _floor_div(a, b):
    if isinstance(a, (int, np.integer)):
        return a // b
    return jnp.asarray(a, jnp.int32) // b


def _multi_core(im1, im2, disp_min, D: int, v: MgmVariant,
                scales: int = 6, sd: int = 2,
                h1=None, w1=None, w2=None, d_true=None,
                p2_map=None, p2_map_r=None):
    """The -S cascade body.  ``disp_min``/``d_true`` and the extents may be
    traced (batch entry); shapes and the level count are static."""
    # image pyramids (fine -> coarse), stopping on tiny levels
    levels = [(jnp.asarray(im1, jnp.float32), jnp.asarray(im2, jnp.float32))]
    exts = [(h1, w1, w2)]
    p2s = [(p2_map, p2_map_r)]
    for s in range(1, scales):
        a, b = levels[-1]
        if min(a.shape) // 2 < 4 * v.census_win:
            break
        levels.append((_downsample2_img(a), _downsample2_img(b)))
        eh, ew1, ew2 = exts[-1]
        exts.append((None if eh is None else _ceil_div(eh, 2),
                     None if ew1 is None else _ceil_div(ew1, 2),
                     None if ew2 is None else _ceil_div(ew2, 2)))
        pa, pb = p2s[-1]
        p2s.append((None if pa is None else pa[::2, ::2],
                    None if pb is None else pb[::2, ::2]))
    S_lv = len(levels)

    dmax_val = (jnp.asarray(disp_min, jnp.int32)
                + (D - 1 if d_true is None else d_true - 1))
    dL = dR = None
    for s in range(S_lv - 1, -1, -1):
        a, b = levels[s]
        eh, ew1, ew2 = exts[s]
        pa, pb = p2s[s]
        dmin_s = _floor_div(disp_min, 2 ** s)
        dmax_s = _ceil_div(dmax_val, 2 ** s)
        # static candidate capacity at this level (covers any traced base)
        D_s = (D - 1) // (2 ** s) + 2
        d_true_s = (dmax_s - dmin_s) * sd + 1
        D_cost = (D_s - 1) * sd + 1
        lo_g = dmin_s.astype(jnp.float32) if hasattr(dmin_s, 'astype') \
            else float(dmin_s)
        hi_g = dmax_s.astype(jnp.float32) if hasattr(dmax_s, 'astype') \
            else float(dmax_s)
        if dL is None:
            loL = hiL = loR = hiR = None
        else:
            h_s, w_s = a.shape
            loL, hiL = _range_maps_from_coarse(dL, h_s, w_s, lo_g, hi_g)
            loR, hiR = _range_maps_from_coarse(dR, h_s, w_s, -hi_g, -lo_g)
        dL, d_intL, votes = _one_side_frac(
            a, b, dmin_s, D_cost, sd, v, eh, ew1, ew2, d_true_s, loL, hiL,
            pa)
        dmin_r = -dmax_s
        dR, _, _ = _one_side_frac(
            b, a, dmin_r, D_cost, sd, v, eh, ew2, ew1, d_true_s, loR, hiR,
            pb)
        if v.median_order == 'before_lr' and v.lr_enabled:
            dL = _median3x3(dL, v)
            dR = _median3x3(dR, v)
        if v.lr_enabled:
            w2_true = b.shape[1] if ew2 is None else ew2
            w1_true = a.shape[1] if ew1 is None else ew1
            # landing-offset windows: dL values lie in [dmin_s, dmax_s],
            # dR in [-dmax_s, -dmin_s]; dmax_s - dmin_s <= D_s + 1 (the
            # floor/ceil level bounds), +3 rounding/margin (see _lr_kill)
            dLk = _lr_kill(dL, dR, v, w2_true,
                           k_lo=jnp.asarray(dmin_s, jnp.int32) - 1,
                           k_cnt=D_s + 4)
            dRk = _lr_kill(dR, dL, v, w1_true,
                           k_lo=-jnp.asarray(dmax_s, jnp.int32) - 1,
                           k_cnt=D_s + 4)
            dL, dR = dLk, dRk
        if v.median_order == 'after_lr':
            dL = _median3x3(dL, v)
            dR = _median3x3(dR, v)
    consensus = sum((jnp.abs(w - d_intL) <= 1) for w in votes)
    confidence = consensus.astype(jnp.float32) / len(votes)
    return dL, confidence


@functools.partial(jax.jit,
                   static_argnames=('disp_min', 'D', 'variant', 'scales',
                                    'subpix'))
def _multi_jit(im1, im2, disp_min: int, D: int, variant: MgmVariant,
               scales: int, subpix: int, p2_map=None, p2_map_r=None):
    return _multi_core(im1, im2, disp_min, D, variant, scales, subpix,
                       p2_map=p2_map, p2_map_r=p2_map_r)


def mgm_multi_match(im1, im2, disp_min: int, disp_max: int,
                    variant: MgmVariant, scales: int = 6, subpix: int = 2,
                    p2_map=None, p2_map_r=None):
    """mgm_multi-faithful disparity (host entry): the -S ``scales`` cascade
    with 1/``subpix`` candidate steps.  Returns (disp, confidence); the
    caller applies REMOVESMALLCC (core/matching.py) like the reference's
    create_rejection_mask stage."""
    im1 = jnp.asarray(np.asarray(im1, np.float32))
    im2 = jnp.asarray(np.asarray(im2, np.float32))
    D = int(disp_max) - int(disp_min) + 1
    p2_map = None if p2_map is None else jnp.asarray(p2_map, jnp.float32)
    p2_map_r = None if p2_map_r is None else jnp.asarray(p2_map_r,
                                                         jnp.float32)
    return _multi_jit(im1, im2, int(disp_min), D, variant, scales, subpix,
                      p2_map, p2_map_r)


@functools.partial(jax.jit, static_argnames=('D', 'variant', 'scales',
                                             'subpix'))
def mgm_multi_match_batch(im1_b, im2_b, disp_min_b, D: int,
                          h_b, w1_b, w2_b, d_b,
                          variant: MgmVariant = MgmVariant(),
                          scales: int = 6, subpix: int = 2):
    """Batched mgm_multi cascade over a tile bucket (cf.
    mgm_binary_match_batch): traced per-tile bases/extents, one compiled
    program per bucket shape."""
    def one(a, b, dm, h1, w1, w2, dt):
        d, c = _multi_core(a, b, dm, D, variant, scales, subpix,
                           h1, w1, w2, dt)
        return {'disp': d, 'confidence': c}
    return jax.vmap(one)(im1_b, im2_b,
                         jnp.asarray(disp_min_b, jnp.int32),
                         jnp.asarray(h_b, jnp.int32),
                         jnp.asarray(w1_b, jnp.int32),
                         jnp.asarray(w2_b, jnp.int32),
                         jnp.asarray(d_b, jnp.int32))
