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

import numpy as np

from ..config import Config
from ..ops.mgm_flow import MgmVariant, mgm_binary_match
from ..ops.morphology import remove_small_disparity_speckles
from ..ops.sgm import SgmParams, match_pair


class MaxDisparityRangeError(Exception):
    pass


def mgm_variant_from_cfg(cfg: Config) -> MgmVariant:
    """The mgm binary's invocation contract mapped onto the faithful flow
    (/root/reference/s2p/block_matching.py:155-188: no explicit -P1/-P2,
    so the binary defaults 8/32 scaled by stereo_regularity_multiplier
    apply; MEDIAN=1; TESTLRRL from mgm_leftright_control).  The semantics
    knobs keep their measured defaults (ops/mgm_flow.py docstring)."""
    mult = cfg.stereo_regularity_multiplier
    return MgmVariant(
        p1=8.0 * mult,
        p2=32.0 * mult,
        nb_dir=cfg.mgm_nb_directions,
        census_win=cfg.census_ncc_win,
        lr_enabled=cfg.mgm_leftright_control != 0,
        lr_tau=cfg.mgm_leftright_threshold,
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
        disp, conf = mgm_binary_match(im1, im2, disp_min, disp_max,
                                      mgm_variant_from_cfg(cfg))
        disp = np.asarray(disp)
        valid = np.isfinite(disp)
        conf = np.asarray(conf)
    elif algo in ('mgm_multi', 'mgm_multi_lsd'):
        # mgm_multi binary contract (block_matching.py:268-310): the -S 6
        # multiscale cascade with SUBPIX=2 half-step candidates, explicit
        # P1/P2 = 8/32 * multiplier, TESTLRRL per level, NO median, and
        # REMOVESMALLCC applied to the result.  The lsd variant
        # (block_matching.py:191-245) lowers regularization on detected
        # line segments (weight maps for BOTH images: -wl wref -wr wsec,
        # the secondary map driving the swapped aggregation), raises
        # P1/P2 to 12/48 and sets MEDIAN=1.
        from ..ops.mgm_flow import mgm_multi_match
        from .. import runner
        runner.checkpoint()
        variant = mgm_variant_from_cfg(cfg)
        kw = {'median_order': 'none'}
        p2_map = p2_map_r = None
        if algo == 'mgm_multi_lsd':
            from ..ops.lsd import lsd_weights
            mult = cfg.stereo_regularity_multiplier
            kw = {'median_order': 'before_lr',
                  'p1': 12.0 * mult, 'p2': 48.0 * mult}
            p2_map = lsd_weights(im1) * kw['p2']
            p2_map_r = lsd_weights(im2) * kw['p2']
        variant = MgmVariant(**{**variant.__dict__, **kw})
        disp, conf = mgm_multi_match(im1, im2, disp_min, disp_max, variant,
                                     scales=6, subpix=2,
                                     p2_map=p2_map, p2_map_r=p2_map_r)
        disp = np.asarray(disp)
        valid = np.isfinite(disp)
        conf = np.asarray(conf)
        if cfg.stereo_speckle_filter:
            valid = remove_small_disparity_speckles(
                np.nan_to_num(disp), valid, cfg.stereo_speckle_filter,
                tol=1.0)
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
