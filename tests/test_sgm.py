"""Stereo matching engine tests (census + SGM aggregation)."""

import numpy as np
import pytest

from s2p_tpu.config import Config
from s2p_tpu.core import matching
from s2p_tpu.ops.sgm import SgmParams, match_pair


def _synthetic_pair(seed=0, H=100, W=140, d_fg=5.0):
    rng = np.random.RandomState(seed)
    im1 = rng.rand(H, W).astype(np.float32) * 100
    true = np.zeros((H, W), np.float32)
    true[30:70, 40:110] = d_fg
    im2 = np.zeros_like(im1)
    for y in range(H):
        for x in range(W):
            d = int(true[y, x])
            if 0 <= x + d < W:
                im2[y, x + d] = im1[y, x]
    return im1, im2, true


def test_sgm_recovers_disparity():
    im1, im2, true = _synthetic_pair()
    disp, valid, conf = match_pair(im1, im2, -2, 8)
    inner = valid[10:-10, 10:-10] & np.isfinite(disp[10:-10, 10:-10])
    err = np.abs(disp - true)[10:-10, 10:-10][inner]
    assert (err < 1).mean() > 0.95
    assert np.median(err) < 0.3
    assert conf.mean() > 0.5


def test_sgm_nan_borders_masked():
    im1, im2, _ = _synthetic_pair()
    im1[:, :12] = np.nan
    disp, valid, _ = match_pair(im1, im2, -2, 8)
    assert not valid[:, :10].any()
    assert np.isnan(disp[:, :10]).all()


def test_compute_disparity_map_mgm():
    im1, im2, true = _synthetic_pair()
    cfg = Config()
    disp, mask, conf = matching.compute_disparity_map(cfg, im1, im2, -2, 8)
    inner = mask[10:-10, 10:-10].astype(bool)
    err = np.abs(disp - true)[10:-10, 10:-10][inner]
    assert (err < 1).mean() > 0.95


def test_max_disparity_range_guard():
    im1, im2, _ = _synthetic_pair()
    cfg = Config(max_disp_range=4)
    with pytest.raises(matching.MaxDisparityRangeError):
        matching.compute_disparity_map(cfg, im1, im2, -10, 10)


def test_disparity_range_clamped_to_width():
    im1, im2, true = _synthetic_pair()
    cfg = Config()
    # an absurd range gets clamped to the image width, not an error
    disp, mask, _ = matching.compute_disparity_map(cfg, im1, im2, -500, 500)
    assert mask.any()


def test_multiscale_matches_fullrange():
    im1, im2, true = _synthetic_pair(H=128, W=256, d_fg=9.0)
    cfg = Config(matching_algorithm='mgm_multi')
    disp, mask, conf = matching.compute_disparity_map(
        cfg, im1, im2, -40, 60)   # wide range triggers the cascade
    inner = mask[12:-12, 12:-12].astype(bool)
    err = np.abs(disp - true)[12:-12, 12:-12][inner]
    assert (err < 1).mean() > 0.9


def test_median_fill_coherence_gate():
    """fill_coh_tau > 0 must fill only rejected pixels whose 3x3 valid
    neighborhood is coherent (spread <= tau); tau=0 fills always
    (advisor round-2 finding: the gate had no coverage)."""
    import jax.numpy as jnp
    from s2p_tpu.ops.sgm import _median_fill

    disp = np.full((5, 7), np.nan, np.float32)
    disp[:, :3] = 2.0          # flat foreground
    disp[:, 4:] = 9.0          # flat background
    disp[2, 3] = np.nan        # rejected pixel at the jump (incoherent)
    disp[0, 1] = np.nan        # rejected pixel inside the flat region
    valid = np.isfinite(disp)
    d0, v0 = _median_fill(jnp.asarray(disp), jnp.asarray(valid), 0.0)
    d1, v1 = _median_fill(jnp.asarray(disp), jnp.asarray(valid), 1.0)
    d0, d1 = np.asarray(d0), np.asarray(d1)
    # tau=0: always fill -- both rejected pixels resurrected
    assert np.isfinite(d0[0, 1]) and np.isfinite(d0[2, 3])
    # tau=1: the flat-region pixel fills (spread 0), the occlusion-boundary
    # pixel stays NaN (spread 7 > 1)
    assert np.isfinite(d1[0, 1]) and d1[0, 1] == 2.0
    assert np.isnan(d1[2, 3])
    # valid pixels keep their (median-smoothed) values under both
    assert np.asarray(v1)[0, 0]


@pytest.mark.parametrize('algo', ['sgbm', 'hirschmuller08',
                                  'hirschmuller08_laplacian',
                                  'hirschmuller08_cauchy', 'tvl1', 'msmw'])
def test_matcher_dispatch_surface(algo):
    """Every reference matcher name (block_matching.py:35-336) dispatches
    and recovers the synthetic shift to <1 px on most valid pixels."""
    im1, im2, true = _synthetic_pair()
    cfg = Config(matching_algorithm=algo)
    disp, mask, conf = matching.compute_disparity_map(cfg, im1, im2, -2, 8)
    assert disp.shape == im1.shape and mask.shape == im1.shape
    inner = mask[12:-12, 12:-12].astype(bool)
    assert inner.mean() > 0.2
    err = np.abs(disp - true)[12:-12, 12:-12][inner]
    # the LoG/Cauchy prefilters compress the white-noise texture that IS
    # this synthetic's only signal, so their bar is lower by construction
    bar = 0.6 if algo.startswith('hirschmuller08_') else 0.75
    assert (err < 1.5).mean() > bar, (algo, (err < 1.5).mean())


def test_matcher_dispatch_errors():
    im1, im2, _ = _synthetic_pair()
    with pytest.raises(NotImplementedError):
        matching.compute_disparity_map(Config(matching_algorithm='micmac'),
                                       im1, im2, -2, 8)
    with pytest.raises(NotImplementedError):
        matching.compute_disparity_map(Config(matching_algorithm='nope'),
                                       im1, im2, -2, 8)
