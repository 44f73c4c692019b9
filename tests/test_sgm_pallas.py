"""Pallas SGM kernels vs the portable lax path: exact agreement.

Runs the Pallas kernels in interpreter mode on the CPU test mesh and checks
the aggregated volume, votes, validity and the full matcher output against
the reference lax implementation in ops/sgm.py.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp

from s2p_tpu.ops.sgm import SgmParams, _aggregate, sgm_match


def _pair(h=64, w=64, seed=0, shift=3):
    rng = np.random.RandomState(seed)
    im1 = (rng.rand(h, w) * 255).astype(np.float32)
    im2 = np.roll(im1, -shift, axis=1) + rng.rand(h, w).astype(np.float32)
    # NaN borders like real rectified crops
    im1[:2], im2[-3:] = np.nan, np.nan
    im1[:, :2], im2[:, -2:] = np.nan, np.nan
    return jnp.asarray(im1), jnp.asarray(im2)


@pytest.mark.parametrize('nb_dir', [2, 4, 8])
@pytest.mark.parametrize('mgm', [True, False])
def test_aggregate_matches_lax(nb_dir, mgm):
    im1, im2 = _pair()
    disp_min, disp_max = -8, 7
    base = SgmParams(nb_dir=nb_dir, mgm=mgm)
    S_lax, val_lax, votes_lax = _aggregate(
        im1, im2, disp_min, disp_max,
        dataclasses.replace(base, backend='lax'))
    S_pl, val_pl, votes_pl = _aggregate(
        im1, im2, disp_min, disp_max,
        dataclasses.replace(base, backend='interpret'))
    np.testing.assert_allclose(np.asarray(S_pl), np.asarray(S_lax),
                               rtol=0, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(val_pl), np.asarray(val_lax))
    assert len(votes_pl) == len(votes_lax)
    for vp, vl in zip(votes_pl, votes_lax):
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vl))


def test_tsgm3_matches_lax():
    im1, im2 = _pair(seed=5)
    base = SgmParams(mgm_neighbors=3)
    S_lax, _, v_lax = _aggregate(im1, im2, -8, 7,
                                 dataclasses.replace(base, backend='lax'))
    S_pl, _, v_pl = _aggregate(im1, im2, -8, 7,
                               dataclasses.replace(base, backend='interpret'))
    np.testing.assert_allclose(np.asarray(S_pl), np.asarray(S_lax),
                               rtol=0, atol=1e-4)
    for vp, vl in zip(v_pl, v_lax):
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vl))


def test_edge_aware_p2_matches_lax():
    im1, im2 = _pair(seed=3)
    base = SgmParams(p2_edge_scale=0.5)
    S_lax, _, _ = _aggregate(im1, im2, -8, 7,
                             dataclasses.replace(base, backend='lax'))
    S_pl, _, _ = _aggregate(im1, im2, -8, 7,
                            dataclasses.replace(base, backend='interpret'))
    np.testing.assert_allclose(np.asarray(S_pl), np.asarray(S_lax),
                               rtol=0, atol=1e-4)


def test_full_match_agrees():
    im1, im2 = _pair(seed=7)
    out_lax = sgm_match(im1, im2, -8, 7, SgmParams(backend='lax'))
    out_pl = sgm_match(im1, im2, -8, 7, SgmParams(backend='interpret'))
    d_lax = np.asarray(out_lax['disp'])
    d_pl = np.asarray(out_pl['disp'])
    np.testing.assert_array_equal(np.isnan(d_pl), np.isnan(d_lax))
    m = ~np.isnan(d_lax)
    np.testing.assert_allclose(d_pl[m], d_lax[m], rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_pl['confidence']),
                               np.asarray(out_lax['confidence']),
                               rtol=0, atol=1e-6)


def test_fallback_on_incompatible_shapes():
    # odd shapes / unequal widths must silently take the lax path
    rng = np.random.RandomState(0)
    im1 = jnp.asarray((rng.rand(50, 70) * 255).astype(np.float32))
    im2 = jnp.asarray((rng.rand(50, 90) * 255).astype(np.float32))
    out = sgm_match(im1, im2, -4, 11, SgmParams(backend='auto'))
    assert out['disp'].shape == (50, 70)
