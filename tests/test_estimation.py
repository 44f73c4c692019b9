"""Property tests of the geometric estimation core
(mirrors /root/reference/tests/estimation_test.py)."""

import numpy as np
import pytest

from s2p_tpu.core import estimation
from s2p_tpu.core.evaluation import distance_point_to_line


def _random_affine(rng, kind):
    if kind == 'translation':
        A = np.eye(3)
        A[:2, 2] = rng.uniform(-100, 100, 2)
    elif kind == 'isometry':
        th = rng.uniform(-np.pi, np.pi)
        A = np.eye(3)
        A[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        A[:2, 2] = rng.uniform(-100, 100, 2)
    elif kind == 'similarity':
        th = rng.uniform(-np.pi, np.pi)
        z = rng.uniform(0.5, 2)
        A = np.eye(3)
        A[:2, :2] = z * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        A[:2, 2] = rng.uniform(-100, 100, 2)
    else:  # affinity
        A = np.eye(3)
        A[:2, :2] = rng.uniform(-2, 2, (2, 2))
        while abs(np.linalg.det(A[:2, :2])) < 0.1:
            A[:2, :2] = rng.uniform(-2, 2, (2, 2))
        A[:2, 2] = rng.uniform(-100, 100, 2)
    return A


@pytest.mark.parametrize('kind', ['translation', 'isometry', 'similarity', 'affinity'])
def test_affine_transformation_recovers(kind):
    rng = np.random.RandomState(42)
    for _ in range(100):
        A = _random_affine(rng, kind)
        x = rng.uniform(0, 1000, (20, 2))
        xx = (np.hstack([x, np.ones((20, 1))]) @ A.T)[:, :2]
        est = estimation.affine_transformation(x, xx)
        np.testing.assert_allclose(est, A, atol=1e-6)


def test_translation_recovers():
    rng = np.random.RandomState(0)
    t = np.array([3.5, -7.25])
    x = rng.uniform(0, 100, (10, 2))
    est = estimation.translation(x, x + t)
    np.testing.assert_allclose(est[:2, 2], t, atol=1e-12)


def test_affine_fundamental_matrix_epipolar_residual():
    """Matches generated from an affine F must have ~zero epipolar residual
    under the estimated F."""
    rng = np.random.RandomState(1)
    # synthesize an affine stereo geometry: x2 = x1 + d(x1), y2 = y1
    x1 = rng.uniform(0, 500, (100, 2))
    disp = 0.1 * x1[:, 0] + 0.05 * x1[:, 1] + rng.uniform(-2, 2, 100)
    matches = np.column_stack([x1, x1[:, 0] + disp, x1[:, 1]])
    F = estimation.affine_fundamental_matrix(matches)
    # residuals x2^T F x1 should be ~0 relative to the line norms
    p1 = np.hstack([matches[:, :2], np.ones((100, 1))])
    p2 = np.hstack([matches[:, 2:], np.ones((100, 1))])
    res = np.abs(np.sum(p2 * (p1 @ F.T), axis=1))
    lines = p1 @ F.T
    d = res / np.hypot(lines[:, 0], lines[:, 1])
    assert np.max(d) < 1e-9


def test_rectifying_similarities_align_epipolar_lines():
    rng = np.random.RandomState(2)
    x1 = rng.uniform(0, 500, (50, 2))
    matches = np.column_stack([x1, x1[:, 0] + 3.0, x1[:, 1] + 0.02 * x1[:, 0] + 5])
    F = estimation.affine_fundamental_matrix(matches)
    S1, S2 = estimation.rectifying_similarities_from_affine_fundamental_matrix(F)
    from s2p_tpu.ops.homography import points_apply_homography
    y1 = points_apply_homography(S1, matches[:, :2])[:, 1]
    y2 = points_apply_homography(S2, matches[:, 2:])[:, 1]
    np.testing.assert_allclose(y1, y2, atol=1e-8)


def test_distance_point_to_line_infinity_cases():
    assert distance_point_to_line([1, 0, 0], [1, 1, 0]) == np.finfo(float).max
    assert distance_point_to_line([1, 0, 1], [0, 0, 1]) == np.finfo(float).max
    assert np.isclose(distance_point_to_line([0, 0, 1], [1, 0, -5]), 5.0)
