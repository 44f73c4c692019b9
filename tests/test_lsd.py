"""LSD line segment detector tests (replaces the reference's lsd binary
in the mgm_multi_lsd weight pipeline, block_matching.py:191-218)."""

import numpy as np
import pytest

from s2p_tpu.ops.lsd import lsd, lsd_weights, draw_segments


@pytest.fixture(scope='module')
def square_img():
    img = np.full((200, 200), 200.0)
    img[60:140, 50:160] = 50.0
    img += np.random.RandomState(0).randn(200, 200) * 2
    return img


def test_lsd_finds_square_edges(square_img):
    segs = lsd(square_img)
    assert len(segs) == 4
    # two horizontal edges near y=59/139, two vertical near x=49/159
    horiz = segs[np.abs(segs[:, 1] - segs[:, 3]) < 2]
    vert = segs[np.abs(segs[:, 0] - segs[:, 2]) < 2]
    assert len(horiz) == 2 and len(vert) == 2
    assert sorted(np.round(horiz[:, 1] / 10) * 10) == [60, 140]
    assert sorted(np.round(vert[:, 0] / 10) * 10) == [50, 160]


def test_lsd_empty_on_flat():
    img = np.full((100, 100), 7.0)
    assert len(lsd(img)) == 0


def test_lsd_weights_formula(square_img):
    w = lsd_weights(square_img.astype(np.float32))
    assert w.shape == square_img.shape
    assert w.min() == pytest.approx(0.1)
    assert w.max() == 1.0
    # segments cover a thin fraction of the image
    assert 0.001 < (w < 1).mean() < 0.1


def test_draw_segments_bounds():
    out = draw_segments(np.array([[-5.0, 2.0, 30.0, 2.0, 1.0]]), 20, 10)
    assert out.shape == (10, 20)
    assert out[2, :].max() == 255
    assert out[3, :].max() == 0


def test_mgm_multi_lsd_runs():
    from s2p_tpu.config import Config
    from s2p_tpu.core import matching
    rng = np.random.RandomState(0)
    im1 = (rng.rand(80, 96) * 255).astype(np.float32)
    im2 = np.roll(im1, -3, axis=1)
    cfg = Config(images=(), out_dir='/tmp/x',
                 matching_algorithm='mgm_multi_lsd')
    disp, mask, conf = matching.compute_disparity_map(cfg, im1, im2, -6, 2)
    m = mask.astype(bool)
    assert m.mean() > 0.4
    med = np.nanmedian(disp[m])
    assert abs(med + 3) < 0.6
