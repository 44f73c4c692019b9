"""ASIFT tilt-simulated keypoints (optional tool; the reference vendors the
IPOL ASIFT demo without wiring it, 3rdparty/demo_ASIFT_src)."""

import numpy as np

from s2p_tpu.geo import geotiff
from s2p_tpu.ops import asift, sift

from conftest import data_path


def test_asift_superset_of_sift_and_matchable_under_tilt():
    img = geotiff.read(data_path('input_pair/img_01.tif')).astype(np.float32)
    crop = img[200:420, 200:420]
    kp = asift.keypoints(crop, n_tilts=2)
    kp_sift = sift.keypoints_from_array(crop)
    # tilt t=1 reproduces plain SIFT, further views add keypoints
    assert len(kp) > len(kp_sift)
    # all mapped-back positions live in the original domain
    assert (kp[:, 0] >= 0).all() and (kp[:, 0] < crop.shape[1]).all()
    assert (kp[:, 1] >= 0).all() and (kp[:, 1] < crop.shape[0]).all()

    # a strongly tilted view of the same crop still matches through the
    # concatenated descriptor sets (affine invariance)
    view, _ = asift._simulate(crop, 2.0, 0.0)
    kp_view = asift.keypoints(view, n_tilts=2)
    m = sift.keypoints_match(kp, kp_view, method='relative', sift_thresh=0.6)
    assert m is not None and len(m) > 30
