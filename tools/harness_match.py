"""Matcher-parity harness: measure matcher variants against the mgm binary.

The only committed output of the reference's actual ``mgm`` binary is the
fixture tile ``/root/reference/tests/data/input_triangulation/pair_1/``
(rectified_disp.tif, produced by s2p with default matcher settings:
``mgm -r dmin -R dmax -s vfit -t census -O 8`` with MEDIAN=1, TSGM=3,
TESTLRRL=1, TESTLRRL_TAU=1.0, MINDIFF=-1 and the binary's default penalties
P1=8 / P2=32 -- /root/reference/s2p/block_matching.py:155-188,
/root/reference/s2p/config.py:135-160).

The fixture ships the rectified REFERENCE crop but not the secondary, so the
harness re-creates the secondary in the fixture's exact frame by warping
``input_pair/img_02.tif`` with the fixture's own H_sec (the repo's quintic
warp matches the reference resampler to ~0.007 gray levels).

Usage:
    python tools/harness_match.py                    # default variant set
    python tools/harness_match.py '{"engine": "binary", "median_order": "after_lr"}' ...
    python tools/harness_match.py --range -44 33 '{"engine": "classic"}'

Each positional argument is a JSON variant spec; metrics (disparity rms /
p99 on commonly-valid pixels, validity IoU, fraction >1 px off) print as one
row per variant.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax  # noqa: E402

if '--tpu' not in sys.argv:
    jax.config.update('jax_platforms', 'cpu')

from s2p_tpu.geo import geotiff  # noqa: E402
from s2p_tpu.ops.homography import image_apply_homography  # noqa: E402

FIXTURE = '/root/reference/tests/data/input_triangulation/pair_1'
INPUT = '/root/reference/tests/data/input_pair'


def load_scene():
    ref = geotiff.read_with_nans(f'{FIXTURE}/rectified_ref.tif')
    gold = geotiff.read_with_nans(f'{FIXTURE}/rectified_disp.tif')
    h, w = ref.shape
    H_sec = np.loadtxt(f'{FIXTURE}/H_sec.txt').reshape(3, 3)
    H_ref = np.loadtxt(f'{FIXTURE}/H_ref.txt').reshape(3, 3)
    img1 = geotiff.read_with_nans(f'{INPUT}/img_01.tif')
    img2 = geotiff.read_with_nans(f'{INPUT}/img_02.tif')
    sec = np.asarray(image_apply_homography(img2, H_sec, w, h))
    ref_w = np.asarray(image_apply_homography(img1, H_ref, w, h))
    dd = (ref_w - ref)[np.isfinite(ref_w - ref)]
    print(f'# scene {w}x{h}  gold-valid {np.isfinite(gold).mean():.3f}  '
          f'warp-vs-fixture-ref rms {np.sqrt((dd ** 2).mean()):.4f} '
          f'max {np.abs(dd).max():.3f}  sec-nan {np.isnan(sec).mean():.4f}')
    return ref, sec, gold


def metrics(disp, gold, t):
    ours_v = np.isfinite(disp)
    gold_v = np.isfinite(gold)
    both = ours_v & gold_v
    d = np.abs(disp - gold)[both]
    iou = both.sum() / (ours_v | gold_v).sum()
    return {
        'rms': float(np.sqrt((d ** 2).mean())),
        'p50': float(np.percentile(d, 50)),
        'p90': float(np.percentile(d, 90)),
        'p99': float(np.percentile(d, 99)),
        'gt1': float((d > 1).mean()),
        'iou': float(iou),
        'nvalid': int(ours_v.sum()),
        'ngold': int(gold_v.sum()),
        'secs': round(t, 1),
    }


def run_variant(spec, ref, sec, dmin, dmax):
    engine = spec.pop('engine', 'binary')
    t0 = time.time()
    if engine == 'classic':
        # the round-2 calibrated production engine
        from s2p_tpu.config import Config
        from s2p_tpu.core.matching import compute_disparity_map
        cfg = Config()
        disp, mask, _ = compute_disparity_map(cfg, ref, sec, dmin, dmax,
                                              algo='mgm')
    elif engine == 'params':
        # raw SgmParams overrides through ops.sgm.match_pair
        from s2p_tpu.ops.sgm import SgmParams, match_pair
        disp, valid, _ = match_pair(ref, sec, dmin, dmax, SgmParams(**spec))
    elif engine == 'binary':
        from s2p_tpu.ops.mgm_flow import MgmVariant, mgm_binary_match
        disp = np.asarray(mgm_binary_match(ref, sec, dmin, dmax,
                                           MgmVariant(**spec))[0])
    else:
        raise SystemExit(f'unknown engine {engine}')
    return disp, time.time() - t0


def main():
    args = [a for a in sys.argv[1:] if a != '--tpu']
    dmin, dmax = -44, 33
    if '--range' in args:
        i = args.index('--range')
        dmin, dmax = int(args[i + 1]), int(args[i + 2])
        del args[i:i + 3]
    specs = [json.loads(a) for a in args] or [
        {'engine': 'classic'},
        {'engine': 'binary'},
    ]
    ref, sec, gold = load_scene()
    for spec in specs:
        label = json.dumps(spec)
        disp, t = run_variant(dict(spec), ref, sec, dmin, dmax)
        m = metrics(disp, gold, t)
        print(f'{label:<90} ' + ' '.join(f'{k}={v}' for k, v in m.items()),
              flush=True)


if __name__ == '__main__':
    main()
