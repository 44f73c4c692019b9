#!/usr/bin/env python
"""Benchmark: census + SGM stereo aggregation throughput on one chip.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md); its only
quantitative performance bound is the 600 s per-tile budget for the default
800x800-px tile (config.py:50), i.e. 800*800*64 / 600 = 68.3 Mpix*disp/s
for a typical 64-level disparity search.  vs_baseline is measured against
that documented budget bound.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    import jax
    from s2p_tpu import device
    device.configure()
    from s2p_tpu.ops.sgm import SgmParams, sgm_match

    H, W, D = 512, 512, 64
    rng = np.random.RandomState(0)
    im1 = (rng.rand(H, W).astype(np.float32) * 1000)
    shift = 5
    im2 = np.roll(im1, shift, axis=1) + rng.rand(H, W).astype(np.float32)

    params = SgmParams()
    disp_min, disp_max = -8, disp_min_max(D)

    import jax.numpy as jnp
    a = jnp.asarray(im1)
    b = jnp.asarray(im2)

    # warmup / compile (host fetch forces real completion; block_until_ready
    # alone does not synchronize reliably through the TPU tunnel)
    out = sgm_match(a, b, disp_min, disp_max, params)
    float(np.asarray(out['disp'])[0, 0])

    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = sgm_match(a, b, disp_min, disp_max, params)
        np.asarray(out['disp'])
    dt = (time.perf_counter() - t0) / n_iter

    mpixdisp_s = H * W * D / dt / 1e6
    baseline = 800 * 800 * 64 / 600.0 / 1e6   # reference per-tile budget bound
    print(json.dumps({
        'metric': 'sgm_aggregation_throughput',
        'value': round(mpixdisp_s, 2),
        'unit': 'Mpix*disp/s/chip',
        'vs_baseline': round(mpixdisp_s / baseline, 2),
    }))


def disp_min_max(D, disp_min=-8):
    return disp_min + D - 1


if __name__ == '__main__':
    main()
