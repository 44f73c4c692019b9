#!/usr/bin/env python
"""Benchmark: census + SGM stereo matching throughput on one chip.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md); its only
quantitative performance bound is the 600 s per-tile budget for the default
800x800-px tile (config.py:50), i.e. 800*800*64 / 600 = 68.3 Mpix*disp/s
for a typical 64-level disparity search.  vs_baseline is measured against
that documented budget bound.

Measures the full matcher (census cost, 8-direction MGM aggregation, WTA +
vfit subpixel, LR consistency, median) on device: n_iter dispatches are
queued back to back and synchronized once through a reduced scalar, so the
number reflects chip throughput rather than host-tunnel round trips.
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
    import jax.numpy as jnp
    from s2p_tpu.ops.sgm import SgmParams, sgm_match

    H, W, D = 512, 512, 64
    disp_min = -8
    disp_max = disp_min + D - 1
    rng = np.random.RandomState(0)
    im1 = (rng.rand(H, W).astype(np.float32) * 1000)
    im2 = np.roll(im1, 5, axis=1) + rng.rand(H, W).astype(np.float32)

    params = SgmParams()
    a = jnp.asarray(im1)
    b = jnp.asarray(im2)

    step = jax.jit(lambda a, b: jnp.nansum(
        sgm_match(a, b, disp_min, disp_max, params)['disp']))

    # warmup / compile; the host fetch forces real completion (plain
    # block_until_ready does not synchronize reliably through the tunnel)
    float(step(a, b))
    float(step(a, b))

    n_iter = 50
    t0 = time.perf_counter()
    acc = [step(a, b) for _ in range(n_iter)]
    total = acc[0]
    for s in acc[1:]:
        total = total + s
    float(total)
    dt = (time.perf_counter() - t0) / n_iter

    mpixdisp_s = H * W * D / dt / 1e6
    baseline = 800 * 800 * 64 / 600.0 / 1e6   # reference per-tile budget bound
    print(json.dumps({
        'metric': 'sgm_matcher_throughput',
        'value': round(mpixdisp_s, 2),
        'unit': 'Mpix*disp/s/chip',
        'vs_baseline': round(mpixdisp_s / baseline, 2),
    }))


if __name__ == '__main__':
    main()
