#!/usr/bin/env python
"""Chip sweep of the lane-fold configs (PERF.md lever 2).

For each (fold B, scan row-block G) config: recompile the batched stage-4
program on the production bucket (8 tiles, 448x512, D=80), measure warm
tiles/s, and check the disparity output is bitwise identical to the
unfolded (B=1) run.  One JSON line per config on stdout.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_config(B, n_iter=10):
    import jax
    import jax.numpy as jnp
    from s2p_tpu.core.matching import mgm_variant_from_cfg
    from s2p_tpu.config import Config
    from s2p_tpu.ops.mgm_flow import mgm_binary_match_batch

    os.environ['S2P_TPU_LANE_FOLD'] = str(B)
    jax.clear_caches()

    params = mgm_variant_from_cfg(Config(roi={'x': 0, 'y': 0, 'w': 1, 'h': 1}))
    H, W, D, NB = 448, 512, 80, 8
    rng = np.random.RandomState(0)
    b1 = rng.rand(NB, H, W).astype(np.float32) * 1000
    b2 = np.roll(b1, 5, axis=2) + rng.rand(NB, H, W).astype(np.float32)
    dmins = jnp.full((NB,), -40, jnp.int32)
    ext = jnp.full((NB,), 440, jnp.int32)
    a, b = jnp.asarray(b1), jnp.asarray(b2)

    def run():
        return mgm_binary_match_batch(a, b, dmins, D, ext, ext, ext,
                                      jnp.full((NB,), D, jnp.int32), params)

    t0 = time.perf_counter()
    disp = np.asarray(run()['disp'])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = run()
    np.asarray(out['disp'])
    dt = (time.perf_counter() - t0) / n_iter
    return NB / dt, compile_s, disp


def main():
    # the scan row block is fixed at 8 (Mosaic: 2-D block shapes need
    # 8-divisible rows); the fold factor is the only lever, capped by
    # lane_fold_plan's VMEM budget (B >= 4 exceeds the 16 MiB arena on
    # this bucket)
    baseline = None
    for B in (1, 2, 3):
        try:
            tps, compile_s, disp = run_config(B)
        except Exception as e:
            print(json.dumps({'probe': 'fold', 'B': B,
                              'error': str(e)[:200]}), flush=True)
            continue
        if baseline is None:
            baseline = disp
            bitwise = True
        else:
            bitwise = bool(np.array_equal(baseline, disp, equal_nan=True))
        print(json.dumps({'probe': 'fold', 'B': B,
                          'tiles_per_s': round(tps, 2),
                          'compile_s': round(compile_s, 1),
                          'bitwise_vs_unfolded': bitwise}), flush=True)


if __name__ == '__main__':
    main()
