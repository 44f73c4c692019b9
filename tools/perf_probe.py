#!/usr/bin/env python
"""Measurement appendix for PERF.md: run on the TPU chip.

    python tools/perf_probe.py [--quick]

Prints one JSON line per experiment:
  * matcher_full          : the bench.py headline flow (512x512x64)
  * aggregation_only      : the 4 Pallas scan passes + fused WTA alone
  * g_sweep               : aggregation at _ROW_BLOCK G=8 vs 16
  * stage5_split          : device solve vs host finish on the bench tile
  * tunnel                : 1 MB upload/fetch round-trip times

All experiments time steady-state iterations (first call excluded), so
the numbers are chip numbers, not tunnel-warmup numbers.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def _timeit(fn, n=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _block(out)
    return (time.perf_counter() - t0) / n


def _block(out):
    import jax
    for leaf in jax.tree_util.tree_leaves(out):
        try:
            leaf.block_until_ready()
        except AttributeError:
            pass


def probe_matcher():
    import jax
    import jax.numpy as jnp
    from s2p_tpu.config import Config
    from s2p_tpu.core.matching import mgm_variant_from_cfg
    from s2p_tpu.ops.mgm_flow import _flow_jit

    params = mgm_variant_from_cfg(Config(roi={'x': 0, 'y': 0, 'w': 1, 'h': 1}))
    H, W, D = 512, 512, 64
    rng = np.random.RandomState(0)
    im1 = jnp.asarray(rng.rand(H, W).astype(np.float32) * 1000)
    im2 = jnp.asarray(np.roll(np.asarray(im1), 5, axis=1))
    step = jax.jit(lambda a, b: _flow_jit(a, b, -8, D, params)[0])
    dt = _timeit(lambda: step(im1, im2), n=20)
    print(json.dumps({'probe': 'matcher_full', 'ms': round(dt * 1e3, 2),
                      'gpixdisp_s': round(H * W * D / dt / 1e9, 3)}),
          flush=True)
    return im1, im2, params, (H, W, D)


def probe_aggregation(im1, im2, params, hwd):
    import jax
    from s2p_tpu.ops import sgm_pallas
    from s2p_tpu.ops.mgm_flow import MgmVariant
    from s2p_tpu.ops.sgm import SgmParams

    H, W, D = hwd
    sp = SgmParams(census_win=params.census_win, p1=params.p1, p2=params.p2,
                   nb_dir=params.nb_dir, mgm=False)

    for G in (8, 16, 32):
        sgm_pallas._ROW_BLOCK = G
        agg = jax.jit(lambda a, b: sgm_pallas._aggregate_partials(
            a, b, -8, D - 9, sp)[0])
        try:
            dt = _timeit(lambda: agg(im1, im2), n=20)
            print(json.dumps({'probe': 'aggregation_only', 'G': G,
                              'ms': round(dt * 1e3, 2),
                              'gpixdisp_s': round(H * W * D / dt / 1e9, 3),
                              'roofline_frac': round(
                                  H * W * D / dt / 25e9, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({'probe': 'aggregation_only', 'G': G,
                              'error': str(e)[:120]}), flush=True)
    sgm_pallas._ROW_BLOCK = 8


def probe_stage5():
    from bench import bench_stage5_batch
    import s2p_tpu.core.triangulation as tri

    # split: time the device solve alone by stubbing the host post
    orig_post = tri._post_triangulation
    t_full = None
    try:
        from bench import bench_stage5_batch as b5
        t0 = time.perf_counter()
        tps = b5(B=8)
        t_full = 8.0 / tps

        tri._post_triangulation = lambda outs, meta, crs: (None, None)
        tps_dev = b5(B=8)
        t_dev = 8.0 / tps_dev
    finally:
        tri._post_triangulation = orig_post
    print(json.dumps({'probe': 'stage5_split',
                      's_per_8tiles_full': round(t_full * 8, 3),
                      's_per_8tiles_device_only': round(t_dev * 8, 3),
                      'host_fraction': round(1 - t_dev / t_full, 3)}),
          flush=True)


def probe_tunnel():
    import jax.numpy as jnp
    x = jnp.ones((512, 512), jnp.float32)
    y = (x * 2).block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(y)
        times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({'probe': 'tunnel', 'fetch_1MB_s': times}), flush=True)


def main():
    from s2p_tpu import device
    device.configure()
    probe_tunnel()
    im1, im2, params, hwd = probe_matcher()
    probe_aggregation(im1, im2, params, hwd)
    if '--quick' not in sys.argv:
        probe_stage5()


if __name__ == '__main__':
    main()
