#!/usr/bin/env python
"""Measurement appendix for PERF.md: run on the TPU chip.

    python tools/perf_probe.py [--quick]

Prints one JSON line per experiment:
  * tunnel                : per-request latency + d2h bandwidth
  * matcher_full          : the bench.py headline flow (512x512x64)
  * aggregation_only      : the 4 Pallas scan passes alone (G sweep)
  * stage4_batch          : the production batched flow (8x448x512x80)
  * stage1_wave           : the 4-pair scene SIFT wave split
  * stage5_split          : device solve vs host finish on the bench tile

Sync discipline: the axon tunnel's block_until_ready does not reliably
wait for remote completion, so every timing loop ends with a tiny
device->host fetch (the stream is FIFO; fetching forces all queued
dispatches).  Deeper instruments: tools/probe_fold.py (lane-fold sweep),
tools/probe_ablate.py (flow-layer ablation), tools/probe_scan.py
(per-pass timings).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    """Force completion of everything queued: fetch one element."""
    import jax
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, 'ravel')]
    if leaves:
        np.asarray(leaves[0].ravel()[:1])


def _timeit(fn, n=10):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n


def probe_tunnel():
    import jax.numpy as jnp
    x = jnp.ones((512, 512), jnp.float32)
    y = (x * 2)
    np.asarray(y)
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(y.ravel()[:1])
        lat.append(round(time.perf_counter() - t0, 4))
    # fresh computation each time: a jax.Array caches its host copy
    # after the first np.asarray, so re-fetching measures nothing
    big = (jnp.ones((1024, 2048), jnp.float32) * 3)
    np.asarray(big.ravel()[:1])          # force compute, not transfer
    t0 = time.perf_counter()
    np.asarray(big)
    bw = 8.0 / (time.perf_counter() - t0)
    print(json.dumps({'probe': 'tunnel', 'fetch_latency_s': lat,
                      'd2h_MB_s': round(bw, 1)}), flush=True)


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
    from s2p_tpu.ops.sgm import SgmParams

    H, W, D = hwd
    sp = SgmParams(census_win=params.census_win, p1=params.p1, p2=params.p2,
                   nb_dir=params.nb_dir, mgm=False)

    for G in (8, 16):          # Mosaic: 2-D blocks need 8-divisible rows
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


def probe_stage4_batch():
    import jax.numpy as jnp
    from s2p_tpu.config import Config
    from s2p_tpu.core.matching import mgm_variant_from_cfg
    from s2p_tpu.ops.mgm_flow import mgm_binary_match_batch

    params = mgm_variant_from_cfg(Config(roi={'x': 0, 'y': 0, 'w': 1, 'h': 1}))
    B, H, W, D = 8, 448, 512, 80
    rng = np.random.RandomState(0)
    b1 = rng.rand(B, H, W).astype(np.float32) * 1000
    b2 = np.roll(b1, 5, axis=2) + rng.rand(B, H, W).astype(np.float32)
    a, b = jnp.asarray(b1), jnp.asarray(b2)
    dmins = jnp.full((B,), -40, jnp.int32)
    ext = jnp.full((B,), 440, jnp.int32)

    def run():
        return mgm_binary_match_batch(a, b, dmins, D, ext, ext, ext,
                                      jnp.full((B,), D, jnp.int32), params)
    dt = _timeit(lambda: run()['disp'], n=10)
    print(json.dumps({'probe': 'stage4_batch', 'ms_per_tile':
                      round(dt / B * 1e3, 2),
                      'tiles_per_s': round(B / dt, 2)}), flush=True)


def probe_stage1_wave():
    from s2p_tpu.geo import geotiff, rpc_io
    from s2p_tpu.ops import sift as sift_ops

    p1 = '/root/reference/tests/data/input_pair/img_01.tif'
    p2 = '/root/reference/tests/data/input_pair/img_02.tif'
    im1 = geotiff.read(p1).astype(np.float32)
    im2 = geotiff.read(p2).astype(np.float32)
    r1, r2 = rpc_io.rpc_from_geotiff(p1), rpc_io.rpc_from_geotiff(p2)
    jobs = [dict(im1=im1, im2=im2, rpc1=r1, rpc2=r2, x=150 + 350 * i,
                 y=150 + 350 * j, w=350, h=350, method='relative',
                 sift_thresh=0.6, epipolar_threshold=10.0, alt_kwargs={})
            for i in range(2) for j in range(2)]
    sift_ops.matches_on_rpc_roi_batch(jobs)     # warm
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        ms = sift_ops.matches_on_rpc_roi_batch(jobs)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({'probe': 'stage1_wave', 's_per_4pairs': round(dt, 2),
                      'tilepairs_per_s': round(len(jobs) / dt, 3),
                      'n_matches': [0 if m is None else len(m) for m in ms]}), flush=True)


def probe_stage5():
    import s2p_tpu.core.triangulation as tri

    orig_post = tri._post_triangulation
    try:
        from bench import bench_stage5_batch as b5
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


def main():
    from s2p_tpu import device
    device.configure()
    probe_tunnel()
    im1, im2, params, hwd = probe_matcher()
    probe_aggregation(im1, im2, params, hwd)
    probe_stage4_batch()
    if '--quick' not in sys.argv:
        probe_stage1_wave()
        probe_stage5()


if __name__ == '__main__':
    main()
