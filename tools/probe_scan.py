#!/usr/bin/env python
"""Pass-level timing of the SGM Pallas kernels: where does a stage-4
matcher call actually spend its time, and what does lane-folding do to
each piece?  One JSON line per measurement on stdout.

Pieces, per 8-tile production bucket (448x512, D=80):
  * vertical scan pass (3 dirs, the Hankel shifted-row construction)
  * horizontal scan pass (1 dir, sublane-window construction)
  * fused WTA
  * full folded flow vs per-tile flow
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, D, NB = 448, 512, 80, 8


def bench(fn, *args, n=20):
    """fn must return something SMALL: the axon tunnel's
    block_until_ready does not reliably wait for remote completion, so
    sync is a device->host fetch of the last iteration's output (the
    stream is FIFO: fetching it forces all queued dispatches)."""
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from s2p_tpu.config import Config
    from s2p_tpu.core.matching import mgm_variant_from_cfg
    from s2p_tpu.ops import sgm_pallas as sp
    from s2p_tpu.ops.mgm_flow import census_bits_raw, _shift_sig_cols

    v = mgm_variant_from_cfg(Config(roi={'x': 0, 'y': 0, 'w': 1, 'h': 1}))
    rng = np.random.RandomState(0)
    img1 = rng.rand(NB, H, W).astype(np.float32) * 1000
    img2 = np.roll(img1, 5, axis=2) + rng.rand(NB, H, W).astype(np.float32)

    Wseg = W + D
    Wseg += (-Wseg) % 8
    extra = Wseg - W

    @jax.jit
    def make_sigs(a_bt, b_bt):
        census = jax.vmap(lambda im: census_bits_raw(im, v.census_win)[..., 0])
        s1 = census(a_bt)
        s2 = census(b_bt)
        ys = jnp.arange(H)[:, None]
        xs = jnp.arange(Wseg)[None, :]
        sr = jax.vmap(lambda s: jnp.pad(s, ((0, 0), (0, extra)))
                      | (jnp.uint32(1) << sp._VALID_BIT)
                      | (((ys >= H) | (xs >= W)).astype(jnp.uint32)
                         << sp._PAD_BIT))(s1)
        ss = jax.vmap(lambda s: _shift_sig_cols(s, -40, W, extra=extra))(s2)
        return sr, ss

    sr, ss = make_sigs(jnp.asarray(img1), jnp.asarray(img2))
    sr, ss = jnp.asarray(np.asarray(sr)), jnp.asarray(np.asarray(ss))

    @jax.jit
    def sig_probe(a, b):
        s, t = make_sigs(a, b)
        return jnp.sum(s, dtype=jnp.uint32) + jnp.sum(t, dtype=jnp.uint32)
    print(json.dumps({'probe': 'sig_build_ms',
                      'ms': 1e3 * bench(sig_probe, jnp.asarray(img1),
                                        jnp.asarray(img2))}), flush=True)

    def run_pass(s1f, s2f, p2f, dirs, horizontal, seg_w, sec_len, G):
        return sp._scan_pass_pallas(
            s1f, s2f, p2f, D=D, disp_min=0, dirs=dirs, p1=v.p1,
            invalid_cost=1e9, nbits=v.census_win ** 2 - 1, reverse=False,
            horizontal=horizontal, seg_w=seg_w, sec_len=sec_len,
            row_block=G)

    for B in (1, 2, 4):
        n_grp = NB // B
        s1g = sr.reshape(n_grp, B, H, Wseg)
        s2g = ss.reshape(n_grp, B, H, Wseg)

        @jax.jit
        def vpass(s1g, s2g):
            def one(s1b, s2b):
                s1f = sp.fold_lanes_v(s1b)
                s2f = sp.fold_lanes_v(s2b)
                p2f = jnp.full(s1f.shape, v.p2, jnp.float32)
                return run_pass(s1f, s2f, p2f,
                                dirs=((0,), (1,), (-1,)), horizontal=False,
                                seg_w=Wseg, sec_len=B * Wseg, G=8)[0]
            return jnp.sum(jax.vmap(one)(s1g, s2g)[:, 0, 0, :])

        @jax.jit
        def hpass(s1g, s2g):
            def one(s1b, s2b):
                s1f = sp._fold_lanes_h(s1b)
                s2f = jnp.pad(sp._fold_lanes_h(s2b), ((0, D), (0, 0)))
                p2f = jnp.full(s1f.shape, v.p2, jnp.float32)
                return run_pass(s1f, s2f, p2f, dirs=((0,),),
                                horizontal=True, seg_w=H,
                                sec_len=Wseg + D, G=8)[0]
            return jnp.sum(jax.vmap(one)(s1g, s2g)[:, 0, 0, :])

        try:
            tv = bench(vpass, s1g, s2g)
            th = bench(hpass, s1g, s2g)
        except Exception as e:
            print(json.dumps({'probe': 'pass', 'B': B,
                              'error': str(e)[:160]}), flush=True)
            continue
        print(json.dumps({'probe': 'pass', 'B': B,
                          'vpass_ms_per_tile': round(1e3 * tv / NB, 3),
                          'hpass_ms_per_tile': round(1e3 * th / NB, 3)}),
              flush=True)

        @jax.jit
        def wta(s1g, s2g):
            def one(s1b, s2b):
                s1f = sp.fold_lanes_v(s1b)
                s2f = sp.fold_lanes_v(s2b)
                p2f = jnp.full(s1f.shape, v.p2, jnp.float32)
                Sp = run_pass(s1f, s2f, p2f, dirs=((0,), (1,), (-1,)),
                              horizontal=False, seg_w=Wseg,
                              sec_len=B * Wseg, G=8)[0]
                return sp._wta_pallas([Sp], 0, v.subpix,
                                      big_guard=5e8, with_dr=False,
                                      emit_offset=True, row_block=8)[0]
            return jnp.sum(jax.vmap(one)(s1g, s2g)[:, 0, :])

        try:
            tw = bench(wta, s1g, s2g)
            print(json.dumps({'probe': 'wta', 'B': B,
                              'wta_ms_per_tile':
                                  round(1e3 * (tw - tv) / NB, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({'probe': 'wta', 'B': B,
                              'error': str(e)[:160]}), flush=True)


if __name__ == '__main__':
    main()
