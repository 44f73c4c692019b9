#!/usr/bin/env python
"""Ablation timing of the per-tile batched matcher flow: peel the layers
of one production stage-4 call (8 tiles, 448x512, D=80) to localize the
time outside the Pallas kernels.  One JSON line per layer on stdout."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, D, NB = 448, 512, 80, 8


def bench(fn, *args, n=10):
    np.asarray(fn(*args))      # tunnel-reliable sync = tiny fetch
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
    from s2p_tpu.ops import mgm_flow as mf
    from s2p_tpu.ops import sgm_pallas as sp

    v = mgm_variant_from_cfg(Config(roi={'x': 0, 'y': 0, 'w': 1, 'h': 1}))
    rng = np.random.RandomState(0)
    img1 = rng.rand(NB, H, W).astype(np.float32) * 1000
    img2 = np.roll(img1, 5, axis=2) + rng.rand(NB, H, W).astype(np.float32)
    a = jnp.asarray(img1)
    b = jnp.asarray(img2)
    dm = jnp.full((NB,), -40, jnp.int32)
    ext = jnp.full((NB,), 440, jnp.int32)
    dt = jnp.full((NB,), D, jnp.int32)

    def tile_sigs(aa, bb, base, w_sec):
        s1 = mf.census_bits_raw(aa, v.census_win)[..., 0]
        s2 = mf.census_bits_raw(bb, v.census_win)[..., 0]
        ys = jnp.arange(H)[:, None]
        xs = jnp.arange(W)[None, :]
        pad = (ys >= H) | (xs >= W)
        sr = (s1 | (jnp.uint32(1) << sp._VALID_BIT)
              | (pad.astype(jnp.uint32) << sp._PAD_BIT))
        ss = mf._shift_sig_cols(s2, base, w_sec, extra=D)
        return sr, ss

    allowed = jnp.arange(D) < D

    layers = {}

    @jax.jit
    def full(a, b):
        o = mf.mgm_binary_match_batch(a, b, dm, D, ext, ext, ext, dt,
                                      variant=v)
        return o['disp'][:, 0, :8], o['confidence'][:, 0, :8]
    layers['full_flow'] = full

    @jax.jit
    def one_side_no_post(a, b):
        def one(aa, bb, base):
            sr, ss = tile_sigs(aa, bb, base, W)
            parts, votes = sp.flow_partials_from_sigs(
                sr, ss, 0, D, v, allowed=allowed.astype(jnp.int32))
            off, d_int, _ = sp._wta_pallas(parts, 0, v.subpix,
                                           big_guard=5e8, with_dr=False,
                                           emit_offset=True)
            return off, d_int, votes
        off, d_int, votes = jax.vmap(one)(a, b, dm)
        return off[:, 0, :8], d_int[:, 0, :8]
    layers['one_side_partials_wta_votes'] = one_side_no_post

    @jax.jit
    def partials_only(a, b):
        def one(aa, bb, base):
            sr, ss = tile_sigs(aa, bb, base, W)
            parts, votes = sp.flow_partials_from_sigs(
                sr, ss, 0, D, v, allowed=allowed.astype(jnp.int32))
            return sum(p[0, 0, :8] for p in parts)
        return jax.vmap(one)(a, b, dm)
    layers['one_side_partials_only'] = partials_only

    @jax.jit
    def partials_no_hT(a, b):
        """Same but WITHOUT transposing S_h into the vertical layout --
        isolates the (W,D,H)->(H,D,W) XLA transpose."""
        def one(aa, bb, base):
            sr, ss = tile_sigs(aa, bb, base, W)
            p2map = jnp.full((H, W), v.p2, jnp.float32)
            run = lambda s1x, s2x, p2x, dirs, rev, hor, sl: \
                sp._scan_pass_pallas(
                    s1x, s2x, p2x, D=D, disp_min=0, dirs=dirs, p1=v.p1,
                    invalid_cost=float(mf.BIG),
                    nbits=v.census_win ** 2 - 1,
                    reverse=rev, horizontal=hor, sec_len=sl,
                    allowed=allowed.astype(jnp.int32).reshape(D, 1))
            Svf, _ = run(sr, ss, p2map, ((0,), (1,), (-1,)), False, False,
                         None)
            Svb, _ = run(sr, ss, p2map, ((0,), (-1,), (1,)), True, False,
                         None)
            s1t, p2t = sr.T, p2map.T
            s2t = ss.T
            Shf, _ = run(s1t, s2t, p2t, ((0,),), False, True, W + D)
            Shb, _ = run(s1t, s2t, p2t, ((0,),), True, True, W + D)
            return (Svf[0, 0, :8] + Svb[0, 0, :8]
                    + Shf[0, 0, :8] + Shb[0, 0, :8])
        return jax.vmap(one)(a, b, dm)
    layers['one_side_passes_no_transpose'] = partials_no_hT

    @jax.jit
    def sigs_only(a, b):
        def one(aa, bb, base):
            sr, ss = tile_sigs(aa, bb, base, W)
            return sr[0, :8], ss[0, :8]
        return jax.vmap(one)(a, b, dm)
    layers['sigs_only'] = sigs_only

    @jax.jit
    def census_only(a, b):
        def one(aa, bb):
            s1 = mf.census_bits_raw(aa, v.census_win)[..., 0]
            s2 = mf.census_bits_raw(bb, v.census_win)[..., 0]
            return s1 ^ s2
        return jnp.sum(jax.vmap(one)(a, b), dtype=jnp.uint32)
    layers['census_both_images'] = census_only

    @jax.jit
    def shift_only(a, b):
        def one(bb, base):
            s2 = mf.census_bits_raw(bb, v.census_win)[..., 0]
            return mf._shift_sig_cols(s2, base, W, extra=D)
        return jnp.sum(jax.vmap(one)(b, dm), dtype=jnp.uint32)
    layers['census_plus_shift'] = shift_only

    dL0 = jnp.asarray(rng.rand(NB, H, W).astype(np.float32) * 10 - 5)
    dR0 = jnp.asarray(rng.rand(NB, H, W).astype(np.float32) * 10 - 5)
    di0 = jnp.asarray(rng.randint(0, D, (NB, H, W)).astype(np.int32))
    vo0 = [jnp.asarray(rng.randint(0, D, (NB, H, W)).astype(np.int32))
           for _ in range(8)]

    @jax.jit
    def post_only(dL, dR, di, *vo):
        out = jax.vmap(
            lambda l, r, i, *w: mf._flow_post(l, r, i, list(w), v, W))(
                dL, dR, di, *vo)
        return out[0][:, 0, :8], out[1][:, 0, :8]
    layers['post_chain_only'] = None   # custom args

    for name, fn in layers.items():
        if name == 'post_chain_only':
            try:
                t = bench(post_only, dL0, dR0, di0, *vo0)
                print(json.dumps({'probe': 'ablate', 'layer': name,
                                  'ms_per_tile': round(1e3 * t / NB, 3)}),
                      flush=True)
            except Exception as e:
                print(json.dumps({'probe': 'ablate', 'layer': name,
                                  'error': str(e)[:160]}), flush=True)
            continue
        try:
            t = bench(fn, a, b)
            print(json.dumps({'probe': 'ablate', 'layer': name,
                              'ms_per_tile': round(1e3 * t / NB, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({'probe': 'ablate', 'layer': name,
                              'error': str(e)[:160]}), flush=True)


if __name__ == '__main__':
    main()
