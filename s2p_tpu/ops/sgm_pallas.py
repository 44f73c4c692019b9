"""Pallas TPU kernels for the SGM/MGM aggregation hot path.

This is the speed-of-light implementation of the pipeline's compute core
(the reference shells out to the mgm binary here, cf.
/root/reference/s2p/block_matching.py:155-188).  It produces the exact same
aggregated volume, votes and validity mask as the portable lax path in
``sgm.py`` (tested against it in interpret mode), but restructured for the
memory system of the TPU:

  * the float32 cost volume never touches HBM.  The binary-faithful
    flow builds a compact uint8 cost volume ONCE per side in a
    parallel-grid pre-pass (_cost_prepass: XOR + popcount over cheap
    sublane windows of the transposed signatures; 255 = out-of-range,
    0 over reference padding) and every sequential DP step then streams
    1-byte cost rows -- the per-row Hankel construction and popcount
    are off the scan's critical path.  The generic aggregate() path
    still rebuilds cost rows from signatures in-scan;
  * each scan direction's running DP row L_r lives in a VMEM scratch
    buffer that persists across sequential grid steps, so a single kernel
    invocation aggregates all same-orientation directions (3 for vertical
    scans under the 8-direction default) in one pass over the image;
  * the disparity axis is the sublane dimension of a (D, W) register
    tile: the P1/P2 min-convolution is two static sublane shifts + mins,
    and the MGM lateral (diagonal) predecessors are static lane rolls of
    the carry;
  * per-direction WTA votes (for the consensus confidence) are folded into
    the same pass.

In-scan cost-row construction (the generic path) differs by scan
orientation because disparity always shifts along the original image's x
axis:
  * vertical scans (scan axis = y): the shifted secondary row
    s2[k, x] = sig2[y, x + dmin + k] is built from the current row by a
    log-step sequence of static lane rolls selected per sublane (a
    "Hankel" construction);
  * horizontal scans (run on transposed signatures, scan axis = x): the
    window sig2^T[x + dmin .. x + dmin + D) is a contiguous sublane slice
    of the full transposed signature, which is small enough (uint32 per
    pixel) to pin entirely in VMEM, padded so the slice never clamps.

HBM traffic per aggregation: read 4x signatures (~8 MB at 800^2) and write
2 partial sum volumes -- vs ~17 volume-sized reads/writes for the unfused
lax path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .census import census_transform

# rows per grid step: amortizes grid-step overhead; must divide padded H/W
_ROW_BLOCK = 8
_VALID_BIT = 24          # census uses bits [0, 24) for win <= 5
_PAD_BIT = 25            # reference-side padding marker (mgm_flow batch)


def _popcount(v):
    """Branch-free popcount of the low 32 bits (uint32 in, int32 out)."""
    v = v - ((v >> 1) & np.uint32(0x55555555))
    v = (v & np.uint32(0x33333333)) + ((v >> 2) & np.uint32(0x33333333))
    v = (v + (v >> 4)) & np.uint32(0x0F0F0F0F)
    return ((v * np.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _minconv(L, p1, p2):
    """SGM penalty update on a (D, W) slab, disparity = sublane axis."""
    big = jnp.asarray(jnp.inf, L.dtype)
    lm = jnp.concatenate([jnp.full_like(L[:1], big), L[:-1]], axis=0)
    lp = jnp.concatenate([L[1:], jnp.full_like(L[:1], big)], axis=0)
    m = jnp.min(L, axis=0, keepdims=True)
    return jnp.minimum(jnp.minimum(L, jnp.minimum(lm, lp) + p1), m + p2) - m


def _scan_kernel(*refs,
                 D, W, G, n_steps, disp_min, dirs, p1, invalid_cost,
                 sig_mask, reverse, horizontal, pad, sec_len,
                 sub_cost_mult=0.0, has_allowed=False, seg_w=None,
                 emit_votes=True, has_accum=False, cost_mode=False):
    refs = list(refs)
    cost_in_ref = None
    if cost_mode:
        # pre-computed uint8 cost rows (``_cost_prepass``): the row body
        # skips signature loads, the Hankel construction and popcount
        cost_in_ref, p2_ref = refs[:2]
        del refs[:2]
        sig1_ref = sig2_ref = allowed_ref = None
    elif has_allowed:
        # (D, 1) int32 per-tile candidate mask (the bucket's disparity-axis
        # padding and the tile's true range; mgm_flow batch contract)
        sig1_ref, sig2_ref, p2_ref, allowed_ref = refs[:4]
        del refs[:4]
    else:
        sig1_ref, sig2_ref, p2_ref = refs[:3]
        del refs[:3]
        allowed_ref = None
    accum_ref = refs.pop(0) if has_accum else None
    S_ref = refs.pop(0)
    votes_ref = refs.pop(0) if emit_votes else None
    carries = refs
    # One grid step: G scan rows through all ``dirs`` DP recursions.
    # For vertical passes, W is the image width (lane axis = x, the
    # disparity shift axis).  For horizontal passes the signatures are
    # transposed: the lane axis is y, the scan axis is x, and sig2_ref
    # is the full padded transposed signature held in VMEM.
    pid = pl.program_id(0)
    block = (n_steps - 1 - pid) if reverse else pid
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (D, W), 0)
    x_ids = jax.lax.broadcasted_iota(jnp.int32, (D, W), 1)
    # lane-folded batches (seg_w set): the lane axis carries several tiles
    # as independent segments of width seg_w; lateral carry rolls must not
    # leak across segment boundaries, so the edge dead-masks use the
    # within-segment lane index.  A masked-out (fresh-border) carry is
    # identically zero and minconv(0) == 0, so a segment edge behaves
    # bitwise like the array edge of the single-tile kernel.
    SW = W if seg_w is None else seg_w
    x_loc = x_ids if seg_w is None else jax.lax.rem(x_ids, jnp.int32(seg_w))
    first_local = G - 1 if reverse else 0
    p1 = jnp.asarray(p1, jnp.float32)
    inv = jnp.asarray(invalid_cost, jnp.float32)

    allowed = None
    if allowed_ref is not None:
        allowed = jnp.broadcast_to(allowed_ref[:] == 1, (D, W))
    if cost_mode:
        pass
    elif not horizontal:
        x2 = x_ids + disp_min + k_ids
        inb = (x2 >= 0) & (x2 < sec_len)
    else:
        # one sublane-aligned window per grid step covers all G row slices:
        # rows block*G + disp_min + pad + [0, D + G); ``pad`` is chosen by
        # the caller so the base offset is a multiple of the sublane count
        base = pl.multiple_of(block * G + disp_min + pad, G)
        window = sig2_ref[pl.ds(base, D + G), :]           # (D+G, W=H)

    # static unroll: per-row slices stay static, Mosaic-friendly
    rows = range(G - 1, -1, -1) if reverse else range(G)
    for row in rows:
        p2r = p2_ref[pl.ds(row, 1), :]                     # (1, W) f32

        if cost_mode:
            # v5e Mosaic supports neither u8->f32 casts nor 8-bit
            # vector compares: widen to int32 first
            ci = cost_in_ref[pl.ds(row, 1), :, :].reshape(D, W) \
                .astype(jnp.int32)
            cost = jnp.where(ci == 255, inv, ci.astype(jnp.float32))
        if not cost_mode:
            s1 = sig1_ref[pl.ds(row, 1), :]                # (1, W) uint32
        if cost_mode:
            pass
        elif horizontal:
            s2b = window[row:row + D]                      # (D, W=H)
            # scan position along the original x axis; width = n_steps * G
            ix = block * G + row + disp_min + k_ids
            inb_r = (ix >= 0) & (ix < sec_len)
        else:
            s2row = sig2_ref[pl.ds(row, 1), :]
            # shifted-row construction s2b[k, x] = sig2row[x + dmin + k] by
            # doubling: X_{b+1} = [X_b ; roll(X_b, -2^b)] (materialized
            # arrays only -- Mosaic cannot roll broadcast layouts).  The
            # secondary may be WIDER than the reference (W2 = W + D margin,
            # the batch rebase contract): build on W2 lanes, slice to W.
            W2 = s2row.shape[1]
            s2b = (jnp.roll(s2row, -disp_min, axis=1)
                   if disp_min % W2 != 0 else s2row)
            while s2b.shape[0] < D:
                step = s2b.shape[0]
                s2b = jnp.concatenate(
                    [s2b, jnp.roll(s2b, -step, axis=1)], axis=0)
            s2b = s2b[:D, :W]
            inb_r = inb

        if not cost_mode:
            v1 = (s1 >> _VALID_BIT) & np.uint32(1)         # (1, W)
            v2h = (s2b >> _VALID_BIT) & np.uint32(1)       # (D, W)
            ham = _popcount((s1 ^ s2b) & sig_mask).astype(jnp.float32)
            ok = (v1 == 1) & (v2h == 1) & inb_r
            if allowed is not None:
                ok = ok & allowed
            cost = jnp.where(ok, ham, inv)
            # reference-side padding pixels (sig1 _PAD_BIT) cost 0 at
            # every candidate so the carry stays in the fresh-border
            # state until the first real pixel (padding-exactness
            # contract); in cost_mode the pre-pass already encoded this
            in_pad = ((s1 >> _PAD_BIT) & np.uint32(1)) == 1
            cost = jnp.where(in_pad, 0.0, cost)

        # only the very first scan row of the image lacks a predecessor
        first = (pid == 0) if row == first_local else None

        Ssum = None
        for d_idx, laterals in enumerate(dirs):
            L_prev = carries[d_idx][:]

            def contrib(lat):
                Lp = jnp.roll(L_prev, lat, axis=1) if lat else L_prev
                mc = _minconv(Lp, p1, p2r)
                if lat > 0:
                    dead = x_loc < lat
                elif lat < 0:
                    dead = x_loc >= SW + lat
                else:
                    dead = None
                if first is not None:
                    dead = first if dead is None else (first | dead)
                if dead is None:
                    return mc
                return jnp.where(dead, 0.0, mc)

            c = contrib(laterals[0])
            for lat in laterals[1:]:
                c = c + contrib(lat)
            if len(laterals) > 1:
                c = c * (1.0 / len(laterals))
            L_new = cost + c
            carries[d_idx][:] = L_new
            Ssum = L_new if Ssum is None else Ssum + L_new

            if votes_ref is not None:
                mn = jnp.min(L_new, axis=0, keepdims=True)
                am = jnp.min(jnp.where(L_new == mn, k_ids, D), axis=0,
                             keepdims=True)
                votes_ref[d_idx, pl.ds(row, 1), :] = am

        if sub_cost_mult:
            # the MGM energy-overcount fix S = sum_r L_r - (n-1)*c
            # (TSGM_FIX_OVERCOUNT=1), folded into one pass
            Ssum = Ssum - jnp.float32(sub_cost_mult) * cost
        if accum_ref is not None:
            # accumulate the previous same-orientation pass in-place
            # (input aliased to this output): saves the full-volume
            # XLA add between passes
            Ssum = Ssum + accum_ref[pl.ds(row, 1), :, :].reshape(D, W)
        S_ref[pl.ds(row, 1), :, :] = Ssum.reshape(1, D, W)


def _scan_pass_pallas(sig1, sig2, p2map, D, disp_min, dirs, p1,
                      invalid_cost, nbits, reverse, horizontal,
                      interpret=False, sub_cost_mult=0.0, allowed=None,
                      sec_len=None, seg_w=None, row_block=None,
                      emit_votes=True, accum=None, cost=None):
    """All same-orientation directions in one streaming pass.

    Args:
        sig1: (N, W) uint32 packed census signature rows along the scan
            axis (transposed for horizontal passes), validity at bit
            ``_VALID_BIT``.
        sig2: like sig1 for vertical passes; for horizontal passes the
            transposed signature pre-padded with ``pad`` invalid rows on
            each side of the scan axis.
        p2map: (N, W) float32 per-pixel P2 penalty (same layout as sig1).
        dirs: static list of lateral-offset tuples per direction.

    Returns:
        (S_partial (N, D, W) float32, votes (n_dirs, N, W) int32).
    """
    if cost is not None:
        N, _, W = cost.shape
    else:
        N, W = sig1.shape
    G = _ROW_BLOCK if row_block is None else row_block
    assert N % G == 0, (N, G)
    n_steps = N // G
    n_dirs = len(dirs)
    sig_mask = np.uint32((1 << nbits) - 1)
    if cost is not None:
        pad = 0
        sec_len = 0          # unused: the pre-pass baked all masks in
    elif horizontal:
        # the secondary scan axis may be longer than the reference's (the
        # batch rebase ships W + D extra positions); symmetric zero pad is
        # the legacy layout, trailing-margin the wide one
        pad = (sig2.shape[0] - N) // 2 if sec_len is None else 0
        sec_len = n_steps * G if sec_len is None else sec_len
    else:
        pad = 0
        sec_len = sig2.shape[1] if sec_len is None else sec_len

    def idx(i):
        return (n_steps - 1 - i) if reverse else i

    kernel = functools.partial(
        _scan_kernel, D=D, W=W, G=G, n_steps=n_steps, disp_min=disp_min,
        dirs=tuple(dirs), p1=p1, invalid_cost=invalid_cost,
        sig_mask=sig_mask, reverse=reverse, horizontal=horizontal, pad=pad,
        sec_len=sec_len, sub_cost_mult=sub_cost_mult,
        has_allowed=cost is None and allowed is not None, seg_w=seg_w,
        emit_votes=emit_votes, has_accum=accum is not None,
        cost_mode=cost is not None)

    if cost is not None:
        sig2_spec = None
    elif horizontal:
        sig2_spec = pl.BlockSpec(memory_space=pltpu.VMEM)   # full array
    else:
        sig2_spec = pl.BlockSpec((G, sig2.shape[1]), lambda i: (idx(i), 0),
                                 memory_space=pltpu.VMEM)

    if cost is not None:
        # pre-computed uint8 cost rows: (G, D, W) blocks + the p2 rows
        in_specs = [
            pl.BlockSpec((G, D, W), lambda i: (idx(i), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, W), lambda i: (idx(i), 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [cost, p2map]
    else:
        in_specs = [
            pl.BlockSpec((G, W), lambda i: (idx(i), 0),
                         memory_space=pltpu.VMEM),
            sig2_spec,
            pl.BlockSpec((G, W), lambda i: (idx(i), 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [sig1, sig2, p2map]
        if allowed is not None:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(allowed)
    io_aliases = {}
    if accum is not None:
        in_specs.append(pl.BlockSpec((G, D, W), lambda i: (idx(i), 0, 0),
                                     memory_space=pltpu.VMEM))
        io_aliases = {len(operands): 0}
        operands.append(accum)

    out_specs = [pl.BlockSpec((G, D, W), lambda i: (idx(i), 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((N, D, W), jnp.float32)]
    if emit_votes:
        out_specs.append(pl.BlockSpec((n_dirs, G, W),
                                      lambda i: (0, idx(i), 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((n_dirs, N, W), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((D, W), jnp.float32)
                        for _ in range(n_dirs)],
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(*operands)
    if emit_votes:
        return outs
    return outs[0], None


def _wta_kernel(*refs, D, W, G, disp_min, subpix, n_parts,
                big_guard=None, with_dr=True, emit_offset=False):
    """Fused WTA + subpixel + right-reference disparity, one pass over S.

    Replaces the XLA gather chain (argmin, take_along_axis x3, the
    S_R re-indexing of ``sgm._right_disparity``) -- all of which stream
    the full volume from HBM separately -- with a single row-blocked scan
    that sums the orientation partials in VMEM and reduces each (D, W)
    slab to three (W,) maps with masked min-reductions (no gathers).
    """
    part_refs = refs[:n_parts]
    disp_ref, dint_ref, dr_ref = refs[n_parts:]
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (D, W), 0)
    x_ids = jax.lax.broadcasted_iota(jnp.int32, (D, W), 1)
    big = jnp.float32(jnp.inf)

    def select_at(X, onehot):
        """X[d_int, x] per column via masked min (no gather)."""
        return jnp.min(jnp.where(onehot, X, big), axis=0, keepdims=True)

    def subpixel(S, onehot, d_int, c1):
        # c1 = S[d_int] is definitionally the already-computed row min
        up = jnp.concatenate([jnp.full_like(S[:1], big), S[:-1]], axis=0)
        dn = jnp.concatenate([S[1:], jnp.full_like(S[:1], big)], axis=0)
        c0 = select_at(up, onehot)
        c2 = select_at(dn, onehot)
        guard = c1 + 1e6
        c0 = jnp.where(jnp.isfinite(c0), c0, guard)
        c2 = jnp.where(jnp.isfinite(c2), c2, guard)
        interior = (d_int > 0) & (d_int < D - 1)
        if big_guard is not None:
            # mgm_flow semantics: no refinement against out-of-range
            # (BIG-cost) side candidates
            interior = interior & (c0 < big_guard) & (c2 < big_guard)
        if subpix == 'vfit':
            den = 2.0 * (jnp.maximum(c0, c2) - c1)
            off = (c0 - c2) / jnp.maximum(den, 1e-9)
        elif subpix == 'parabola':
            den = c0 - 2.0 * c1 + c2
            off = 0.5 * (c0 - c2) / jnp.maximum(den, 1e-9)
        else:
            return jnp.zeros_like(c1)
        off = jnp.clip(off, -0.5, 0.5)
        return jnp.where(interior, off, 0.0)

    for row in range(G):
        S = part_refs[0][pl.ds(row, 1), :, :].reshape(D, W)
        for p in part_refs[1:]:
            S = S + p[pl.ds(row, 1), :, :].reshape(D, W)

        mn = jnp.min(S, axis=0, keepdims=True)
        d_int = jnp.min(jnp.where(S == mn, k_ids, D), axis=0, keepdims=True)
        onehot = k_ids == d_int
        off = subpixel(S, onehot, d_int, mn)
        if emit_offset:
            # the caller composes (base + d_int) + off so the traced-base
            # batch entry rounds bitwise like the static-base single entry
            disp_row = off
        else:
            disp_row = disp_min + d_int.astype(jnp.float32) + off
        if big_guard is not None:
            # no in-range candidate at all -> invalid from the start
            disp_row = jnp.where(mn < big_guard, disp_row, jnp.nan)
        disp_ref[pl.ds(row, 1), :] = disp_row
        dint_ref[pl.ds(row, 1), :] = d_int

        if not with_dr:
            dr_ref[pl.ds(row, 1), :] = jnp.zeros((1, W), jnp.float32)
            continue
        # right-reference volume S_R[k, x] = S[k, x - disp_min - k] via a
        # per-sublane lane roll (log-step construction), masked outside
        R = jnp.roll(S, disp_min, axis=1) if disp_min % W else S
        b = 0
        while (1 << b) < D:
            step = 1 << b
            R = jnp.where((k_ids & step) != 0,
                          jnp.roll(R, step, axis=1), R)
            b += 1
        ixr = x_ids - disp_min - k_ids
        S_R = jnp.where((ixr >= 0) & (ixr < W), R, big)
        mnr = jnp.min(S_R, axis=0, keepdims=True)
        kR = jnp.min(jnp.where(S_R == mnr, k_ids, D), axis=0, keepdims=True)
        offR = subpixel(S_R, k_ids == kR, kR, mnr)
        dr_ref[pl.ds(row, 1), :] = -(disp_min + kR.astype(jnp.float32)
                                     + offR)


def _wta_pallas(parts, disp_min, subpix, interpret=False, big_guard=None,
                with_dr=True, emit_offset=False, row_block=None):
    """(disp_raw, d_int, dR) maps from the summed (H, D, W) partials."""
    H, D, W = parts[0].shape
    G = _ROW_BLOCK if row_block is None else row_block
    assert H % G == 0
    n_parts = len(parts)
    kernel = functools.partial(_wta_kernel, D=D, W=W, G=G,
                               disp_min=disp_min, subpix=subpix,
                               n_parts=n_parts, big_guard=big_guard,
                               with_dr=with_dr, emit_offset=emit_offset)
    part_spec = pl.BlockSpec((G, D, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((G, W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(H // G,),
        in_specs=[part_spec] * n_parts,
        out_specs=[map_spec, map_spec, map_spec],
        out_shape=[
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.int32),
            jax.ShapeDtypeStruct((H, W), jnp.float32),
        ],
        interpret=interpret,
    )(*parts)


def _cost_prepass_kernel(sig1_ref, sig2_ref, cost_ref, *,
                         D, W, G, n_steps, disp_min, sig_mask, pad,
                         sec_len, allowed_ref=None):
    """Parallel pre-pass: uint8 census cost rows in the TRANSPOSED
    (scan axis = x) layout, built with the cheap sublane-window trick.

    Encoding (decoded exactly by the scan kernels): hamming distance
    0..nbits for admissible candidates, 255 for out-of-range/disallowed
    (-> invalid_cost), 0 over reference-side padding (the fresh-border
    zero-cost contract).  Computing this ONCE removes the per-row
    Hankel construction + popcount from every sequential DP step."""
    pid = pl.program_id(0)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (D, W), 0)
    base = pl.multiple_of(pid * G + disp_min + pad, G)
    window = sig2_ref[pl.ds(base, D + G), :]               # (D+G, W=H)
    allowed = None
    if allowed_ref is not None:
        allowed = jnp.broadcast_to(allowed_ref[:] == 1, (D, W))
    for row in range(G):
        s1 = sig1_ref[pl.ds(row, 1), :]
        s2b = window[row:row + D]
        ix = pid * G + row + disp_min + k_ids
        inb = (ix >= 0) & (ix < sec_len)
        v1 = (s1 >> _VALID_BIT) & np.uint32(1)
        v2h = (s2b >> _VALID_BIT) & np.uint32(1)
        ham = _popcount((s1 ^ s2b) & sig_mask)
        ok = (v1 == 1) & (v2h == 1) & inb
        if allowed is not None:
            ok = ok & allowed
        c = jnp.where(ok, ham, 255)
        in_pad = ((s1 >> _PAD_BIT) & np.uint32(1)) == 1
        c = jnp.where(in_pad, 0, c)
        cost_ref[pl.ds(row, 1), :, :] = c.astype(jnp.uint8) \
            .reshape(1, D, W)


def _cost_prepass(s1t, s2tp, D, disp_min, nbits, pad, sec_len,
                  allowed=None, interpret=False):
    """(N, D, lanes) uint8 cost volume in the transposed layout."""
    N, L = s1t.shape
    G = _ROW_BLOCK
    assert N % G == 0
    kernel = functools.partial(
        _cost_prepass_kernel, D=D, W=L, G=G, n_steps=N // G,
        disp_min=disp_min, sig_mask=np.uint32((1 << nbits) - 1), pad=pad,
        sec_len=sec_len)
    in_specs = [
        pl.BlockSpec((G, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [s1t, s2tp]
    if allowed is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(allowed)

        def body(s1_ref, s2_ref, al_ref, cost_ref):
            kernel(s1_ref, s2_ref, cost_ref, allowed_ref=al_ref)
    else:
        def body(s1_ref, s2_ref, cost_ref):
            kernel(s1_ref, s2_ref, cost_ref)
    return pl.pallas_call(
        body,
        grid=(N // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, D, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D, L), jnp.uint8),
        interpret=interpret,
    )(*operands)


def _pack(sig, valid):
    return sig | (valid.astype(jnp.uint32) << _VALID_BIT)


def _any_valid_candidate(val2, disp_min, D):
    """any_k val2[y, x + disp_min + k] via a windowed sum of the 0/1 mask."""
    W2 = val2.shape[1]
    cs = jnp.concatenate(
        [jnp.zeros((val2.shape[0], 1), jnp.int32),
         jnp.cumsum(val2.astype(jnp.int32), axis=1)], axis=1)
    x = jnp.arange(val2.shape[1])
    lo = jnp.clip(x + disp_min, 0, W2)
    hi = jnp.clip(x + disp_min + D, 0, W2)
    return (cs[:, hi] - cs[:, lo]) > 0


# direction -> (pass, lateral carry offsets); offsets follow sgm._scan_pass:
#   vertical fwd  (dy=+1): (0,1)->(0,+1)  (1,1)->(+1,0)  (-1,1)->(-1,0)
#   vertical bwd  (dy=-1): (0,-1)->(0,-1) (-1,-1)->(-1,0) (1,-1)->(+1,0)
#   horizontal fwd (dx=+1, transposed): (1,0)->(0,+1)
#   horizontal bwd (dx=-1, transposed): (-1,0)->(0,-1)
_PASS_OF_DIR = {
    (0, 1): ('vf', (0, 1)), (1, 1): ('vf', (1, 0)), (-1, 1): ('vf', (-1, 0)),
    (0, -1): ('vb', (0, -1)), (-1, -1): ('vb', (-1, 0)),
    (1, -1): ('vb', (1, 0)),
    (1, 0): ('hf', (0, 1)), (-1, 0): ('hb', (0, -1)),
}


def _aggregate_partials(im1, im2, disp_min, disp_max, params, p2map=None,
                        interpret=False):
    """Runs the scan passes; returns ((H, D, W) partial sum volumes,
    valid1, votes) without assembling the full (H, W, D) volume."""
    from .sgm import _DIRS_8

    assert im1.shape == im2.shape, 'pallas path requires equal padded shapes'
    H, W = im1.shape
    D = disp_max - disp_min + 1
    win = params.census_win
    nbits = win * win - 1
    assert nbits <= _VALID_BIT
    invalid_cost = float(nbits)

    sig1, val1 = census_transform(im1, win)
    sig2, val2 = census_transform(im2, win)
    s1 = _pack(sig1[..., 0], val1)
    s2 = _pack(sig2[..., 0], val2)

    if p2map is None:
        p2map = jnp.full((H, W), params.p2, jnp.float32)
    else:
        p2map = p2map.astype(jnp.float32)

    dirs = _DIRS_8[:max(2, min(params.nb_dir, 8))]
    passes = {}          # pass key -> (list of dir indices, list of laterals)
    for i, d in enumerate(dirs):
        key, (main, partner) = _PASS_OF_DIR[d]
        if not params.mgm:
            lats = (main,)
        elif params.mgm_neighbors >= 3:
            lats = (main, partner, -(main + partner))
        else:
            lats = (main, partner)
        passes.setdefault(key, ([], []))
        passes[key][0].append(i)
        passes[key][1].append(lats)

    s1t = s2tp = p2t = None
    if 'hf' in passes or 'hb' in passes:
        s1t, p2t = s1.T, p2map.T
        # pad the scan axis so the per-step (D + G)-row window never
        # clamps (rows x + disp_min + [0, D + G) for x in [0, W)) and so
        # the window base stays sublane-aligned: (disp_min + pad) % G == 0
        G = _ROW_BLOCK
        pad = max(0, -disp_min, disp_min + D)
        pad += (-(disp_min + pad)) % G
        s2tp = jnp.pad(s2.T, ((pad, pad), (0, 0)))

    run = functools.partial(_scan_pass_pallas, D=D, disp_min=disp_min,
                            p1=params.p1,
                            invalid_cost=invalid_cost, nbits=nbits,
                            interpret=interpret)

    S_v = None
    S_h = None
    votes = [None] * len(dirs)
    for key, (dir_idx, lats) in passes.items():
        if key in ('vf', 'vb'):
            Sp, v = run(s1, s2, p2map, dirs=lats, reverse=(key == 'vb'),
                        horizontal=False)
            S_v = Sp if S_v is None else S_v + Sp
            for j, i in enumerate(dir_idx):
                votes[i] = v[j]
        else:
            Sp, v = run(s1t, s2tp, p2t, dirs=lats, reverse=(key == 'hb'),
                        horizontal=True)
            S_h = Sp if S_h is None else S_h + Sp
            for j, i in enumerate(dir_idx):
                votes[i] = v[j].T

    valid1 = val1 & _any_valid_candidate(val2, disp_min, D)
    parts = []
    if S_v is not None:
        parts.append(S_v)
    if S_h is not None:
        parts.append(jnp.transpose(S_h, (2, 1, 0)))      # (W,D,H) -> (H,D,W)
    return parts, valid1, votes


def aggregate(im1, im2, disp_min, disp_max, params, p2map=None,
              interpret=False):
    """Census cost + multi-direction SGM/MGM aggregation, Pallas kernels.

    Drop-in equivalent of ``sgm._aggregate`` for the census cost on pairs
    of equal (padded) shape: returns (S (H, W, D) float32, valid1 (H, W)
    bool, votes list of (H, W) int32 in direction order).
    """
    parts, valid1, votes = _aggregate_partials(
        im1, im2, disp_min, disp_max, params, p2map, interpret)
    S = jnp.transpose(sum(parts[1:], parts[0]), (0, 2, 1))
    return S, valid1, votes


def match_pallas(im1, im2, disp_min, disp_max, params, p2map=None,
                 interpret=False):
    """Aggregation + fused WTA/subpixel/right-disparity, all in Pallas.

    Returns a dict with 'disp_raw' (float32, disp_min + WTA + subpixel,
    no validity applied), 'd_int' (int32 WTA index), 'dR' (float32
    right-reference disparity for the LR test, cf.
    ``sgm._right_disparity``), 'valid1' (bool) and 'votes' (list of int32
    per-direction WTA maps).
    """
    parts, valid1, votes = _aggregate_partials(
        im1, im2, disp_min, disp_max, params, p2map, interpret)
    disp_raw, d_int, dR = _wta_pallas(parts, disp_min, params.subpix,
                                      interpret=interpret)
    return {'disp_raw': disp_raw, 'd_int': d_int, 'dR': dR,
            'valid1': valid1, 'votes': votes}


# --------------------------------------------------------------------- #
# Binary-faithful flow entry (ops/mgm_flow.py semantics)
# --------------------------------------------------------------------- #

def flow_sigs(im1, im2, win, h1=None, w1=None, w2=None):
    """Bit-annotated census signatures for the faithful flow.

    Census on raw values (census_bits_raw: NaN pixels participate as
    data); extent semantics ride signature bits so the kernel needs no
    per-tile scalars (the extents may be TRACED):
      * sig2 bit _VALID_BIT = 0 beyond the true secondary width -> those
        candidates cost BIG (out of range, like the binary's truncDist);
      * sig1 bit _PAD_BIT = 1 over reference-side padding -> zero cost
        rows keep the scan carry in the fresh-border state.
    """
    from .mgm_flow import census_bits_raw
    s1 = census_bits_raw(im1, win)[..., 0]
    s2 = census_bits_raw(im2, win)[..., 0]
    H, W = im1.shape
    xs = jnp.arange(W)[None, :]
    ys = jnp.arange(H)[:, None]
    v2 = xs < (W if w2 is None else jnp.asarray(w2, jnp.int32))
    s2 = s2 | (jnp.broadcast_to(v2, (H, W)).astype(jnp.uint32) << _VALID_BIT)
    s1 = s1 | (jnp.uint32(1) << _VALID_BIT)
    if h1 is not None or w1 is not None:
        pad = ((ys >= jnp.asarray(H if h1 is None else h1, jnp.int32))
               | (xs >= jnp.asarray(W if w1 is None else w1, jnp.int32)))
        s1 = s1 | (pad.astype(jnp.uint32) << _PAD_BIT)
    return s1, s2


def flow_partials_from_sigs(s1, s2, disp_min: int, D: int, variant,
                            p2map=None, allowed=None, interpret=False,
                            emit_votes=True):
    """Aggregation partials of the faithful flow from bit-annotated
    signatures: classic independent scans (tsgm=1), BIG out-of-range
    costs, the TSGM_FIX_OVERCOUNT subtraction folded into the first pass.

    Returns ((H, D, W) partials list, votes list)."""
    from .mgm_flow import BIG
    from .sgm import _DIRS_8

    H, W = s1.shape
    nbits = variant.census_win ** 2 - 1
    assert nbits <= _VALID_BIT
    if p2map is None:
        p2map = jnp.full((H, W), variant.p2, jnp.float32)
    else:
        p2map = jnp.broadcast_to(p2map.astype(jnp.float32), (H, W))
    if allowed is not None:
        allowed = jnp.asarray(allowed, jnp.int32).reshape(D, 1)

    dirs = _DIRS_8[:max(2, min(variant.nb_dir, 8))]
    passes = {}
    for i, d in enumerate(dirs):
        key, (main, partner) = _PASS_OF_DIR[d]
        passes.setdefault(key, ([], []))
        passes[key][0].append(i)
        passes[key][1].append((main,))

    wide = s2.shape[1] > s1.shape[1]     # batch rebase: W2 = W + margin
    assert not wide or disp_min == 0
    fits, use_prepass, use_accum = scan_vmem_plan(H, W, D)
    assert fits, 'caller must gate on scan_vmem_plan (use the lax path)'
    # the uint8 cost volume is built ONCE in the transposed layout (the
    # cheap sublane-window construction) and streamed by all four scans:
    # the sequential DP steps lose the per-row Hankel rolls + popcount
    s1t, p2t = s1.T, p2map.T
    if wide:
        s2tp = s2.T                      # trailing margin, no extra pad
        h_sec_len = s2.shape[1]
        pad = 0
    else:
        G = _ROW_BLOCK
        pad = max(0, -disp_min, disp_min + D)
        pad += (-(disp_min + pad)) % G
        s2tp = jnp.pad(s2.T, ((pad, pad), (0, 0)))
        h_sec_len = s1t.shape[0]
    if use_prepass:
        cost_h = _cost_prepass(s1t, s2tp, D, disp_min, nbits, pad,
                               h_sec_len, allowed=allowed,
                               interpret=interpret)
        cost_v = jnp.transpose(cost_h, (2, 1, 0))      # (H, D, W)
    else:
        cost_h = cost_v = None

    run = functools.partial(_scan_pass_pallas, D=D, disp_min=disp_min,
                            p1=variant.p1, invalid_cost=float(BIG),
                            nbits=nbits, interpret=interpret,
                            emit_votes=emit_votes)

    S_v = S_h = None
    votes = [None] * len(dirs)
    sub = float(len(dirs) - 1) if variant.overcount_fix else 0.0
    for key, (dir_idx, lats) in passes.items():
        kw = {}
        if sub:
            kw['sub_cost_mult'] = sub
            sub = 0.0            # exactly one pass applies the fix
        if key in ('vf', 'vb'):
            Sp, v = run(s1 if cost_v is None else None,
                        s2 if cost_v is None else None, p2map, dirs=lats,
                        reverse=(key == 'vb'), horizontal=False,
                        allowed=None if use_prepass else allowed,
                        accum=S_v if use_accum else None, cost=cost_v,
                        **kw)
            S_v = Sp if (use_accum or S_v is None) else S_v + Sp
            for j, i in enumerate(dir_idx):
                votes[i] = v[j] if v is not None else None
        else:
            Sp, v = run(s1t if cost_h is None else None,
                        s2tp if cost_h is None else None, p2t, dirs=lats,
                        reverse=(key == 'hb'), horizontal=True,
                        sec_len=h_sec_len if cost_h is None and wide
                        else None,
                        allowed=None if use_prepass else allowed,
                        accum=S_h if use_accum else None, cost=cost_h,
                        **kw)
            S_h = Sp if (use_accum or S_h is None) else S_h + Sp
            for j, i in enumerate(dir_idx):
                votes[i] = v[j].T if v is not None else None

    parts = []
    if S_v is not None:
        parts.append(S_v)
    if S_h is not None:
        parts.append(jnp.transpose(S_h, (2, 1, 0)))
    return parts, votes


def flow_one_side_pallas(im1, im2, disp_min, D, variant, p2map=None,
                         interpret=False, ext=None, emit_votes=True):
    """One side of the binary-faithful flow: (disp_raw, d_int, votes),
    matching ops.mgm_flow._mgm_one_side's WTA semantics exactly.
    ``ext`` = optional static (h1, w1, w2, d_true) true extents of a
    padded tile."""
    from .mgm_flow import BIG

    h1 = w1 = w2 = None
    allowed = None
    if ext is not None:
        h1, w1, w2, d_true = ext
        if d_true is not None and d_true != D:
            allowed = (jnp.arange(D) < d_true).astype(jnp.int32)
    s1, s2 = flow_sigs(im1, im2, variant.census_win, h1, w1, w2)
    parts, votes = flow_partials_from_sigs(s1, s2, int(disp_min), D,
                                           variant, p2map, allowed,
                                           interpret,
                                           emit_votes=emit_votes)
    off, d_int, _ = _wta_pallas(parts, int(disp_min), variant.subpix,
                                interpret=interpret,
                                big_guard=float(BIG) / 2, with_dr=False,
                                emit_offset=True)
    disp = (jnp.asarray(disp_min, jnp.float32)
            + d_int.astype(jnp.float32)) + off
    return disp, d_int, votes


# --------------------------------------------------------------------- #
# Lane-folded batch: B tiles share one DP slab (PERF.md lever 2)
# --------------------------------------------------------------------- #
#
# SGM's row recurrence serializes the scan axis: each grid step must fully
# retire a (D, W) slab (including the min-convolution's latency chain)
# before the next row starts, and at D=64-96, W~600 that is so little
# independent work that ~90% of each step is dependency bubbles (PERF.md
# section 1).  vmap over tiles lifts the batch to a *grid* dimension --
# steps still execute one tile-row at a time.  The functions below instead
# concatenate B same-bucket tiles along the LANE axis, so every sequential
# DP step carries B tiles of independent columns:
#
#   * both sides use equal segment width Wseg >= W + D (the rebased
#     candidate reach), the primary padded with _PAD_BIT columns: every
#     cross-segment artifact (Hankel lane rolls of the secondary, the
#     global roll wrap) lands on zero-cost padding lanes;
#   * the +-1 lateral carry rolls are masked at segment boundaries
#     (seg_w in _scan_kernel), which is bitwise identical to the
#     single-tile edge masks because a fresh-border carry is identically
#     zero and minconv(0) == 0;
#   * horizontal passes fold along the y axis (their lane axis) -- folding
#     along the scan axis would let the DP carry flow between tiles;
#   * the fold factor is VMEM-bound: the dominant block is the S-partial
#     output window (G*D*4 bytes per lane, double-buffered), so the row
#     block G shrinks as B grows (lane_fold_plan).


def scan_vmem_plan(H, W, D, n_dirs_v=3, vmem_budget=None):
    """(fits, use_prepass, use_accum) for the flow's scan passes under
    the VMEM budget.

    The S-output window (2*G*D*4 bytes/lane, double-buffered) is fixed;
    the optional uint8 cost-prepass input (2*G*D) and the aliased
    accumulator input (2*G*D*4) are dropped in that order when a big
    bucket (large D x lanes) would exceed the arena; if even the base
    configuration does not fit, the caller must use the lax path --
    Mosaic hard-crashes (remote-compile HTTP 500) rather than erroring
    cleanly on VMEM exhaustion."""
    import os
    G = _ROW_BLOCK
    budget = vmem_budget or int(os.environ.get('S2P_TPU_VMEM_BUDGET',
                                               12 * 2 ** 20))
    lanes = max(H, W)

    def fits(prepass, accum):
        b = 2 * G * D * 4                 # S out, double-buffered
        b += 2 * n_dirs_v * G * 4         # votes out
        b += n_dirs_v * D * 4             # DP carries
        b += 2 * G * 4                    # p2 rows
        if prepass:
            b += 2 * G * D                # uint8 cost rows
        else:
            # signature rows + the full transposed secondary resident
            # during horizontal passes
            b += 3 * 2 * G * 4 + (max(H, W) + 2 * D) * 4
        if accum:
            b += 2 * G * D * 4
        return b * lanes <= budget

    for prepass, accum in ((True, True), (True, False), (False, False)):
        if fits(prepass, accum):
            return True, prepass, accum
    return False, False, False


def lane_fold_plan(H, W, D, n_dirs_v=3, vmem_budget=None):
    """(fold B, scan row-block G, WTA presum flag, segment width) for a
    lane-folded batch, sized so every pass fits the VMEM budget.

    Mosaic constraint: 2-D block shapes need their second-to-last dim
    divisible by 8, so the row blocks stay at ``_ROW_BLOCK``; the knobs
    that remain are the fold factor and whether the WTA reads one
    pre-summed partial instead of two.  The budget is conservative:
    Mosaic double-buffers in/out blocks, the scratch carries and the full
    transposed secondary (horizontal passes) are resident.
    ``S2P_TPU_LANE_FOLD`` overrides the fold for probing."""
    import os
    # empirically measured on the v5e (probe_fold 2026-08-21): ~12 MiB of
    # accounted windows compiles, ~16 MiB crashes the remote compiler --
    # consistent with a 16 MiB VMEM arena minus runtime overheads
    budget = vmem_budget or int(os.environ.get('S2P_TPU_VMEM_BUDGET',
                                               12 * 2 ** 20))
    G = _ROW_BLOCK
    Wseg = W + D
    Wseg += (-Wseg) % G

    def fits(B):
        lanes_v = B * Wseg
        lanes_h = B * H
        # vertical scan: S out (dbl), votes out (dbl), sig1/sig2/p2 blocks
        # (dbl), carries, allowed
        v = lanes_v * (G * D * 8 + n_dirs_v * G * 8 + 3 * G * 8
                       + n_dirs_v * D * 4 + D * 4)
        # horizontal scan: 1 dir, full transposed secondary resident
        h = lanes_h * (G * D * 8 + G * 8 + 2 * G * 8 + D * 4 + D * 4) \
            + (Wseg + D) * lanes_h * 4
        # WTA with a single pre-summed partial window (dbl) + three maps
        w = lanes_v * (G * D * 8 + 3 * G * 8)
        return max(v, h, w) <= budget

    if H % G == 0 and Wseg % G == 0:
        # default 1 = fold OFF: measured on the v5e (probe_fold/probe_scan
        # 2026-08-21), the scan steps are WORK-bound, not bubble-bound --
        # folding B=2 gains only ~6% in-kernel and loses ~20% end-to-end
        # to the extra segment width and layout glue.  The infrastructure
        # stays for probing (and in case a leaner per-step kernel changes
        # the economics); PERF.md section 1 has the measurements.
        for B in (8, 6, 4, 3, 2):
            if fits(B):
                Bo = int(os.environ.get('S2P_TPU_LANE_FOLD', 1))
                Bo = min(Bo, B)
                presum = Bo * Wseg * (2 * G * D * 8 + 3 * G * 8) > budget
                return Bo, G, presum, Wseg
        Bo = int(os.environ.get('S2P_TPU_LANE_FOLD', 1))
        if Bo > 1:
            return Bo, G, True, Wseg
    return 1, G, False, Wseg


def fold_lanes_v(a_bt):
    """(B, H, Wseg) -> (H, B*Wseg): tiles side by side on the lane axis."""
    B, H, Wseg = a_bt.shape
    return jnp.transpose(a_bt, (1, 0, 2)).reshape(H, B * Wseg)


def unfold_lanes_v(a_f, B):
    """(H, B*Wseg) -> (B, H, Wseg)."""
    H, L = a_f.shape
    return jnp.transpose(a_f.reshape(H, B, L // B), (1, 0, 2))


def _fold_lanes_h(a_bt):
    """(B, H, Wseg) -> (Wseg, B*H): the horizontal passes' transposed
    layout, tiles side by side on THEIR lane axis (y)."""
    B, H, Wseg = a_bt.shape
    return jnp.transpose(a_bt, (2, 0, 1)).reshape(Wseg, B * H)


def flow_partials_folded(s1_bt, s2_bt, D: int, variant, p2=None,
                         allowed_bt=None, G=None, interpret=False,
                         emit_votes=True):
    """Aggregation partials for a lane-folded tile batch.

    Args:
        s1_bt: (B, H, Wseg) bit-annotated primary census signatures
            (_VALID_BIT set, _PAD_BIT over each tile's padding incl. the
            segment margin columns [w1, Wseg)).
        s2_bt: (B, H, Wseg) rebased secondary signatures (_VALID_BIT from
            the per-tile gather), equal segment width.
        allowed_bt: optional (B, D) int32 per-tile candidate masks.

    Returns ((H, D, B*Wseg) partials list, votes list of (H, B*Wseg)),
    bitwise equal per segment to the single-tile pass outputs.
    """
    from .mgm_flow import BIG
    from .sgm import _DIRS_8

    B, H, Wseg = s1_bt.shape
    G = G or _ROW_BLOCK
    nbits = variant.census_win ** 2 - 1
    assert nbits <= _VALID_BIT
    if p2 is None:
        p2_bt = jnp.full((B, H, Wseg), variant.p2, jnp.float32)
    else:
        p2_bt = jnp.broadcast_to(jnp.asarray(p2, jnp.float32),
                                 (B, H, Wseg))

    dirs = _DIRS_8[:max(2, min(variant.nb_dir, 8))]
    passes = {}
    for i, d in enumerate(dirs):
        key, (main, partner) = _PASS_OF_DIR[d]
        passes.setdefault(key, ([], []))
        passes[key][0].append(i)
        passes[key][1].append((main,))

    allowed_v = allowed_h = None
    if allowed_bt is not None:
        al = jnp.asarray(allowed_bt, jnp.int32)            # (B, D)
        allowed_v = jnp.broadcast_to(al.T[:, :, None], (D, B, Wseg)) \
            .reshape(D, B * Wseg)
        allowed_h = jnp.broadcast_to(al.T[:, :, None], (D, B, H)) \
            .reshape(D, B * H)

    s1v = s2v = p2v = None
    if 'vf' in passes or 'vb' in passes:
        s1v, s2v, p2v = (fold_lanes_v(a) for a in (s1_bt, s2_bt, p2_bt))
    s1h = s2h = p2h = None
    if 'hf' in passes or 'hb' in passes:
        s1h, p2h = _fold_lanes_h(s1_bt), _fold_lanes_h(p2_bt)
        # the per-step sublane window reads rows [x, x + D + G): pad the
        # scan axis so the last window exists (zero rows = invalid)
        s2h = jnp.pad(_fold_lanes_h(s2_bt), ((0, D), (0, 0)))

    run = functools.partial(_scan_pass_pallas, D=D, disp_min=0,
                            p1=variant.p1, invalid_cost=float(BIG),
                            nbits=nbits, interpret=interpret, row_block=G,
                            emit_votes=emit_votes)

    S_v = S_h = None
    votes = [None] * len(dirs)
    sub = float(len(dirs) - 1) if variant.overcount_fix else 0.0
    for key, (dir_idx, lats) in passes.items():
        kw = {}
        if sub:
            kw['sub_cost_mult'] = sub
            sub = 0.0
        # NOTE: no in-kernel accum chaining here -- the aliased input
        # window costs another G*D*8 bytes/lane of VMEM, which at fold
        # factors >= 2 exceeds the 16 MiB arena on production buckets
        # (measured: 16.17M request vs 16.00M limit); the folded path
        # keeps plain XLA adds between passes
        if key in ('vf', 'vb'):
            Sp, v = run(s1v, s2v, p2v, dirs=lats, reverse=(key == 'vb'),
                        horizontal=False, seg_w=Wseg,
                        sec_len=B * Wseg, allowed=allowed_v, **kw)
            S_v = Sp if S_v is None else S_v + Sp
            for j, i in enumerate(dir_idx):
                votes[i] = v[j] if v is not None else None
        else:
            Sp, v = run(s1h, s2h, p2h, dirs=lats, reverse=(key == 'hb'),
                        horizontal=True, seg_w=H,
                        sec_len=Wseg + D, allowed=allowed_h, **kw)
            S_h = Sp if S_h is None else S_h + Sp
            for j, i in enumerate(dir_idx):
                # (Wseg, B*H) -> (H, B*Wseg)
                votes[i] = jnp.transpose(
                    v[j].reshape(Wseg, B, H), (2, 1, 0)) \
                    .reshape(H, B * Wseg) if v is not None else None

    parts = []
    if S_v is not None:
        parts.append(S_v)
    if S_h is not None:
        # (Wseg, D, B*H) -> (H, D, B*Wseg)
        parts.append(jnp.transpose(S_h.reshape(Wseg, D, B, H),
                                   (3, 1, 2, 0)).reshape(H, D, B * Wseg))
    return parts, votes

