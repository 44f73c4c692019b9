"""Census transform and cost-volume construction (JAX, jittable).

The matching cost of the reference's default matcher (mgm, invoked with
``-t census`` and CENSUS_NCC_WIN=5, cf. /root/reference/s2p/block_matching.py:
155-188) is the Hamming distance between census signatures over a 5x5
window.  Here the signature is bit-packed into uint32 lanes and the cost
volume is built by shifted XOR + popcount -- pure VPU work that XLA fuses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def census_transform(img, win: int = 5):
    """Bit-packed census signature of each pixel over a win x win window.

    Returns (signature uint32 array of shape (h, w, n_words), valid mask).
    Comparisons are 'neighbor < center' (ties give 0, matching the usual
    census convention); NaN pixels yield an invalid mask entry.
    """
    img = jnp.asarray(img, dtype=jnp.float32)
    h, w = img.shape
    r = win // 2
    nbits = win * win - 1
    n_words = (nbits + 31) // 32

    finite = jnp.isfinite(img)
    center = jnp.nan_to_num(img)
    pad = jnp.pad(center, r, constant_values=jnp.inf)     # inf: neighbor >= center
    pad_fin = jnp.pad(finite, r, constant_values=False)

    words = [jnp.zeros((h, w), dtype=jnp.uint32) for _ in range(n_words)]
    valid = finite
    bit = 0
    for dy in range(win):
        for dx in range(win):
            if dy == r and dx == r:
                continue
            nb = pad[dy:dy + h, dx:dx + w]
            words[bit // 32] = words[bit // 32] | (
                (nb < center).astype(jnp.uint32) << jnp.uint32(bit % 32))
            valid = valid & pad_fin[dy:dy + h, dx:dx + w]
            bit += 1
    sig = jnp.stack(words, axis=-1)
    return sig, valid


def census_cost_volume(im1, im2, disp_min: int, disp_max: int, win: int = 5,
                       invalid_cost: float = None):
    """Census cost volume C[y, x, k] = hamming(sig1[y, x], sig2[y, x + disp_min + k]).

    Args:
        im1, im2: rectified pair (same height; widths may differ).
        disp_min, disp_max: inclusive integer disparity bounds (static).
        win: census window size.
        invalid_cost: cost assigned where either signature is invalid
            (defaults to the maximum hamming distance, like mgm treats
            out-of-range samples).

    Returns:
        (cost (h, w, D) float32, valid1 (h, w) bool) with D = disp_max -
        disp_min + 1.
    """
    return census_cost_volume_dyn(im1, im2, disp_min,
                                  disp_max - disp_min + 1, win, invalid_cost)


def census_cost_volume_dyn(im1, im2, disp_min, D: int, win: int = 5,
                           invalid_cost: float = None):
    """Like :func:`census_cost_volume` but with a TRACED ``disp_min`` and a
    static candidate count ``D`` -- the form batched (vmapped) matching uses
    so tiles with different local disparity ranges share one program."""
    if invalid_cost is None:
        invalid_cost = float(win * win - 1)
    disp_min = jnp.asarray(disp_min, jnp.int32)

    sig1, val1 = census_transform(im1, win)
    sig2, val2 = census_transform(im2, win)
    h, w = sig1.shape[:2]
    w2 = sig2.shape[1]

    # gather shifted secondary signatures: x2 = x + disp_min + k
    xs = jnp.arange(w)[:, None] + disp_min + jnp.arange(D)[None, :]
    inb = (xs >= 0) & (xs < w2)
    xs_c = jnp.clip(xs, 0, w2 - 1)

    sig2_g = sig2[:, xs_c, :]                      # (h, w, D, n_words)
    val2_g = val2[:, xs_c] & inb[None, :, :]       # (h, w, D)

    xor = jnp.bitwise_xor(sig1[:, :, None, :], sig2_g)
    ham = jnp.sum(jax.lax.population_count(xor), axis=-1).astype(jnp.float32)

    ok = val1[:, :, None] & val2_g
    cost = jnp.where(ok, ham, jnp.asarray(invalid_cost, jnp.float32))
    return cost, val1 & jnp.any(ok, axis=-1)


def birchfield_tomasi_cost_volume(im1, im2, disp_min: int, disp_max: int,
                                  win: int = 3, invalid_cost: float = None,
                                  trunc: float = 63.0):
    """Birchfield-Tomasi sampling-insensitive cost volume, box-aggregated.

    The pixel cost of OpenCV's SGBM (reference matcher 'sgbm',
    block_matching.py:116-134; stereosgbm.cpp:115): the dissimilarity
    between im1(x) and the linearly-interpolated neighborhood of
    im2(x + d), symmetrized, truncated, then summed over a win x win block.

    Returns (cost (h, w, D) float32, valid (h, w) bool).
    """
    D = disp_max - disp_min + 1
    a = jnp.asarray(im1, jnp.float32)
    b = jnp.asarray(im2, jnp.float32)
    fin1 = jnp.isfinite(a)
    fin2 = jnp.isfinite(b)
    a0 = jnp.nan_to_num(a)
    b0 = jnp.nan_to_num(b)
    h, w = a0.shape
    w2 = b0.shape[1]

    def half_neighbors(img):
        left = jnp.concatenate([img[:, :1], img[:, :-1]], axis=1)
        right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
        lo = jnp.minimum(jnp.minimum(0.5 * (img + left), 0.5 * (img + right)), img)
        hi = jnp.maximum(jnp.maximum(0.5 * (img + left), 0.5 * (img + right)), img)
        return lo, hi

    lo2, hi2 = half_neighbors(b0)
    lo1, hi1 = half_neighbors(a0)

    xs = jnp.arange(w)[:, None] + jnp.arange(disp_min, disp_max + 1)[None, :]
    inb = (xs >= 0) & (xs < w2)
    xs_c = jnp.clip(xs, 0, w2 - 1)
    b_g = b0[:, xs_c]
    lo2_g = lo2[:, xs_c]
    hi2_g = hi2[:, xs_c]
    fin2_g = fin2[:, xs_c] & inb[None]

    d_fwd = jnp.maximum(jnp.maximum(a0[:, :, None] - hi2_g,
                                    lo2_g - a0[:, :, None]), 0.0)
    d_bwd = jnp.maximum(jnp.maximum(b_g - hi1[:, :, None],
                                    lo1[:, :, None] - b_g), 0.0)
    cost = jnp.minimum(jnp.minimum(d_fwd, d_bwd), trunc)

    ok = fin1[:, :, None] & fin2_g
    if invalid_cost is None:
        invalid_cost = trunc
    cost = jnp.where(ok, cost, jnp.asarray(invalid_cost, jnp.float32))

    # box aggregation over the matching block
    r = win // 2
    if r > 0:
        pad = jnp.pad(cost, ((r, r), (r, r), (0, 0)), mode='edge')
        acc = jnp.zeros_like(cost)
        for dy in range(win):
            for dx in range(win):
                acc = acc + pad[dy:dy + h, dx:dx + w]
        cost = acc / (win * win)
    return cost, fin1 & jnp.any(ok, axis=-1)
