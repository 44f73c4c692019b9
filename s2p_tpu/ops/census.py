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
    D = disp_max - disp_min + 1
    if invalid_cost is None:
        invalid_cost = float(win * win - 1)

    sig1, val1 = census_transform(im1, win)
    sig2, val2 = census_transform(im2, win)
    h, w = sig1.shape[:2]
    w2 = sig2.shape[1]

    # gather shifted secondary signatures: x2 = x + disp_min + k
    xs = jnp.arange(w)[:, None] + jnp.arange(disp_min, disp_max + 1)[None, :]
    inb = (xs >= 0) & (xs < w2)
    xs_c = jnp.clip(xs, 0, w2 - 1)

    sig2_g = sig2[:, xs_c, :]                      # (h, w, D, n_words)
    val2_g = val2[:, xs_c] & inb[None, :, :]       # (h, w, D)

    xor = jnp.bitwise_xor(sig1[:, :, None, :], sig2_g)
    ham = jnp.sum(jax.lax.population_count(xor), axis=-1).astype(jnp.float32)

    ok = val1[:, :, None] & val2_g
    cost = jnp.where(ok, ham, jnp.asarray(invalid_cost, jnp.float32))
    return cost, val1 & jnp.any(ok, axis=-1)
