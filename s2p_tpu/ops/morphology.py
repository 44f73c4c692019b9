"""Morphological and connected-component raster ops.

TPU-native replacements for the imscript binaries the reference shells out
to (cf. SURVEY.md 2.3): ``morsi`` (disk erosion of masks, masking.py:87-97),
``morphoop`` (NaN-ignoring square min/max, common.py:251-262),
``remove_small_cc`` (small-component removal on height maps), and the
``cargarse_basura`` height-map despeckling pipeline.

Dense per-pixel ops are jittable jax window reductions; connected components
under a value-similarity edge predicate are solved exactly with a sparse
union-find (scipy.sparse.csgraph) on host -- the grids are per-tile sized.
"""

from __future__ import annotations

import numpy as np


def disk(radius: int):
    """Boolean disk structuring element of the given radius (morsi disk{r})."""
    r = int(radius)
    yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
    return (xx * xx + yy * yy) <= r * r


def binary_erosion(mask, radius):
    """Erode a boolean mask with a disk (reference masking.py:87-97: erosion
    is skipped for radius < 2)."""
    if radius < 2:
        return np.asarray(mask).astype(bool)
    from scipy import ndimage
    return ndimage.binary_erosion(np.asarray(mask).astype(bool),
                                  structure=disk(int(radius)))


def _nan_window_reduce(img, size, mode):
    """NaN-ignoring min/max over a size x size square (morphoop semantics:
    C fmin/fmax skip NaNs; all-NaN windows give +/-inf)."""
    import jax.numpy as jnp

    img = jnp.asarray(img, dtype=jnp.float32)
    big = jnp.asarray(jnp.inf if mode == 'min' else -jnp.inf, img.dtype)
    filled = jnp.where(jnp.isnan(img), big, img)
    r = size // 2
    pad = jnp.pad(filled, r, constant_values=big)
    acc = None
    for dy in range(size):
        for dx in range(size):
            win = pad[dy:dy + img.shape[0], dx:dx + img.shape[1]]
            if acc is None:
                acc = win
            elif mode == 'min':
                acc = jnp.minimum(acc, win)
            else:
                acc = jnp.maximum(acc, win)
    return acc


def morphoop(img, operation, size):
    """Square-window morphology on a float image (NaN = missing)."""
    import jax
    f = jax.jit(_nan_window_reduce, static_argnums=(1, 2))
    return np.asarray(f(img, size, operation))


def _similarity_components(img, valid, tol):
    """Exact connected components of ``valid`` pixels where 4-neighbors
    connect iff |img[p] - img[q]| <= tol.

    Returns (labels, sizes): labels is -1 outside ``valid``.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    h, w = img.shape
    idx = np.arange(h * w).reshape(h, w)

    rows = []
    cols = []
    # vertical edges
    ev = valid[:-1] & valid[1:] & (np.abs(img[:-1] - img[1:]) <= tol)
    rows.append(idx[:-1][ev])
    cols.append(idx[1:][ev])
    # horizontal edges
    eh = valid[:, :-1] & valid[:, 1:] & (np.abs(img[:, :-1] - img[:, 1:]) <= tol)
    rows.append(idx[:, :-1][eh])
    cols.append(idx[:, 1:][eh])

    r = np.concatenate(rows)
    c = np.concatenate(cols)
    g = coo_matrix((np.ones(len(r), dtype=np.int8), (r, c)), shape=(h * w, h * w))
    n, lab = connected_components(g, directed=False)
    lab = lab.reshape(h, w)
    # restrict to valid pixels; compute component sizes over valid only
    lab = np.where(valid, lab, -1)
    sizes = np.bincount(lab[valid], minlength=n)
    return lab, sizes


def remove_small_components(img, min_area=200, connect_tol=5.0):
    """NaN-out connected components smaller than min_area.

    Two finite 4-neighbors belong to the same component when their values
    differ by at most ``connect_tol`` (imscript remove_small_cc contract as
    invoked at reference common.py:261).
    """
    img = np.asarray(img, dtype=np.float32).copy()
    valid = np.isfinite(img)
    if not valid.any():
        return img
    lab, sizes = _similarity_components(np.nan_to_num(img), valid, connect_tol)
    small = sizes < min_area
    kill = valid & small[np.maximum(lab, 0)]
    img[kill] = np.nan
    return img


def despeckle_height_map(img, se=5, diff_thresh=5.0, min_area=200,
                         connect_tol=5.0):
    """Height-map cleanup: the ``cargarse_basura`` pipeline
    (reference common.py:251-262).

    1. NaN-out pixels where the local (se x se) max-min range exceeds
       ``diff_thresh`` meters,
    2. remove connected components smaller than ``min_area`` pixels.
    """
    img = np.asarray(img, dtype=np.float32)
    mx = morphoop(img, 'max', se)
    mn = morphoop(img, 'min', se)
    rng = np.abs(mx - mn)
    out = np.where(rng > diff_thresh, np.nan, img)
    return remove_small_components(out, min_area, connect_tol)


def remove_small_disparity_speckles(disp, valid, min_area=25, tol=1.0):
    """Speckle filter for disparity maps (mgm's REMOVESMALLCC stage):
    invalidate connected regions smaller than min_area, where pixels connect
    when |d1 - d2| <= tol."""
    disp = np.asarray(disp, dtype=np.float32)
    valid = np.asarray(valid).astype(bool)
    if not valid.any():
        return valid
    lab, sizes = _similarity_components(np.nan_to_num(disp), valid, tol)
    small = sizes < min_area
    return valid & ~small[np.maximum(lab, 0)]
