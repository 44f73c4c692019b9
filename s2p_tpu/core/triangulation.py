"""Disparity-to-3D triangulation on device.

The TPU-native replacement of the reference's C kernel ``disp_to_h.so``
(/root/reference/c/disp_to_h.c + c/rpc.c): the per-pixel chain

    rectified pixel --H1^-1--> full-image pixel --+disparity, H2^-1-->
    secondary pixel --two-ray altitude solve--> (lon, lat, alt) + error

is expressed as a single jitted array program over the whole disparity map
(vmapped Newton/secant solvers from :mod:`s2p_tpu.geo.rpc`), instead of a
scalar C loop.  Float32 is sufficient on device because all pixel
coordinates are re-centered to the tile origin before the solve and the RPC
math runs in normalized space; the CRS conversion to the output UTM frame
runs host-side in float64.
"""

from __future__ import annotations

import functools

import numpy as np

from ..geo import crs as crsmod
from ..geo.rpc import (RpcParams, localize_jax, triangulate_height_jax)


def _recenter_params(params: RpcParams, dx, dy, lon0=0.0, lat0=0.0,
                     dtype=np.float32) -> RpcParams:
    """Shift the image-space offsets (and optionally the geographic offsets)
    so every on-device value is small.

    Pixel recentering keeps coordinates O(1e3) on large satellite frames;
    the geographic anchor (lon0, lat0) is subtracted from the lon/lat
    offsets in float64 so that the lon/lat values flowing between the
    localization and projection stages of the two-ray solve stay O(0.1)
    degree -- a raw float32 longitude (~55 deg) is quantized to a ~0.4 m
    ground grid, which was measured to bias altitudes by ~0.3 m.
    The recovered anchor must be added back host-side.
    """
    p = params.astype(np.float64)
    p = p._replace(col_offset=p.col_offset - dx, row_offset=p.row_offset - dy,
                   lon_offset=p.lon_offset - lon0,
                   lat_offset=p.lat_offset - lat0)
    return p.astype(dtype)


@functools.lru_cache(maxsize=1)
def _triangulate_grid_jit():
    import jax
    return jax.jit(_triangulate_grid_impl)


def _triangulate_grid(*args):
    return _triangulate_grid_jit()(*args)


@functools.lru_cache(maxsize=2)
def _triangulate_grid_batch_jit(has_dy=True):
    import jax
    if has_dy:
        return jax.jit(jax.vmap(_triangulate_grid_impl))

    # s2p disparities are horizontal: skip uploading a full zeros dy
    # field per tile (~1 MB through the tunnel) and build it on device
    def impl(dx, *rest):
        import jax.numpy as jnp
        return _triangulate_grid_impl(dx, jnp.zeros_like(dx), *rest)
    return jax.jit(jax.vmap(impl))


def _triangulate_grid_impl(disp_x, disp_y, valid, h1_inv, h2_inv,
                           rpc1: RpcParams, rpc2: RpcParams,
                           mask_orig, mask_hw, spans):
    """Jitted core: rectified disparities -> (lon, lat, alt, err, valid).

    Args:
        disp_x, disp_y: (h, w) disparity components (rectified frame).
        valid: (h, w) bool mask of pixels to triangulate.
        h1_inv, h2_inv: 3x3 inverse rectifying homographies mapping rectified
            coords to (re-centered) full-image coords.
        rpc1, rpc2: re-centered RPC params (same frame as h*_inv outputs).
        mask_orig: padded original-domain validity raster (uint8).
        mask_hw: (2,) f32 true (unpadded) mask dims (hh, ww).
        spans: (2,) f32 (col_span, row_span) of the tile bbox.

    Returns:
        lon, lat, alt, err, valid_out.  The original-domain inside/mask
        tests of the reference's C kernel (disp_to_h.c:108-123) run HERE
        so the px/py fields never cross the device->host link (they are
        2 of 6 otherwise-fetched full-tile f32 fields; the link is the
        stage-5 bottleneck, PERF.md section 5).
    """
    import jax.numpy as jnp

    h, w = disp_x.shape
    dt = disp_x.dtype
    rows, cols = jnp.mgrid[0:h, 0:w]
    cols = cols.astype(dt)
    rows = rows.astype(dt)

    def apply_h(m, x, y):
        z = m[2, 0] * x + m[2, 1] * y + m[2, 2]
        return ((m[0, 0] * x + m[0, 1] * y + m[0, 2]) / z,
                (m[1, 0] * x + m[1, 1] * y + m[1, 2]) / z)

    px, py = apply_h(h1_inv, cols, rows)
    qx, qy = apply_h(h2_inv, cols + disp_x, rows + disp_y)

    alt, err = triangulate_height_jax(rpc1, rpc2, px, py, qx, qy)
    lon, lat = localize_jax(rpc1, px, py, alt)

    # original-domain tests (host _post_triangulation parity, bit-exact:
    # same f32 round/clip/compare chain the host ran on the fetched px/py)
    hh, ww = mask_hw[0], mask_hw[1]
    rpx = jnp.round(px)
    rpy = jnp.round(py)
    inside = (rpx >= 0) & (rpx <= spans[0]) & (rpy >= 0) & (rpy <= spans[1])
    mh, mw = mask_orig.shape
    ix = jnp.clip(rpx, 0, ww - 1).astype(jnp.int32)
    iy = jnp.clip(rpy, 0, hh - 1).astype(jnp.int32)
    ix = jnp.clip(ix, 0, mw - 1)
    iy = jnp.clip(iy, 0, mh - 1)
    mask_ok = jnp.where((rpx < ww) & (rpy < hh),
                        mask_orig[iy, ix] != 0, True)
    valid = valid & inside & mask_ok

    nan = jnp.asarray(jnp.nan, dt)
    lon = jnp.where(valid, lon, nan)
    lat = jnp.where(valid, lat, nan)
    alt = jnp.where(valid, alt, nan)
    err = jnp.where(valid, err, nan)
    return lon, lat, alt, err, valid


def disp_to_xyz(rpc1, rpc2, H1, H2, disp, mask_rect, img_bbx, mask_orig,
                A=None, out_crs=None, disp_y=None):
    """Triangulate a rectified disparity map into a 3D coordinate grid.

    Mirrors the reference API (triangulation.py:85-162 driving
    disp_to_h.c:70-140): returns (xyz, err) where xyz has shape (h, w, 3) in
    ``out_crs`` (or lon/lat/alt when None) and err is the two-ray
    reprojection distance in pixels.

    Args:
        rpc1, rpc2: RPCModel cameras.
        H1, H2: rectifying homographies (full-image frame).
        disp: (h, w) horizontal disparity map (NaN = invalid).
        mask_rect: (h, w) rectified-domain validity mask.
        img_bbx: (col_min, col_max, row_min, row_max) in the full image.
        mask_orig: original-domain validity mask covering the bbx area.
        A: optional pointing correction applied to image 2.
        out_crs: CRS for the output coordinates.
    """
    import jax.numpy as jnp

    dev, meta = _prep_triangulation(rpc1, rpc2, H1, H2, disp, mask_rect,
                                    img_bbx, mask_orig, A, disp_y)
    dy = dev['dy']
    outs = _triangulate_grid(
        jnp.asarray(dev['dx']),
        jnp.zeros_like(jnp.asarray(dev['dx'])) if dy is None
        else jnp.asarray(dy),
        jnp.asarray(dev['valid']), jnp.asarray(dev['h1_inv']),
        jnp.asarray(dev['h2_inv']), _to_jax(dev['rpc1']), _to_jax(dev['rpc2']),
        jnp.asarray(dev['mask_orig']), jnp.asarray(dev['mask_hw']),
        jnp.asarray(dev['spans']))
    return _post_triangulation(outs, meta, out_crs)


def _prep_triangulation(rpc1, rpc2, H1, H2, disp, mask_rect, img_bbx,
                        mask_orig, A=None, disp_y=None, pad_multiple=64):
    """Host prep of one tile: recenter + pad; returns (device inputs dict
    of f32 numpy arrays, meta dict for :func:`_post_triangulation`)."""
    disp = np.asarray(disp, dtype=np.float32)
    h, w = disp.shape
    if A is not None:  # fold the pointing correction into H2 (reference :119)
        H2 = np.asarray(H2, dtype=np.float64) @ np.linalg.inv(np.asarray(A))

    col_min, col_max, row_min, row_max = [float(v) for v in img_bbx]

    # recenter everything at the bbx origin for f32 safety
    T = np.array([[1, 0, -col_min], [0, 1, -row_min], [0, 0, 1]], dtype=np.float64)
    h1_inv = np.linalg.inv(np.asarray(H1, dtype=np.float64))
    h2_inv = np.linalg.inv(np.asarray(H2, dtype=np.float64))
    lon0, lat0 = rpc1.lon_offset, rpc1.lat_offset
    rpc1_rc = _recenter_params(rpc1.params(), col_min, row_min, lon0, lat0)
    rpc2_rc = _recenter_params(rpc2.params(), col_min, row_min, lon0, lat0)

    dx = disp
    dy = None if disp_y is None else np.asarray(disp_y, np.float32)
    base_valid = np.isfinite(dx) & (np.asarray(mask_rect) != 0)

    # bucket the grid shape (multiples of 64) so tiles share compiled
    # programs; the pad region is masked invalid and cropped off below
    Hp = -(-h // pad_multiple) * pad_multiple
    Wp = -(-w // pad_multiple) * pad_multiple

    def padf(a, fill=0.0):
        out = np.full((Hp, Wp), fill, dtype=np.float32)
        out[:h, :w] = a
        return out

    vpad = np.zeros((Hp, Wp), dtype=bool)
    vpad[:h, :w] = base_valid

    mask_orig = np.asarray(mask_orig)
    mh, mw = mask_orig.shape
    Mh = -(-mh // pad_multiple) * pad_multiple
    Mw = -(-mw // pad_multiple) * pad_multiple
    mpad = np.zeros((Mh, Mw), dtype=np.uint8)
    mpad[:mh, :mw] = (mask_orig != 0)

    dev = dict(dx=padf(np.nan_to_num(dx)),
               dy=None if dy is None else padf(np.nan_to_num(dy)),
               valid=vpad, h1_inv=(T @ h1_inv).astype(np.float32),
               h2_inv=(T @ h2_inv).astype(np.float32),
               rpc1=rpc1_rc.astype(np.float32), rpc2=rpc2_rc.astype(np.float32),
               mask_orig=mpad,
               mask_hw=np.array([mh, mw], dtype=np.float32),
               spans=np.array([col_max - col_min, row_max - row_min],
                              dtype=np.float32))
    meta = dict(h=h, w=w, lon0=lon0, lat0=lat0)
    return dev, meta


def _post_triangulation(outs, meta, out_crs):
    """Host post of one tile: crop, denormalize, the f64 CRS conversion
    (the original-domain tests of disp_to_h.c:108-123 ran on device)."""
    lon, lat, alt, err, valid = outs
    h, w = meta['h'], meta['w']
    lon = np.array(lon, dtype=np.float64)[:h, :w] + meta['lon0']
    lat = np.array(lat, dtype=np.float64)[:h, :w] + meta['lat0']
    alt = np.array(alt, dtype=np.float64)[:h, :w]
    err = np.array(err, dtype=np.float32)[:h, :w]
    valid = np.asarray(valid)[:h, :w]

    lon[~valid] = np.nan
    lat[~valid] = np.nan
    alt[~valid] = np.nan
    err[~valid] = np.nan

    # CRS conversion (host, f64)
    if out_crs is not None and crsmod.CRS(out_crs) != crsmod.CRS(4979):
        x, y, z = crsmod.transform(lon.ravel(), lat.ravel(), 4979,
                                   out_crs, alt.ravel())
        xyz = np.stack([x.reshape(h, w), y.reshape(h, w), z.reshape(h, w)], axis=-1)
    else:
        xyz = np.stack([lon, lat, alt], axis=-1)
    return xyz, err


def disp_to_xyz_batch(jobs, out_crs=None):
    """Batched tile triangulation: ONE vmapped device program per shape
    bucket, the tile axis sharded over the device mesh when several devices
    are attached (the mesh execution engine's stage-5 kernel).

    Args:
        jobs: list of dicts with keys (rpc1, rpc2, H1, H2, disp, mask_rect,
            img_bbx, mask_orig) and optional (A, disp_y).

    Returns:
        list of (xyz, err) in input order.
    """
    import jax
    import jax.numpy as jnp

    preps = [
        _prep_triangulation(j['rpc1'], j['rpc2'], j['H1'], j['H2'],
                            j['disp'], j['mask_rect'], j['img_bbx'],
                            j['mask_orig'], j.get('A'), j.get('disp_y'))
        for j in jobs
    ]
    results = [None] * len(jobs)
    buckets = {}
    for idx, (dev, meta) in enumerate(preps):
        key = (dev['dx'].shape, dev['mask_orig'].shape,
               dev['dy'] is not None)
        buckets.setdefault(key, []).append(idx)

    # per-process batches shard over LOCAL devices only (each process
    # triangulates its own tile partition in a multi-host run)
    n_dev = jax.local_device_count()
    for (_, _, has_dy), idxs in buckets.items():
        n = len(idxs)
        n_pad = -(-n // n_dev) * n_dev
        pad_ids = idxs + [idxs[-1]] * (n_pad - n)

        def stack(key):
            arrs = [preps[i][0][key] for i in pad_ids]
            if key in ('rpc1', 'rpc2'):
                return RpcParams(*[jnp.stack([np.asarray(getattr(a, f))
                                              for a in arrs])
                                   for f in RpcParams._fields])
            return jnp.stack(arrs)

        args = ((stack('dx'),) + ((stack('dy'),) if has_dy else ())
                + (stack('valid'),
                   stack('h1_inv'), stack('h2_inv'), stack('rpc1'),
                   stack('rpc2'), stack('mask_orig'), stack('mask_hw'),
                   stack('spans')))
        if n_dev > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import TileMesh
            mesh = TileMesh(devices=jax.local_devices())
            sh = NamedSharding(mesh.mesh, P(mesh.axis))
            args = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sh), args)
        outs = _triangulate_grid_batch_jit(has_dy)(*args)
        for o in outs:     # overlap the tunnel fetches of all outputs
            try:
                o.copy_to_host_async()
            except AttributeError:
                pass
        # fetch each FULL output once (reusing the async copies above) and
        # slice on the host: per-tile device slices (o[k]) would be new
        # device arrays, each paying its own tunnel round trip -- B x 5
        # fetches instead of 5 (the round-4 stage-5 fetch floor)
        host_outs = [np.asarray(o) for o in outs]
        for k, idx in enumerate(idxs):
            tile_outs = tuple(ho[k] for ho in host_outs)
            results[idx] = _post_triangulation(
                tile_outs, preps[idx][1], out_crs)
    return results


def _to_jax(params: RpcParams):
    import jax.numpy as jnp
    return RpcParams(*[jnp.asarray(f) for f in params])


def stereo_corresp_to_xyz(rpc1, rpc2, pts1, pts2, out_crs=None):
    """Triangulate explicit keypoint correspondences (reference :220-275)."""
    import jax.numpy as jnp

    pts1 = np.asarray(pts1, dtype=np.float64)
    pts2 = np.asarray(pts2, dtype=np.float64)
    cx = pts1[:, 0].mean()
    cy = pts1[:, 1].mean()
    lon0, lat0 = rpc1.lon_offset, rpc1.lat_offset
    r1 = _recenter_params(rpc1.params(), cx, cy, lon0, lat0)
    r2 = _recenter_params(rpc2.params(), cx, cy, lon0, lat0)
    xa = jnp.asarray(pts1[:, 0] - cx, dtype=jnp.float32)
    ya = jnp.asarray(pts1[:, 1] - cy, dtype=jnp.float32)
    xb = jnp.asarray(pts2[:, 0] - cx, dtype=jnp.float32)
    yb = jnp.asarray(pts2[:, 1] - cy, dtype=jnp.float32)
    alt, err = triangulate_height_jax(_to_jax(r1), _to_jax(r2), xa, ya, xb, yb)
    lon, lat = localize_jax(_to_jax(r1), xa, ya, alt)
    lon = np.asarray(lon, dtype=np.float64) + lon0
    lat = np.asarray(lat, dtype=np.float64) + lat0
    alt = np.asarray(alt, dtype=np.float64)
    if out_crs is not None and crsmod.CRS(out_crs) != crsmod.CRS(4979):
        x, y, z = crsmod.transform(lon, lat, 4979, out_crs, alt)
        return np.column_stack([x, y, z]), np.asarray(err)
    return np.column_stack([lon, lat, alt]), np.asarray(err)


def height_map_to_xyz(heights, rpc, off_x=0, off_y=0, out_crs=None):
    """Localize a height map sampled on the original image grid
    (reference triangulation.py:165-217)."""
    h_map = np.asarray(heights, dtype=np.float64)
    h, w = h_map.shape
    rows, cols = np.mgrid[0:h, 0:w]
    lon = np.full_like(h_map, np.nan)
    lat = np.full_like(h_map, np.nan)
    m = np.isfinite(h_map)
    if m.any():
        lo, la = rpc.localization(cols[m] + off_x, rows[m] + off_y, h_map[m])
        lon[m] = lo
        lat[m] = la
    if out_crs is not None and crsmod.CRS(out_crs) != crsmod.CRS(4979):
        x, y, z = crsmod.transform(lon.ravel(), lat.ravel(), 4979,
                                   out_crs, h_map.ravel())
        return np.stack([x.reshape(h, w), y.reshape(h, w), z.reshape(h, w)], -1)
    return np.stack([lon, lat, h_map], axis=-1)


def height_map_resample(hmap, x, y, w, h, H1):
    """Resample a rectified-frame altitude grid onto the original reference
    image grid (the host half of :func:`height_map`)."""
    from scipy import ndimage

    T = np.array([[1, 0, x], [0, 1, y], [0, 0, 1]], dtype=np.float64)
    H = np.asarray(H1, dtype=np.float64) @ T
    out = ndimage.affine_transform(np.nan_to_num(hmap).T, H,
                                   output_shape=(w, h), order=1).T
    if np.isnan(hmap).any():
        i = ndimage.affine_transform(np.isnan(hmap).T, H,
                                     output_shape=(w, h), order=0).T
        i = ndimage.binary_dilation(i, structure=np.ones((3, 3)))
        out[i] = np.nan
    return out


def height_map_job(x, y, w, h, rpc1, rpc2, H1, H2, disp, mask, mask_orig,
                   A=None):
    """The disp_to_xyz job dict of one height-map tile (shared by the
    serial and batched stage-5a drivers); p=1 padding avoids border
    effects in the resample."""
    p = 1
    return dict(rpc1=rpc1, rpc2=rpc2, H1=H1, H2=H2, disp=disp,
                mask_rect=mask,
                img_bbx=(x - p, x + w + 2 * p, y - p, y + h + 2 * p),
                mask_orig=np.pad(np.asarray(mask_orig), p,
                                 constant_values=1),
                A=A)


def height_map(x, y, w, h, rpc1, rpc2, H1, H2, disp, mask, mask_orig, A=None):
    """Altitude map resampled onto the original reference image grid
    (reference triangulation.py:346-389)."""
    j = height_map_job(x, y, w, h, rpc1, rpc2, H1, H2, disp, mask,
                       mask_orig, A)
    xyz, err = disp_to_xyz(j['rpc1'], j['rpc2'], j['H1'], j['H2'],
                           j['disp'], j['mask_rect'], img_bbx=j['img_bbx'],
                           mask_orig=j['mask_orig'], A=j['A'], out_crs=None)
    return height_map_resample(xyz[:, :, 2], x, y, w, h, H1)
