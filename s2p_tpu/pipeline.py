"""Pipeline orchestrator: images + RPCs in, point clouds + DSM out.

The 7-stage structure and the per-tile file contract of the reference
(/root/reference/s2p/__init__.py; SURVEY.md section 3) are kept intact --
they double as the checkpoint/resume mechanism (``--start_from``) -- while
every compute stage dispatches to the in-process JAX/TPU engines instead of
subprocess binaries:

    1 pointing_correction     per tile x pair   (SIFT + median translation)
    2 global_pointing         reduce            (affine fit over tiles)
    3 rectification_pair      per tile x pair   (device warp)
    4 stereo_matching         per tile x pair   (census + SGM on device)
    5 disparity_to_ply / heights path           (device triangulation)
    6 plys_to_dsm             per tile          (gaussian splatting)
    7 global_dsm              reduce            (mosaic)
"""

from __future__ import annotations

import contextlib
import functools
import json
import os
import sys
import time

import numpy as np

from . import runner, tiling
from .config import Config, ImageSpec, read_config_file  # noqa: F401 (API)
from .core import (fusion, masking, matching, pointing, rectification,
                   rpc_geom, triangulation)
from .geo import crs as crsmod
from .geo import geotiff, ply as plymod, rpc_io
from .ops import rasterize
from .ops.filtering import filter_xyz
from .ops.homography import image_apply_homography
from .ops.morphology import despeckle_height_map


# --------------------------------------------------------------------- #
# Image cache: full decoded rasters, keyed by path
# --------------------------------------------------------------------- #

@functools.lru_cache(maxsize=8)
def _image(path):
    return geotiff.read(path).astype(np.float32)


def clear_image_cache():
    _image.cache_clear()


def _remove(*paths):
    """Silent unlink of per-tile intermediates (reference common.py remove;
    deletion sites mirror reference __init__.py:97,161,192,235,312,383,427)."""
    for p in paths:
        try:
            os.remove(p)
        except OSError:
            pass


def linear_stretching_and_quantization_8bit(img, p=1):
    """Percentile-stretched uint8 quantization (reference common.py:284-297)."""
    a, b = np.nanpercentile(img, (p, 100 - p))
    return np.round(255 * (np.clip(img, a, b) - a) / max(b - a, 1e-9)) \
        .astype(np.uint8)


# --------------------------------------------------------------------- #
# Config building
# --------------------------------------------------------------------- #

def build_cfg(user_cfg: dict) -> Config:
    """Validate a user config and derive run parameters
    (reference initialization.py:39-146)."""
    d = dict(user_cfg)
    if 'images' not in d or len(d['images']) < 2:
        raise ValueError('missing paths to input images')

    images = []
    for img in d['images']:
        spec = img if isinstance(img, ImageSpec) else ImageSpec(
            **{k: img[k] for k in ('img', 'rpc', 'clr', 'cld', 'roi', 'wat')
               if k in img})
        for f in ('img', 'clr', 'cld', 'roi', 'wat'):
            v = getattr(spec, f)
            if v is not None and not os.path.isabs(v):
                setattr(spec, f, os.path.abspath(v))
        if spec.rpc is not None:
            spec.rpcm = rpc_io.load_rpc(spec.rpc)
        else:
            spec.rpcm = rpc_io.rpc_from_geotiff(spec.img)
        images.append(spec)
    d['images'] = tuple(images)

    # resolve the ROI
    if d.get('full_img'):
        prof = geotiff.read_profile(images[0].img)
        d['roi'] = {'x': 0, 'y': 0, 'w': prof.width, 'h': prof.height}
    elif 'roi' in d and all(k in d['roi'] for k in 'xywh'):
        pass
    elif 'roi_geojson' in d:
        ll_poly = read_lon_lat_poly_from_geojson(d['roi_geojson'])
        d['roi'] = rpc_geom.roi_process(
            images[0].rpcm, ll_poly, use_srtm=d.get('use_srtm', False),
            exogenous_dem=d.get('exogenous_dem'),
            exogenous_dem_geoid_mode=d.get('exogenous_dem_geoid_mode', True))
    else:
        raise ValueError('missing or incomplete roi definition')
    d['roi'] = {'x': int(np.floor(d['roi']['x'])),
                'y': int(np.floor(d['roi']['y'])),
                'w': int(np.ceil(d['roi']['w'])),
                'h': int(np.ceil(d['roi']['h']))}

    cfg = Config.from_user_dict(d)

    # output CRS: local UTM zone unless specified
    if cfg.out_crs is None:
        r = cfg.roi
        zone = rpc_geom.utm_zone(images[0].rpcm, r['x'], r['y'], r['w'], r['h'])
        epsg = crsmod.epsg_code_from_utm_zone(zone)
        out_crs = f'epsg:{epsg}'
        if cfg.out_geoid:
            out_crs += '+5773'
        cfg = cfg.replace(out_crs=out_crs)
    crsmod.CRS(cfg.out_crs)  # validate

    cfg = cfg.replace(gsd=rpc_geom.gsd_from_rpc(images[0].rpcm))
    return cfg


def read_lon_lat_poly_from_geojson(poly):
    """Parity: reference geographiclib.py:177-201 (no geojson dependency)."""
    if isinstance(poly, str):
        with open(poly) as f:
            a = json.load(f)
    else:
        a = poly
    if a['type'] == 'FeatureCollection':
        a = a['features'][0]
    if a['type'] == 'Feature':
        a = a['geometry']
    return np.asarray(a['coordinates'][0])


def _alt_kwargs(cfg: Config):
    return dict(exogenous_dem=cfg.exogenous_dem,
                exogenous_dem_geoid_mode=cfg.exogenous_dem_geoid_mode,
                use_srtm=cfg.use_srtm,
                rpc_alt_range_scale_factor=cfg.rpc_alt_range_scale_factor)


# --------------------------------------------------------------------- #
# Stage 1-2: pointing
# --------------------------------------------------------------------- #

def pointing_correction(cfg: Config, tile, i):
    """Stage 1 (reference __init__.py:49-82): per-tile pointing translation."""
    x, y, w, h = tile['coordinates']
    img1, img2 = cfg.images[0], cfg.images[i]
    method = 'relative' if cfg.relative_sift_match_thresh else 'absolute'
    A, m = pointing.compute_correction(
        _image(img1.img), _image(img2.img), img1.rpcm, img2.rpcm, x, y, w, h,
        method, cfg.sift_match_thresh, cfg.max_pointing_error,
        cfg.n_gcp_per_axis, **_alt_kwargs(cfg))
    _write_pointing_outputs(cfg, tile, i, A, m)


def _write_pointing_outputs(cfg: Config, tile, i, A, m):
    """Per-tile stage-1 file contract (reference __init__.py:49-82)."""
    out_dir = os.path.join(tile['dir'], f'pair_{i}')
    img1, img2 = cfg.images[0], cfg.images[i]
    x, y, w, h = tile['coordinates']
    if A is not None:
        np.savetxt(os.path.join(out_dir, 'pointing.txt'), A, fmt='%6.3f')
    if m is not None:
        np.savetxt(os.path.join(out_dir, 'sift_matches.txt'), m, fmt='%9.3f')
        np.savetxt(os.path.join(out_dir, 'center_keypts_sec.txt'),
                   np.mean(m[:, 2:], 0), fmt='%9.3f')
        if cfg.debug:
            from .core import visualisation
            visualisation.plot_matches(
                _image(img1.img), _image(img2.img), img1.rpcm, img2.rpcm, m,
                os.path.join(out_dir, 'sift_matches_pointing.png'),
                x, y, w, h)


def pointing_correction_all(cfg: Config, tiles_pairs, timeout=600,
                            nb_workers=None):
    """Stage 1 driven as a batched device flow: ALL tile pairs' SIFT
    detections run as one pipelined multi-crop wave and all match kernels
    dispatch before one fetch (:func:`s2p_tpu.ops.sift.matches_on_rpc_roi_batch`);
    the per-tile median-translation fit and file writes then fan out on
    threads.  Falls back to the threaded per-tile path off-device.
    Per-tile outputs equal the per-tile :func:`pointing_correction`."""
    from .ops import sift as sift_ops

    if not sift_ops._use_device_sift():
        runner.launch_calls(lambda t, i: pointing_correction(cfg, t, i),
                            tiles_pairs, nb_workers, timeout=timeout,
                            debug=cfg.debug)
        return

    method = 'relative' if cfg.relative_sift_match_thresh else 'absolute'
    jobs = []
    for tile, i in tiles_pairs:
        x, y, w, h = tile['coordinates']
        img1, img2 = cfg.images[0], cfg.images[i]
        jobs.append(dict(im1=_image(img1.img), im2=_image(img2.img),
                         rpc1=img1.rpcm, rpc2=img2.rpcm,
                         x=x, y=y, w=w, h=h, method=method,
                         sift_thresh=cfg.sift_match_thresh,
                         epipolar_threshold=cfg.max_pointing_error,
                         alt_kwargs=_alt_kwargs(cfg)))
    matches = sift_ops.matches_on_rpc_roi_batch(jobs)

    def finish(item, m):
        tile, i = item
        x, y, w, h = tile['coordinates']
        A = None
        if m is not None:
            A = pointing.local_translation(
                cfg.images[0].rpcm, cfg.images[i].rpcm, x, y, w, h, m,
                cfg.n_gcp_per_axis, **_alt_kwargs(cfg))
        _write_pointing_outputs(cfg, tile, i, A, m)

    runner.launch_calls(finish, list(zip(tiles_pairs, matches)),
                        nb_workers, tilewise=False, timeout=timeout)


def global_pointing_correction(cfg: Config, tiles):
    """Stage 2 (reference __init__.py:85-99): gather per-tile corrections."""
    for i in range(1, len(cfg.images)):
        corrections = []
        for t in tiles:
            d = os.path.join(t['dir'], f'pair_{i}')
            pf = os.path.join(d, 'pointing.txt')
            cf_ = os.path.join(d, 'center_keypts_sec.txt')
            if os.path.isfile(pf) and os.path.isfile(cf_):
                corrections.append((np.loadtxt(pf), np.loadtxt(cf_)))
        out = os.path.join(cfg.out_dir, f'global_pointing_pair_{i}.txt')
        np.savetxt(out, pointing.global_from_local(corrections), fmt='%12.6f')
        if cfg.clean_intermediate:
            for t in tiles:   # reference __init__.py:97-99
                _remove(os.path.join(t['dir'], f'pair_{i}',
                                     'center_keypts_sec.txt'))


# --------------------------------------------------------------------- #
# Stage 3: rectification
# --------------------------------------------------------------------- #

def _rectification_inputs(cfg: Config, tile, i):
    """Per-tile pointing + SIFT matches with the 8-neighbor halo
    (reference __init__.py:118-145)."""
    out_dir = os.path.join(tile['dir'], f'pair_{i}')
    x, y, w, h = tile['coordinates']
    pointing_file = os.path.join(cfg.out_dir, f'global_pointing_pair_{i}.txt')
    try:
        A = np.loadtxt(os.path.join(out_dir, 'pointing.txt'))
    except OSError:
        A = np.loadtxt(pointing_file)
    try:
        m = np.loadtxt(os.path.join(out_dir, 'sift_matches.txt'))
        if m.ndim == 1:
            m = m.reshape(-1, 4)
    except OSError:
        m = None

    # neighbor halo: matches inside an ellipse of semi-axes (3w/4, 3h/4)
    cur_dir = os.path.realpath(out_dir)
    for n in tile['neighborhood_dirs']:
        nei_dir = os.path.join(tile['dir'], n, f'pair_{i}')
        if not os.path.exists(nei_dir) or os.path.realpath(nei_dir) == cur_dir:
            continue
        try:
            m_n = np.loadtxt(os.path.join(nei_dir, 'sift_matches.txt'))
        except OSError:
            continue
        if m_n.ndim == 1:
            m_n = m_n.reshape(-1, 4)
        keep = np.linalg.norm(
            [(m_n[:, 0] - (x + w / 2)) / w,
             (m_n[:, 1] - (y + h / 2)) / h], axis=0) < 3 / 4
        m_n = m_n[keep]
        m = m_n if m is None else np.concatenate([m, m_n])
    return A, m


def rectification_pair(cfg: Config, tile, i):
    """Stage 3 (reference __init__.py:102-163): rectify a tile pair with the
    SIFT-match halo from the 8 neighboring tiles."""
    out_dir = os.path.join(tile['dir'], f'pair_{i}')
    x, y, w, h = tile['coordinates']
    img1, img2 = cfg.images[0], cfg.images[i]
    A, m = _rectification_inputs(cfg, tile, i)

    rect1, rect2, H1, H2, disp_min, disp_max = rectification.rectify_pair(
        cfg, _image(img1.img), _image(img2.img), img1.rpcm, img2.rpcm,
        x, y, w, h, A=A, sift_matches=m, method=cfg.rectification_method,
        hmargin=cfg.horizontal_margin, vmargin=cfg.vertical_margin)

    geotiff.write(os.path.join(out_dir, 'rectified_ref.tif'), rect1)
    geotiff.write(os.path.join(out_dir, 'rectified_sec.tif'), rect2)
    np.savetxt(os.path.join(out_dir, 'H_ref.txt'), H1, fmt='%12.6f')
    np.savetxt(os.path.join(out_dir, 'H_sec.txt'), H2, fmt='%12.6f')
    np.savetxt(os.path.join(out_dir, 'disp_min_max.txt'),
               [disp_min, disp_max], fmt='%3.1f')


def rectification_all(cfg: Config, tiles_pairs, timeout=600,
                      nb_workers=None):
    """Stage 3 driven as a batched device program.

    The per-tile geometry (homographies, disparity ranges) is host numpy
    and fans out on threads; the dense warps of ALL tiles then run as
    vmapped device programs grouped by (source image, output bucket)
    (:func:`s2p_tpu.ops.homography.warp_jobs_batched`) -- bitwise equal to
    the per-tile warps since the warp is pointwise in output pixels.  This
    replaces the reference's per-tile ``homography`` subprocess fan-out
    (parallel.py:58-110).
    """
    from .ops.homography import warp_jobs_batched

    def geometry(tile, i):
        out_dir = os.path.join(tile['dir'], f'pair_{i}')
        x, y, w, h = tile['coordinates']
        img1, img2 = cfg.images[0], cfg.images[i]
        A, m = _rectification_inputs(cfg, tile, i)
        H1, H2, disp_min, disp_max, out_w, out_h = \
            rectification.rectify_pair_geometry(
                cfg, img1.rpcm, img2.rpcm, x, y, w, h, A=A,
                sift_matches=m, method=cfg.rectification_method,
                hmargin=cfg.horizontal_margin, vmargin=cfg.vertical_margin)
        np.savetxt(os.path.join(out_dir, 'H_ref.txt'), H1, fmt='%12.6f')
        np.savetxt(os.path.join(out_dir, 'H_sec.txt'), H2, fmt='%12.6f')
        np.savetxt(os.path.join(out_dir, 'disp_min_max.txt'),
                   [disp_min, disp_max], fmt='%3.1f')
        return dict(out_dir=out_dir, img1=img1.img, img2=img2.img,
                    H1=H1, H2=H2, w=out_w, h=out_h)

    geoms = runner.launch_calls(geometry, tiles_pairs, nb_workers,
                                timeout=timeout, debug=cfg.debug)

    warp_jobs = []
    for g in geoms:
        warp_jobs.append((_image(g['img1']), g['H1'], g['w'], g['h']))
        warp_jobs.append((_image(g['img2']), g['H2'], g['w'], g['h']))
    rects = warp_jobs_batched(warp_jobs)

    def write(g, rect1, rect2):
        geotiff.write(os.path.join(g['out_dir'], 'rectified_ref.tif'), rect1)
        geotiff.write(os.path.join(g['out_dir'], 'rectified_sec.tif'), rect2)

    runner.launch_calls(write, [(g, rects[2 * k], rects[2 * k + 1])
                                for k, g in enumerate(geoms)],
                        nb_workers, tilewise=False, timeout=timeout)


# --------------------------------------------------------------------- #
# Stage 4: stereo matching
# --------------------------------------------------------------------- #

def stereo_matching(cfg: Config, tile, i):
    """Stage 4 (reference __init__.py:166-196): disparity of a tile pair."""
    out_dir = os.path.join(tile['dir'], f'pair_{i}')
    rect1 = geotiff.read(os.path.join(out_dir, 'rectified_ref.tif'))
    rect2 = geotiff.read(os.path.join(out_dir, 'rectified_sec.tif'))
    disp_min, disp_max = np.loadtxt(os.path.join(out_dir, 'disp_min_max.txt'))

    disp, mask, conf = matching.compute_disparity_map(
        cfg, rect1, rect2, disp_min, disp_max)

    if cfg.msk_erosion >= 2:
        mask = masking.erosion(mask.astype(bool), cfg.msk_erosion) \
            .astype(np.uint8)
        disp = np.where(mask, disp, np.nan).astype(np.float32)

    geotiff.write(os.path.join(out_dir, 'rectified_disp.tif'), disp,
                  nodata=float('nan'))
    geotiff.write_png(os.path.join(out_dir, 'rectified_mask.png'),
                      (mask * 255).astype(np.uint8))
    if conf is not None:
        geotiff.write(os.path.join(out_dir, 'rectified_disp_confidence.tif'),
                      np.asarray(conf, dtype=np.float32))
    if cfg.clean_intermediate:
        _clean_after_matching(cfg, out_dir)


def _clean_after_matching(cfg: Config, out_dir):
    """Reference __init__.py:192-196: the rectified secondary and the range
    file are dead after matching; the reference keeps rectified_ref.tif in
    pair mode (stage 5 reads it for the cloud colors)."""
    if len(cfg.images) > 2:
        _remove(os.path.join(out_dir, 'rectified_ref.tif'))
    _remove(os.path.join(out_dir, 'rectified_sec.tif'),
            os.path.join(out_dir, 'disp_min_max.txt'))


def stereo_matching_all(cfg: Config, tiles_pairs, timeout=600):
    """Stage 4 driven as the batched mesh engine.

    Tiles are bucketed by padded rectified shape and padded candidate
    count; each bucket runs as ONE vmapped device program
    (:func:`s2p_tpu.ops.sgm.sgm_match_batch`) with per-tile traced
    disparity bases, the batch axis sharded over the device mesh when more
    than one device is attached.  This replaces the reference's
    one-process-per-tile matcher fan-out (parallel.py:58-110) with a
    data-parallel array program; matchers other than the default census
    engine fall back to the per-tile path.
    """
    algo = cfg.matching_algorithm
    if algo not in ('mgm', 'mgm_multi'):
        # matcher-specific worker throttle (reference __init__.py:586-589:
        # matchers are memory-hungry, so their fan-out has its own knob);
        # default 1 because the per-tile engines already saturate the
        # accelerator and concurrent jit compilation through the TPU
        # tunnel is unreliable
        nb = cfg.max_processes_stereo_matching or 1
        runner.launch_calls(lambda t, i: stereo_matching(cfg, t, i),
                            tiles_pairs, nb, timeout=timeout,
                            debug=cfg.debug)
        return

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .ops.mgm_flow import MgmVariant, mgm_binary_match_batch, \
        mgm_multi_match_batch

    variant = matching.mgm_variant_from_cfg(cfg)
    if algo == 'mgm_multi':
        # the -S 6 cascade contract: no median, speckle filter applied to
        # the result (core/matching.py mgm_multi branch)
        variant = MgmVariant(**{**variant.__dict__, 'median_order': 'none'})
    jobs = []
    for tile, i in tiles_pairs:
        out_dir = os.path.join(tile['dir'], f'pair_{i}')
        rect1 = geotiff.read(os.path.join(out_dir, 'rectified_ref.tif')) \
            .astype(np.float32)
        rect2 = geotiff.read(os.path.join(out_dir, 'rectified_sec.tif')) \
            .astype(np.float32)
        dmin, dmax = np.loadtxt(os.path.join(out_dir, 'disp_min_max.txt'))
        dmin, dmax = matching.clamp_disparity_range(cfg, rect1.shape[1],
                                                    dmin, dmax)
        h, w = rect1.shape
        Hp = -(-h // 64) * 64
        Wp = -(-max(w, rect2.shape[1]) // 64) * 64
        Dp = -(-(dmax - dmin + 1) // 16) * 16
        jobs.append(dict(out_dir=out_dir, rect1=rect1, rect2=rect2,
                         dmin=int(dmin), dmax=int(dmax),
                         key=(Hp, Wp, Dp)))

    # each process matches ITS OWN tile partition: shard batches over the
    # process-LOCAL devices only (a global mesh would require every process
    # to feed identical data -- the multi-host contract here is share-
    # nothing tiles + files, SURVEY.md 2.4)
    n_dev = jax.local_device_count()
    buckets = {}
    for j in jobs:
        buckets.setdefault(j['key'], []).append(j)

    for (Hp, Wp, Dp), group in buckets.items():
        n = len(group)
        n_pad = -(-n // n_dev) * n_dev
        b1 = np.full((n_pad, Hp, Wp), np.nan, np.float32)
        b2 = np.full((n_pad, Hp, Wp), np.nan, np.float32)
        dmins = np.zeros(n_pad, np.int32)
        h_b = np.full(n_pad, Hp, np.int32)
        w1_b = np.full(n_pad, Wp, np.int32)
        w2_b = np.full(n_pad, Wp, np.int32)
        d_b = np.full(n_pad, Dp, np.int32)
        for k, j in enumerate(group):
            b1[k, :j['rect1'].shape[0], :j['rect1'].shape[1]] = j['rect1']
            b2[k, :j['rect2'].shape[0], :j['rect2'].shape[1]] = j['rect2']
            dmins[k] = j['dmin']
            h_b[k] = j['rect1'].shape[0]
            w1_b[k] = j['rect1'].shape[1]
            w2_b[k] = j['rect2'].shape[1]
            d_b[k] = j['dmax'] - j['dmin'] + 1
        if n_dev > 1:
            from .parallel.mesh import TileMesh
            shard = TileMesh(devices=jax.local_devices()).shard()
            b1 = jax.device_put(jnp.asarray(b1), shard)
            b2 = jax.device_put(jnp.asarray(b2), shard)
            s1 = NamedSharding(shard.mesh, P('tiles'))
            dmins, h_b, w1_b, w2_b, d_b = (
                jax.device_put(jnp.asarray(a), s1)
                for a in (dmins, h_b, w1_b, w2_b, d_b))
        else:
            b1, b2 = jnp.asarray(b1), jnp.asarray(b2)
        # per-tile traced extents keep each padded tile's output bitwise
        # equal to its unpadded run (ops/mgm_flow.py docstring)
        if algo == 'mgm_multi':
            out = mgm_multi_match_batch(b1, b2, dmins, int(Dp),
                                        h_b, w1_b, w2_b, d_b, variant)
        else:
            out = mgm_binary_match_batch(b1, b2, dmins, int(Dp),
                                         h_b, w1_b, w2_b, d_b, variant)
        disp_b = np.asarray(out['disp'])
        if 'confidence_u8' in out:
            # uint8 consensus counts -> the device's exact f32 division
            nv = max(2, min(variant.nb_dir, 8))
            conf_b = (np.asarray(out['confidence_u8']).astype(np.float32)
                      / np.float32(nv))
        else:
            conf_b = np.asarray(out['confidence'])
        for k, j in enumerate(group):
            h, w = j['rect1'].shape
            disp = disp_b[k, :h, :w]
            conf = conf_b[k, :h, :w]
            valid = np.isfinite(disp)
            if algo == 'mgm_multi' and cfg.stereo_speckle_filter:
                from .ops.morphology import remove_small_disparity_speckles
                valid = remove_small_disparity_speckles(
                    np.nan_to_num(disp), valid, cfg.stereo_speckle_filter,
                    tol=1.0)
                disp = np.where(valid, disp, np.nan)
            disp, mask = matching.finalize_disparity(
                disp, valid, j['rect1'], j['rect2'])
            if cfg.msk_erosion >= 2:
                # erosion is a cheap post-step of the batched path, never a
                # reason to fall back to the serial engine
                mask = masking.erosion(mask.astype(bool), cfg.msk_erosion) \
                    .astype(np.uint8)
                disp = np.where(mask, disp, np.nan).astype(np.float32)
            geotiff.write(os.path.join(j['out_dir'], 'rectified_disp.tif'),
                          disp, nodata=float('nan'))
            geotiff.write_png(os.path.join(j['out_dir'],
                                           'rectified_mask.png'),
                              (mask * 255).astype(np.uint8))
            geotiff.write(os.path.join(j['out_dir'],
                                       'rectified_disp_confidence.tif'),
                          conf.astype(np.float32))
            if cfg.clean_intermediate:
                _clean_after_matching(cfg, j['out_dir'])


# --------------------------------------------------------------------- #
# Stage 5: triangulation
# --------------------------------------------------------------------- #

def _tile_colors(cfg: Config, tile, shape_like):
    """Colors for the point cloud: clr image warped to the rectified frame,
    or the 8-bit stretched rectified reference (reference __init__.py:263-284).
    """
    out_dir = tile['dir']
    hh, ww = shape_like
    H_ref = np.loadtxt(os.path.join(out_dir, 'pair_1', 'H_ref.txt'))
    if cfg.images[0].clr:
        clr = _image(cfg.images[0].clr)    # (h, w) or (h, w, bands)
        bands = [clr] if clr.ndim == 2 else \
            [np.ascontiguousarray(clr[:, :, b]) for b in range(clr.shape[2])]
        from .ops.homography import image_apply_homographies
        warped = image_apply_homographies([(b, H_ref, ww, hh) for b in bands])
        # reference __init__.py:270-279: the warped clr is used RAW (no
        # 8-bit stretch) -- float colors in the PLY, like the reference's
        return np.nan_to_num(np.stack(warped)).astype(np.float32)
    img = geotiff.read(os.path.join(out_dir, 'pair_1', 'rectified_ref.tif'))
    return linear_stretching_and_quantization_8bit(img)[None]


def _ply_tile_job(cfg: Config, tile):
    """Host prep of one tile's triangulation inputs (stage 5, pair mode)."""
    out_dir = tile['dir']
    x, y, w, h = tile['coordinates']
    pdir = os.path.join(out_dir, 'pair_1')
    pointing_file = os.path.join(cfg.out_dir, 'global_pointing_pair_1.txt')
    extra = os.path.join(pdir, 'rectified_disp_confidence.tif')
    return dict(
        rpc1=cfg.images[0].rpcm, rpc2=cfg.images[1].rpcm,
        H1=np.loadtxt(os.path.join(pdir, 'H_ref.txt')),
        H2=np.loadtxt(os.path.join(pdir, 'H_sec.txt')),
        disp=geotiff.read(os.path.join(pdir, 'rectified_disp.tif')),
        mask_rect=geotiff.read_png(os.path.join(pdir, 'rectified_mask.png')),
        mask_orig=geotiff.read_png(os.path.join(out_dir, 'mask.png')),
        img_bbx=(x, x + w, y, y + h),
        A=np.loadtxt(pointing_file),
        confidence=geotiff.read(extra) if os.path.exists(extra) else None,
    )


def _ply_tile_finish(cfg: Config, tile, job, xyz, err, count=None):
    """Host post of one tile: 3D filter, colors, PLY write."""
    if cfg.filtering_3d_r and cfg.filtering_3d_n:
        filter_xyz(xyz, cfg.filtering_3d_r, cfg.filtering_3d_n, cfg.gsd,
                   count=count)
    colors = _tile_colors(cfg, tile, job['disp'].shape)
    proj_com = 'CRS {}'.format(cfg.out_crs)
    _write_tile_cloud(os.path.join(tile['dir'], 'cloud.ply'), xyz, colors,
                      proj_com, job['confidence'])
    if cfg.clean_intermediate:
        pdir = os.path.join(tile['dir'], 'pair_1')
        # reference __init__.py:312-318 (after the colors are computed)
        _remove(os.path.join(pdir, 'H_ref.txt'),
                os.path.join(pdir, 'H_sec.txt'),
                os.path.join(pdir, 'rectified_disp.tif'),
                os.path.join(pdir, 'rectified_mask.png'),
                os.path.join(pdir, 'rectified_ref.tif'),
                os.path.join(tile['dir'], 'mask.png'))


def disparity_to_ply(cfg: Config, tile):
    """Stage 5, pair mode (reference __init__.py:242-318)."""
    job = _ply_tile_job(cfg, tile)
    xyz, err = triangulation.disp_to_xyz(
        job['rpc1'], job['rpc2'], job['H1'], job['H2'], job['disp'],
        job['mask_rect'], img_bbx=job['img_bbx'],
        mask_orig=job['mask_orig'], A=job['A'],
        out_crs=crsmod.CRS(cfg.out_crs))
    _ply_tile_finish(cfg, tile, job, xyz, err)


def disparity_to_ply_all(cfg: Config, tiles, timeout=600,
                         nb_workers=None):
    """Stage 5 driven as the batched mesh engine: all tiles triangulate in
    one vmapped device program per shape bucket
    (:func:`s2p_tpu.core.triangulation.disp_to_xyz_batch`); the host-side
    finish (3D filter, colors, PLY) fans out on threads."""
    jobs = []
    for tile in tiles:
        try:
            jobs.append(_ply_tile_job(cfg, tile))
        except (OSError, ValueError):
            jobs.append(None)    # missing tile outputs tolerated (parity)
    live = [(t, j) for t, j in zip(tiles, jobs) if j is not None]
    if not live:
        return
    results = triangulation.disp_to_xyz_batch(
        [j for _, j in live], out_crs=crsmod.CRS(cfg.out_crs))
    counts = [None] * len(results)
    if cfg.filtering_3d_r and cfg.filtering_3d_n:
        # all tiles' neighbor counts in ONE vmapped dispatch (the per-tile
        # count was one device round trip per tile inside the finish)
        from .ops.filtering import count_3d_neighbors_batch
        p = int(np.ceil(cfg.filtering_3d_r / cfg.gsd))
        counts = count_3d_neighbors_batch([r[0] for r in results],
                                          cfg.filtering_3d_r, p)
    runner.launch_calls(
        lambda tj, res, cnt: _ply_tile_finish(cfg, tj[0], tj[1], res[0],
                                              res[1], count=cnt),
        list(zip(live, results, counts)), nb_workers, tilewise=False,
        timeout=timeout)


def _write_tile_cloud(path, xyz, colors, proj_com, confidence=None):
    """Flatten an xyz grid into a PLY cloud, dropping NaN points
    (reference triangulation.py:392-429)."""
    pts = xyz.reshape(-1, 3)
    valid = np.all(np.isfinite(pts), axis=1)
    col_list = None
    if colors is not None:
        col_list = colors.transpose(1, 2, 0).reshape(-1, colors.shape[0])[valid]
    extra = extra_names = None
    if confidence is not None:
        extra = confidence.reshape(-1)[valid].astype(np.float32)
        extra_names = ['confidence']
    plymod.write_ply(path, pts[valid], colors=col_list, extra=extra,
                     extra_names=extra_names,
                     comments=['created by S2P-TPU',
                               'projection: {}'.format(proj_com)])


def disparity_to_height(cfg: Config, tile, i):
    """Stage 5a, triplet mode (reference __init__.py:199-239)."""
    out_dir = os.path.join(tile['dir'], f'pair_{i}')
    x, y, w, h = tile['coordinates']
    rpc1, rpc2 = cfg.images[0].rpcm, cfg.images[i].rpcm
    H_ref = np.loadtxt(os.path.join(out_dir, 'H_ref.txt'))
    H_sec = np.loadtxt(os.path.join(out_dir, 'H_sec.txt'))
    disp = geotiff.read(os.path.join(out_dir, 'rectified_disp.tif'))
    mask_rect = geotiff.read_png(os.path.join(out_dir, 'rectified_mask.png'))
    mask_orig = geotiff.read_png(os.path.join(tile['dir'], 'mask.png'))
    pointing_file = os.path.join(cfg.out_dir, f'global_pointing_pair_{i}.txt')

    hmap = triangulation.height_map(x, y, w, h, rpc1, rpc2, H_ref, H_sec,
                                    disp, mask_rect, mask_orig,
                                    A=np.loadtxt(pointing_file))
    geotiff.write(os.path.join(out_dir, 'height_map.tif'),
                  hmap.astype(np.float32), nodata=float('nan'))
    if cfg.clean_intermediate:
        _clean_after_height_map(out_dir)


def _clean_after_height_map(out_dir):
    """Reference __init__.py:235-239."""
    _remove(os.path.join(out_dir, 'H_ref.txt'),
            os.path.join(out_dir, 'H_sec.txt'),
            os.path.join(out_dir, 'rectified_disp.tif'),
            os.path.join(out_dir, 'rectified_mask.png'))


def disparity_to_height_all(cfg: Config, tiles_pairs, timeout=600,
                            nb_workers=None):
    """Stage 5a driven as the batched mesh engine: every (tile, pair)
    triangulates in one vmapped device program per shape bucket
    (disp_to_xyz_batch), then the per-tile grid resample fans out on
    threads -- the triplet analogue of :func:`disparity_to_ply_all`."""
    jobs, live = [], []
    for tile, i in tiles_pairs:
        out_dir = os.path.join(tile['dir'], f'pair_{i}')
        x, y, w, h = tile['coordinates']
        try:
            job = triangulation.height_map_job(
                x, y, w, h, cfg.images[0].rpcm, cfg.images[i].rpcm,
                np.loadtxt(os.path.join(out_dir, 'H_ref.txt')),
                np.loadtxt(os.path.join(out_dir, 'H_sec.txt')),
                geotiff.read(os.path.join(out_dir, 'rectified_disp.tif')),
                geotiff.read_png(os.path.join(out_dir,
                                              'rectified_mask.png')),
                geotiff.read_png(os.path.join(tile['dir'], 'mask.png')),
                A=np.loadtxt(os.path.join(
                    cfg.out_dir, f'global_pointing_pair_{i}.txt')))
        except (OSError, ValueError):
            continue     # missing tile outputs tolerated (parity)
        jobs.append(job)
        live.append((tile, i))
    if not jobs:
        return
    results = triangulation.disp_to_xyz_batch(jobs, out_crs=None)

    def finish(item, res):
        (tile, i), job = item
        xyz, err = res
        x, y, w, h = tile['coordinates']
        hmap = triangulation.height_map_resample(xyz[:, :, 2], x, y, w, h,
                                                 job['H1'])
        geotiff.write(os.path.join(tile['dir'], f'pair_{i}',
                                   'height_map.tif'),
                      hmap.astype(np.float32), nodata=float('nan'))
        if cfg.clean_intermediate:
            _clean_after_height_map(os.path.join(tile['dir'], f'pair_{i}'))

    runner.launch_calls(finish, list(zip(zip(live, jobs), results)),
                        nb_workers, tilewise=False, timeout=timeout)


def mean_heights(cfg: Config, tile):
    """Stage 5b (reference __init__.py:321-340)."""
    w, h = tile['coordinates'][2:]
    n = len(cfg.images) - 1
    maps = np.full((h, w, n), np.nan)
    for i in range(n):
        p = os.path.join(tile['dir'], f'pair_{i + 1}', 'height_map.tif')
        if os.path.exists(p):
            maps[:, :, i] = geotiff.read(p)
    validity = maps.sum(axis=2)               # nan propagates
    validity += 1 - validity                  # 1 on valid, nan on invalid
    np.savetxt(os.path.join(tile['dir'], 'local_mean_heights.txt'),
               [np.nanmean(validity * maps[:, :, i]) for i in range(n)])


def global_mean_heights(cfg: Config, tiles):
    """Stage 5c (reference __init__.py:343-352)."""
    locals_ = [np.loadtxt(os.path.join(t['dir'], 'local_mean_heights.txt'))
               for t in tiles]
    g = np.nanmean(np.atleast_2d(locals_), axis=0)
    for i in range(len(cfg.images) - 1):
        np.savetxt(os.path.join(cfg.out_dir,
                                f'global_mean_height_pair_{i + 1}.txt'),
                   [np.atleast_1d(g)[i]])


def heights_fusion(cfg: Config, tile):
    """Stage 5d part 1 (reference __init__.py:355-385)."""
    tile_dir = tile['dir']
    n = len(cfg.images) - 1
    paths = [os.path.join(tile_dir, f'pair_{i + 1}', 'height_map.tif')
             for i in range(n)]
    maps = []
    for p in paths:
        hm = geotiff.read(p)
        if cfg.cargarse_basura:
            hm = despeckle_height_map(hm)
            geotiff.write(p, hm.astype(np.float32), nodata=float('nan'))
        maps.append(hm)
    offsets = [float(np.loadtxt(os.path.join(
        cfg.out_dir, f'global_mean_height_pair_{i + 1}.txt')))
        for i in range(n)]
    if cfg.debug:
        # debug artifact parity (reference fusion.py:50-52): save each
        # pair's height map registered to the common mean level
        mean_off = float(np.mean(offsets))
        for p, hm, off in zip(paths, maps, offsets):
            geotiff.write(p[:-len('.tif')] + '_registered.tif',
                          (hm - off + mean_off).astype(np.float32),
                          nodata=float('nan'))
    merged = fusion.merge_n_arrays(maps, offsets, cfg.fusion_operator,
                                   cfg.fusion_thresh)
    geotiff.write(os.path.join(tile_dir, 'height_map.tif'),
                  merged.astype(np.float32), nodata=float('nan'))
    if cfg.clean_intermediate:
        _remove(*paths)       # reference __init__.py:383-385


def _heights_tile_xyz(cfg: Config, tile):
    """Stage 5d per-tile host half: fusion + colors + localization."""
    heights_fusion(cfg, tile)
    out_dir = tile['dir']
    x, y, w, h = tile['coordinates']
    hmap = geotiff.read(os.path.join(out_dir, 'height_map.tif'))

    if cfg.images[0].clr:
        # reference __init__.py:404-406: the clr window is used raw
        colors = geotiff.read(cfg.images[0].clr, window=(x, y, w, h))
        colors = colors[None] if colors.ndim == 2 \
            else np.moveaxis(colors, 2, 0)
    else:
        img = _image(cfg.images[0].img)[y:y + h, x:x + w]
        colors = linear_stretching_and_quantization_8bit(img)[None]

    xyz = triangulation.height_map_to_xyz(hmap, cfg.images[0].rpcm, x, y,
                                          crsmod.CRS(cfg.out_crs))
    return xyz, colors


def _heights_tile_finish(cfg: Config, tile, xyz, colors, count=None):
    """Stage 5d per-tile tail: 3D filter, PLY write, cleanup."""
    out_dir = tile['dir']
    if cfg.filtering_3d_r and cfg.filtering_3d_n:
        filter_xyz(xyz, cfg.filtering_3d_r, cfg.filtering_3d_n, cfg.gsd,
                   count=count)
    _write_tile_cloud(os.path.join(out_dir, 'cloud.ply'), xyz, colors,
                      'CRS {}'.format(cfg.out_crs))
    if cfg.clean_intermediate:
        _remove(os.path.join(out_dir, 'height_map.tif'),   # ref :427-429
                os.path.join(out_dir, 'mask.png'))


def heights_to_ply(cfg: Config, tile):
    """Stage 5d part 2 (reference __init__.py:388-429)."""
    xyz, colors = _heights_tile_xyz(cfg, tile)
    _heights_tile_finish(cfg, tile, xyz, colors)


def heights_to_ply_all(cfg: Config, tiles, timeout=600, nb_workers=None):
    """Stage 5d with the neighbor counts of ALL tiles in one vmapped
    dispatch (the triplet analogue of disparity_to_ply_all's batch;
    per-tile results identical)."""
    if not tiles:
        return
    prepped = runner.launch_calls(
        lambda t: _heights_tile_xyz(cfg, t), tiles, nb_workers,
        timeout=timeout, debug=cfg.debug, warmup_first=True)
    counts = [None] * len(tiles)
    if cfg.filtering_3d_r and cfg.filtering_3d_n:
        from .ops.filtering import count_3d_neighbors_batch
        p = int(np.ceil(cfg.filtering_3d_r / cfg.gsd))
        counts = count_3d_neighbors_batch([x for x, _ in prepped],
                                          cfg.filtering_3d_r, p)
    runner.launch_calls(
        lambda t, xc, cnt: _heights_tile_finish(cfg, t, xc[0], xc[1],
                                                count=cnt),
        list(zip(tiles, prepped, counts)), nb_workers, tilewise=False,
        timeout=timeout)


# --------------------------------------------------------------------- #
# Stage 6-7: rasterization and mosaic
# --------------------------------------------------------------------- #

def plys_to_dsm(cfg: Config, tile):
    """Stage 6 (reference __init__.py:432-476): rasterize the tile cloud
    together with its 8 neighbors' clouds (the splat halo)."""
    out_dsm = os.path.join(tile['dir'], 'dsm.tif')
    out_conf = os.path.join(tile['dir'], 'confidence.tif')
    r = cfg.dsm_resolution

    own = os.path.join(tile['dir'], 'cloud.ply')
    if not os.path.exists(own):
        return
    points, _ = plymod.read_ply(own)
    if len(points) == 0:
        return
    xmin, ymin = points[:, 0].min(), points[:, 1].min()
    xmax, ymax = points[:, 0].max(), points[:, 1].max()
    xoff, yoff, xsize, ysize = rasterize.grid_from_roi(xmin, ymin, xmax, ymax, r)

    clouds = [os.path.join(tile['dir'], n, 'cloud.ply')
              for n in tile['neighborhood_dirs']]
    clouds = [c for c in clouds if os.path.exists(c)] or [own]
    raster, profile = rasterize.plyflatten_from_plyfiles_list(
        clouds, resolution=r, roi=(xoff, yoff, xsize, ysize),
        radius=cfg.dsm_radius, sigma=cfg.dsm_sigma)
    profile = profile.copy(crs=crsmod.CRS(cfg.out_crs))

    geotiff.write(out_dsm, raster[:, :, 0].astype(np.float32), profile=profile)
    if raster.shape[-1] == 5:
        geotiff.write(out_conf, raster[:, :, 4].astype(np.float32),
                      profile=profile)


def _merge_rasters(paths, out_path, res, bounds=None):
    """'first'-wins mosaic of georeferenced rasters onto a common grid
    (the rasterio.merge.merge call of reference __init__.py:510-525)."""
    profs = [geotiff.read_profile(p) for p in paths]
    if bounds is None:
        xs0 = [pr.transform[2] for pr in profs]
        ys1 = [pr.transform[5] for pr in profs]
        xs1 = [pr.transform[2] + pr.width * res for pr in profs]
        ys0 = [pr.transform[5] - pr.height * res for pr in profs]
        bounds = (min(xs0), min(ys0), max(xs1), max(ys1))
    left, bottom, right, top = bounds
    W = int(round((right - left) / res))
    H = int(round((top - bottom) / res))
    out = np.full((H, W), np.nan, dtype=np.float32)
    for p, pr in zip(paths, profs):
        arr = geotiff.read_with_nans(p)
        j0 = int(round((pr.transform[2] - left) / res))
        i0 = int(round((top - pr.transform[5]) / res))
        hh, ww = arr.shape
        i1 = min(i0 + hh, H)
        j1 = min(j0 + ww, W)
        ci0, cj0 = max(-i0, 0), max(-j0, 0)
        if i1 <= max(i0, 0) or j1 <= max(j0, 0):
            continue
        dst = out[max(i0, 0):i1, max(j0, 0):j1]
        src = arr[ci0:ci0 + dst.shape[0], cj0:cj0 + dst.shape[1]]
        np.copyto(dst, src, where=np.isnan(dst) & np.isfinite(src))
    geotiff.write(out_path, out,
                  crs=profs[0].crs,
                  transform=(res, 0.0, left, 0.0, -res, top),
                  nodata=float('nan'), compress='deflate', tiled=True)
    return out


def global_dsm(cfg: Config, tiles):
    """Stage 7 (reference __init__.py:479-525): global DSM + confidence."""
    bounds = None
    if cfg.roi_geojson is not None:
        ll_poly = read_lon_lat_poly_from_geojson(cfg.roi_geojson)
        out_crs = crsmod.CRS(cfg.out_crs)
        xs, ys = crsmod.transform(ll_poly[:, 0], ll_poly[:, 1], 4326, out_crs)
        a = cfg.dsm_resolution
        bounds = (a * np.floor(xs.min() / a), a * np.floor(ys.min() / a),
                  a * np.ceil(xs.max() / a), a * np.ceil(ys.max() / a))

    dsms = [os.path.join(t['dir'], 'dsm.tif') for t in tiles]
    dsms = [d for d in dsms if os.path.exists(d)]
    confs = [os.path.join(t['dir'], 'confidence.tif') for t in tiles]
    confs = [c for c in confs if os.path.exists(c)]
    if dsms:
        _merge_rasters(dsms, os.path.join(cfg.out_dir, 'dsm.tif'),
                       cfg.dsm_resolution, bounds)
    if confs:
        _merge_rasters(confs, os.path.join(cfg.out_dir, 'confidence.tif'),
                       cfg.dsm_resolution, bounds)


# --------------------------------------------------------------------- #
# Driver
# --------------------------------------------------------------------- #

@contextlib.contextmanager
def _stage(label):
    """Stage banner + elapsed-time print (reference common.py:265-281) and
    an optional jax.profiler trace per stage when S2P_TPU_PROFILE names a
    directory (the aux-subsystem parity of SURVEY.md section 5.1)."""
    print(label)
    prof_dir = os.environ.get('S2P_TPU_PROFILE')
    t0 = time.time()
    try:
        if prof_dir:
            import jax
            slug = ''.join(c if c.isalnum() else '_' for c in label.strip('. '))
            with jax.profiler.trace(os.path.join(prof_dir, slug)):
                yield
        else:
            yield
    finally:
        print('elapsed time: {:.3f} s'.format(time.time() - t0))


# first per-tile input file each resumable stage reads; resuming a stage
# whose inputs were swept by ``clean_intermediate`` must fail loudly, not
# recompute on garbage.  Only the TOTAL absence of the file across tiles
# errors -- individual missing tiles stay tolerated (failed tiles leave
# gaps that downstream stages skip, reference __init__.py:499-507).
_RESUME_NEEDS = {
    2: 'pointing.txt',
    3: 'pointing.txt',
    4: 'rectified_sec.tif',
    5: 'rectified_disp.tif',
}


def _check_resume_inputs(start_from, tiles_pairs):
    fname = _RESUME_NEEDS.get(start_from)
    if fname is None or not tiles_pairs:
        return
    if not any(os.path.exists(os.path.join(t['dir'], f'pair_{i}', fname))
               for t, i in tiles_pairs):
        raise RuntimeError(
            f'start_from={start_from} resumes a stage that reads per-tile '
            f'{fname!r}, but no tile has it: the intermediate files were '
            f'deleted (clean_intermediate trades resumability for disk, '
            f'reference config.py:24) or the earlier stages never ran. '
            f'Re-run from an earlier stage.')


def main(user_cfg, start_from=0):
    """Run the full pipeline (reference __init__.py:528-646)."""
    from . import device
    device.configure()
    device.warm_transfer_async()   # overlap the tunnel's first-fetch setup
    from .parallel import distributed as dist
    dist.init()     # no-op unless a multi-process run is configured
    cfg = build_cfg(user_cfg)
    from .ops import sift as sift_ops
    sift_ops.set_device_mode(cfg.sift_device)

    # initialization writes (out_dir tree, config snapshot, per-tile masks
    # and jsons, tiles.txt) happen ONCE, on the primary; the other
    # processes wait at the barrier and reload the tile list from
    # tiles.txt -- concurrent identical writes to a shared filesystem are
    # not atomic and must not race
    nb_workers = cfg.max_processes or min(8, os.cpu_count() or 1)
    tw, th = tiling.adjust_tile_size(cfg)
    tiles_txt = os.path.join(cfg.out_dir, 'tiles.txt')
    if dist.is_primary():
        os.makedirs(cfg.out_dir, exist_ok=True)
        cfg.dump_json(os.path.join(cfg.out_dir, 'config.json'))
        tiles = tiling.tiles_full_info(cfg, tw, th, tiles_txt,
                                       create_masks=True,
                                       runner=runner.PoolRunner(nb_workers,
                                                                cfg.timeout))
        if not tiles:
            raise RuntimeError(
                'the ROI is not seen in two images or is totally masked')
        if start_from > 0:
            assert os.path.exists(tiles_txt), (
                f'start_from set to {start_from} but tiles.txt not found in '
                f'{cfg.out_dir!r}')
        else:
            with open(tiles_txt, 'w') as f:
                for t in tiles:
                    print(t['json'], file=f)
    dist.barrier('initialization')
    if not dist.is_primary():
        tiles = tiling.tiles_full_info(cfg, tw, th, tiles_txt,
                                       create_masks=False)
        if not tiles:
            raise RuntimeError(
                'the ROI is not seen in two images or is totally masked')

    n = len(cfg.images)
    tiles_pairs = [(t, i) for i in range(1, n) for t in tiles]
    timeout = cfg.timeout

    # multi-host: each process owns a contiguous block of the tile list
    # (host-local IO); stage boundaries are barriers; global reductions and
    # the mosaic run on process 0 against the shared out_dir (the same
    # file contract the reference uses between pool workers)
    from .parallel import distributed as dist
    my_tiles = dist.partition_tiles(tiles)
    my_tiles_pairs = [(t, i) for i in range(1, n) for t in my_tiles]

    if start_from > 0:
        _check_resume_inputs(start_from, my_tiles_pairs)

    if start_from <= 1:
        with _stage('1) correcting pointing locally...'):
            pointing_correction_all(cfg, my_tiles_pairs, timeout=timeout,
                                    nb_workers=nb_workers)
        dist.barrier('pointing')
    if start_from <= 2:
        with _stage('2) correcting pointing globally...'):
            if dist.is_primary():
                global_pointing_correction(cfg, tiles)
        dist.barrier('global_pointing')
    # device-heavy stages run serially: the accelerator stream is the
    # bottleneck and concurrent jit compilation through the TPU tunnel is
    # unreliable; host-heavy stages (pointing, rasterization) stay threaded
    if start_from <= 3:
        with _stage('3) rectifying tiles...'):
            rectification_all(cfg, my_tiles_pairs, timeout=timeout,
                              nb_workers=nb_workers)
        dist.barrier('rectification')
        if cfg.clean_intermediate:
            # reference __init__.py:161-163 deletes per tile DURING the
            # stage, racing the neighbor-halo reads of concurrent tiles
            # (and, multi-process, of other processes' boundary tiles);
            # sweeping after the BARRIER keeps the halo deterministic
            # with the same post-stage file set
            for t, i in my_tiles_pairs:
                d = os.path.join(t['dir'], f'pair_{i}')
                _remove(os.path.join(d, 'pointing.txt'),
                        os.path.join(d, 'sift_matches.txt'))
    if start_from <= 4:
        with _stage('4) running stereo matching...'):
            stereo_matching_all(cfg, my_tiles_pairs, timeout=cfg.mgm_timeout)
        dist.barrier('matching')
    if start_from <= 5:
        if n > 2:
            with _stage('5) height maps, offsets, fusion, point clouds...'):
                disparity_to_height_all(cfg, my_tiles_pairs,
                                        timeout=timeout,
                                        nb_workers=nb_workers)
                print('5b) computing local pairwise height offsets...')
                runner.launch_calls(lambda t: mean_heights(cfg, t), my_tiles,
                                    nb_workers, timeout=timeout,
                                    debug=cfg.debug)
                dist.barrier('mean_heights')
                print('5c) computing global pairwise height offsets...')
                if dist.is_primary():
                    global_mean_heights(cfg, tiles)
                dist.barrier('global_mean_heights')
                print('5d) merging height maps and computing point clouds...')
                heights_to_ply_all(cfg, my_tiles, timeout=timeout,
                                   nb_workers=nb_workers)
        else:
            with _stage('5) triangulating tiles...'):
                disparity_to_ply_all(cfg, my_tiles, timeout=timeout,
                                     nb_workers=nb_workers)
        dist.barrier('clouds')
    if start_from <= 6:
        with _stage('6) computing DSM by tile...'):
            runner.launch_calls(lambda t: plys_to_dsm(cfg, t), my_tiles,
                                nb_workers, timeout=timeout, debug=cfg.debug)
        dist.barrier('tile_dsm')
    if start_from <= 7:
        with _stage('7) computing global DSM...'):
            if dist.is_primary():
                global_dsm(cfg, tiles)
        dist.barrier('global_dsm')

    clear_image_cache()
    return cfg
