"""Tile validity masks from vector (GML) and raster sources.

Parity: /root/reference/s2p/masking.py, with the ``cldmask`` polygon
rasterizer replaced by an in-process rasterization (PIL polygon fill) and
``morsi`` erosion by :func:`s2p_tpu.ops.morphology.binary_erosion`.
"""

from __future__ import annotations

import re

import numpy as np

from ..geo import geotiff
from ..ops.morphology import binary_erosion


def read_gml_polygons(path):
    """Extract polygons (lists of (x, y) image coordinates) from a GML file.

    Handles the Pleiades/DIMAP mask flavour: coordinate lists appear in
    <gml:posList> or <gml:coordinates> elements.
    """
    with open(path, 'r', errors='replace') as f:
        text = f.read()
    polys = []
    for m in re.finditer(r'<gml:posList[^>]*>(.*?)</gml:posList>', text, re.S):
        vals = [float(v) for v in m.group(1).split()]
        pts = list(zip(vals[0::2], vals[1::2]))
        if len(pts) >= 3:
            polys.append(pts)
    for m in re.finditer(r'<gml:coordinates[^>]*>(.*?)</gml:coordinates>', text, re.S):
        pts = []
        for pair in m.group(1).replace('\n', ' ').split():
            xy = pair.split(',')
            if len(xy) >= 2:
                pts.append((float(xy[0]), float(xy[1])))
        if len(pts) >= 3:
            polys.append(pts)
    return polys


def rasterize_polygons(polys, w, h, offset=(0, 0)):
    """Burn polygons into a (h, w) boolean mask (True inside).

    Replaces the ``cldmask`` binary (reference masking.py:44-64), whose
    homography argument is a pure crop translation in the pipeline.
    """
    from PIL import Image, ImageDraw

    img = Image.new('1', (int(w), int(h)), 0)
    draw = ImageDraw.Draw(img)
    ox, oy = offset
    for pts in polys:
        draw.polygon([(x - ox, y - oy) for x, y in pts], fill=1)
    return np.array(img, dtype=bool)


def image_tile_mask(x, y, w, h, roi_gml=None, cld_gml=None, raster_mask=None,
                    img_shape=None, border_margin=10):
    """Validity mask of a tile: ROI polygons AND NOT clouds AND raster mask
    AND image-border margin.  Parity: reference masking.py:18-84.
    """
    x, y, w, h = map(int, (x, y, w, h))
    mask = np.ones((h, w), dtype=bool)

    if roi_gml is not None:
        polys = read_gml_polygons(roi_gml)
        mask &= rasterize_polygons(polys, w, h, offset=(x, y))
        if not mask.any():
            return mask

    if cld_gml is not None:
        polys = read_gml_polygons(cld_gml)
        mask &= ~rasterize_polygons(polys, w, h, offset=(x, y))
        if not mask.any():
            return mask

    if raster_mask is not None:
        arr = geotiff.read(raster_mask, window=(x, y, w, h), boundless=True,
                           fill_value=0) if raster_mask.endswith(('.tif', '.tiff')) \
            else _read_any_window(raster_mask, x, y, w, h)
        mask &= np.asarray(arr).astype(bool)
        if not mask.any():
            return mask

    if img_shape is not None:
        hh, ww = img_shape
        b = border_margin
        rows = np.arange(y, y + h)
        cols = np.arange(x, x + w)
        inside_r = (rows >= b) & (rows < hh - b)
        inside_c = (cols >= b) & (cols < ww - b)
        mask &= inside_r[:, None] & inside_c[None, :]
    return mask


def _read_any_window(path, x, y, w, h):
    from PIL import Image
    arr = np.array(Image.open(path))
    out = np.zeros((h, w), dtype=arr.dtype)
    y0, y1 = max(y, 0), min(y + h, arr.shape[0])
    x0, x1 = max(x, 0), min(x + w, arr.shape[1])
    if y0 < y1 and x0 < x1:
        out[y0 - y:y1 - y, x0 - x:x1 - x] = arr[y0:y1, x0:x1]
    return out


def erosion(mask, radius):
    """Disk erosion of a boolean mask (reference masking.py:87-97)."""
    return binary_erosion(mask, radius)
