"""Debug visualisations (parity: /root/reference/s2p/visualisation.py).

Draws SIFT matches over the two crops side by side using PIL (the reference
composes crops via gdal_translate + plot_matches_low_level).
"""

from __future__ import annotations

import numpy as np

from ..core import rpc_geom


def plot_matches_low_level(crop1, crop2, matches, outfile):
    """Render two uint8 crops side by side with match segments."""
    from PIL import Image, ImageDraw

    h = max(crop1.shape[0], crop2.shape[0])
    w1 = crop1.shape[1]
    canvas = np.zeros((h, w1 + crop2.shape[1], 3), dtype=np.uint8)
    canvas[:crop1.shape[0], :w1] = crop1[..., None]
    canvas[:crop2.shape[0], w1:] = crop2[..., None]
    img = Image.fromarray(canvas)
    draw = ImageDraw.Draw(img)
    colors = [(255, 0, 0), (0, 255, 0), (0, 128, 255), (255, 255, 0),
              (255, 0, 255)]
    for k, (x1, y1, x2, y2) in enumerate(np.asarray(matches)):
        c = colors[k % len(colors)]
        draw.line([(x1, y1), (x2 + w1, y2)], fill=c, width=1)
        draw.ellipse([x1 - 2, y1 - 2, x1 + 2, y1 + 2], outline=c)
        draw.ellipse([x2 + w1 - 2, y2 - 2, x2 + w1 + 2, y2 + 2], outline=c)
    img.save(outfile)


def plot_matches(im1, im2, rpc1, rpc2, matches, outfile, x, y, w, h):
    """Plot matches of an ROI pair (reference visualisation.py:108-146).

    Args:
        im1, im2: full image arrays.
        matches: (n, 4) in full-image coordinates.
    """
    from ..pipeline import linear_stretching_and_quantization_8bit

    if matches is None or len(matches) == 0:
        return
    x2, y2, w2, h2 = map(int, rpc_geom.corresponding_roi(rpc1, rpc2, x, y, w, h))
    crop1 = linear_stretching_and_quantization_8bit(
        np.asarray(im1)[y:y + h, x:x + w])
    ys0, xs0 = max(y2, 0), max(x2, 0)
    crop2 = linear_stretching_and_quantization_8bit(
        np.asarray(im2)[ys0:y2 + h2, xs0:x2 + w2])
    m = np.asarray(matches, dtype=np.float64).copy()
    m[:, 0] -= x
    m[:, 1] -= y
    m[:, 2] -= xs0
    m[:, 3] -= ys0
    plot_matches_low_level(crop1, crop2, m, outfile)
