"""Post-processing tools: mosaics, tile maps, exporters, rescaling."""

from . import exporters, mosaic, scale, tilemap  # noqa: F401
