"""Geospatial core: RPC cameras, CRS math, GeoTIFF / PLY IO."""

from . import crs, geoid, geotiff, ply, rpc, rpc_io  # noqa: F401
from .rpc import RPCModel, RpcParams  # noqa: F401
from .rpc_io import rpc_from_geotiff, rpc_from_rpc_file, load_rpc  # noqa: F401
from .crs import CRS  # noqa: F401
