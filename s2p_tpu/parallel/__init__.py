"""Multi-device execution: tile mesh, sharded stage steps, collectives."""

from .mesh import TileMesh, batch_tiles, sharded_matching_step  # noqa: F401
from .halo import sharded_dsm, distributed_pointing_fit  # noqa: F401
