"""s2p_tpu: a TPU-native satellite stereo pipeline.

A from-scratch reimplementation of the capabilities of s2p (the Satellite
Stereo Pipeline, centreborelli/s2p) designed for JAX / XLA / Pallas on TPU:

  * geometry core (RPC cameras, epipolar rectification, triangulation) as
    batched, jittable array programs,
  * dense stereo matching (census / MGM-style semi-global aggregation) as
    Pallas TPU kernels,
  * tile-data-parallel orchestration over a ``jax.sharding.Mesh`` instead of
    a multiprocessing pool,
  * self-contained geo IO (GeoTIFF, PLY, UTM) with no GDAL/PROJ dependency.

The public API mirrors the reference pipeline entry points:
``s2p_tpu.main(user_cfg)``, stage functions, and ``read_config_file``.
"""

__version__ = '0.1.0'

from . import geo  # noqa: F401


def __getattr__(name):
    # Lazily expose the heavyweight pipeline modules so that importing
    # s2p_tpu.geo alone stays cheap (no jax import).
    if name in ('pipeline', 'config', 'tiling', 'core', 'ops', 'parallel'):
        import importlib
        return importlib.import_module(f'.{name}', __name__)
    if name in ('main', 'read_config_file'):
        from . import pipeline
        return getattr(pipeline, name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
