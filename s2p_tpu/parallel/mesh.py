"""Tile data-parallelism over a ``jax.sharding.Mesh``.

The reference scales by mapping tiles to pool workers communicating through
the filesystem (SURVEY.md 2.4); the TPU-native equivalent maps batches of
equally-shaped tile pairs onto a device mesh:

  * tiles are bucketed by rectified shape and padded disparity range so one
    compiled program serves a whole bucket,
  * the batch axis is sharded over the ``tiles`` mesh axis; each device runs
    the census + SGM + triangulation step on its shard,
  * global reductions (mean height offsets, pointing least squares) ride the
    mesh as psums instead of driver-side gathers.

Bench runs use one chip; multi-chip correctness is exercised on a virtual
CPU mesh (tests + the driver's dryrun).
"""

from __future__ import annotations

import math

import numpy as np


class TileMesh:
    """A 1-D device mesh over which tile batches are sharded."""

    def __init__(self, devices=None, axis='tiles'):
        import jax
        from jax.sharding import Mesh

        self.devices = list(devices if devices is not None else jax.devices())
        self.axis = axis
        self.mesh = Mesh(np.array(self.devices), axis_names=(axis,))

    @property
    def n(self):
        return len(self.devices)

    def shard(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        return NamedSharding(self.mesh, P(self.axis))

    def replicated(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        return NamedSharding(self.mesh, P())


def batch_tiles(images, pad_shape=None, pad_value=np.nan, multiple=8):
    """Stack variable-shaped tile rasters into one padded batch.

    Args:
        images: list of 2D arrays.
        pad_shape: target (h, w); defaults to the max shape rounded up to
            ``multiple`` (shape bucketing keeps recompilation bounded).

    Returns:
        (batch (n, H, W) float32, shapes list of original (h, w)).
    """
    shapes = [im.shape for im in images]
    if pad_shape is None:
        H = max(s[0] for s in shapes)
        W = max(s[1] for s in shapes)
        H = int(math.ceil(H / multiple)) * multiple
        W = int(math.ceil(W / multiple)) * multiple
    else:
        H, W = pad_shape
    out = np.full((len(images), H, W), pad_value, dtype=np.float32)
    for k, im in enumerate(images):
        h, w = im.shape
        out[k, :h, :w] = im
    return out, shapes


def sharded_matching_step(mesh: TileMesh, im1_batch, im2_batch,
                          disp_min: int, disp_max: int, params=None):
    """Run the census+SGM matcher on a tile batch sharded over the mesh.

    Args:
        im1_batch, im2_batch: (n, H, W) arrays, n a multiple of mesh.n.

    Returns:
        dict of numpy outputs ('disp', 'valid', 'confidence'), one per tile.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.sgm import SgmParams, sgm_match

    params = params or SgmParams()
    shard = mesh.shard()

    @jax.jit
    def step(a, b):
        return jax.vmap(lambda x, y: sgm_match(x, y, disp_min, disp_max,
                                               params))(a, b)

    a = jax.device_put(jnp.asarray(im1_batch), shard)
    b = jax.device_put(jnp.asarray(im2_batch), shard)
    out = step(a, b)
    return {k: np.asarray(v) for k, v in out.items()}


def global_mean_height_allreduce(mesh: TileMesh, alt_batch):
    """psum-based global mean of per-tile altitude grids (the collective
    form of the reference's global_mean_heights, __init__.py:343-352)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def reduce_fn(alts):
        s = jnp.nansum(alts)
        n = jnp.sum(jnp.isfinite(alts))
        return s / jnp.maximum(n, 1)

    alts = jax.device_put(jnp.asarray(alt_batch), mesh.shard())
    return float(reduce_fn(alts))
