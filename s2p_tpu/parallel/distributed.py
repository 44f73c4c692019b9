"""Multi-host execution: process initialization, tile partitioning, barriers.

The reference is single-host (SURVEY.md 2.4: a multiprocessing.Pool over
tiles, files as the only communication).  The TPU-native scale-out keeps
that share-nothing tile decomposition but spans hosts:

  * every process owns a contiguous block of the tile list
    (:func:`partition_tiles`) and runs the per-tile stages on it -- IO
    stays host-local (each host reads only the image windows of ITS
    tiles, the per-host IO plan of SURVEY.md section 5.8);
  * the two global reductions keep the reference's semantics across
    hosts: the global pointing fit and the height offsets are computed
    from the per-tile FILES after a barrier (a shared filesystem is the
    contract, exactly as the reference's out_dir is), or collectively via
    :func:`s2p_tpu.parallel.halo.distributed_pointing_fit` when the tile
    data is resident on the mesh;
  * stage boundaries are barriers (:func:`barrier`), matching the
    reference's pool.join() between steps;
  * the final mosaic runs on process 0 only.

Initialization uses ``jax.distributed`` (coordinator address + process
count via the standard JAX env vars or explicit arguments); on a single
process every helper degrades to the identity so the pipeline code is
identical either way.
"""

from __future__ import annotations

import os


def init(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed when configured; no-op otherwise.

    Reads S2P_TPU_COORDINATOR / S2P_TPU_NUM_PROCESSES / S2P_TPU_PROCESS_ID
    when arguments are omitted (JAX's own auto-detection covers TPU pod
    slices, where none of this is needed).
    """
    import jax

    coordinator_address = coordinator_address or \
        os.environ.get('S2P_TPU_COORDINATOR')
    num_processes = num_processes if num_processes is not None else \
        int(os.environ.get('S2P_TPU_NUM_PROCESSES', '0') or 0)
    process_id = process_id if process_id is not None else \
        int(os.environ.get('S2P_TPU_PROCESS_ID', '-1'))

    if coordinator_address and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return process_count(), process_index()


def process_count() -> int:
    import jax
    try:
        return jax.process_count()
    except RuntimeError:
        return 1


def process_index() -> int:
    import jax
    try:
        return jax.process_index()
    except RuntimeError:
        return 0


def partition_tiles(items, index=None, count=None):
    """The contiguous block of ``items`` owned by this process.

    Block partitioning keeps each host's tiles spatially adjacent, so its
    windowed image reads cover a compact region (per-host IO plan) and the
    DSM halo traffic between hosts is minimized.
    """
    count = count if count is not None else process_count()
    index = index if index is not None else process_index()
    n = len(items)
    lo = (n * index) // count
    hi = (n * (index + 1)) // count
    return items[lo:hi]


def barrier(name='stage'):
    """Cross-process synchronization point (stage boundary).

    Uses a tiny psum over all devices -- the canonical JAX multihost
    barrier; single-process it is a no-op.
    """
    if process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def is_primary() -> bool:
    return process_index() == 0
