"""Device/runtime configuration helpers.

Central place for JAX runtime knobs:
  * persistent compilation cache (remote TPU compiles are expensive --
    minutes through the axon tunnel -- and the pipeline reuses a small set
    of bucketed shapes across runs),
  * platform overrides for tests/benches.
"""

from __future__ import annotations

import os

_configured = False


def configure(cache_dir=None):
    """Enable the persistent compilation cache (idempotent)."""
    global _configured
    if _configured:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        'S2P_TPU_JAX_CACHE',
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     '.jax_cache'))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    _configured = True


def warm_transfer_async():
    """Start the process's FIRST device->host transfer in the background.

    Through the axon tunnel the first d2h fetch of a process pays a large
    fixed connection-setup cost (measured 2026-08: ~0.2-340 s depending on
    tunnel health, INDEPENDENT of transfer size -- a 4-byte fetch costs the
    same as 2 MB; all later fetches run at full bandwidth).  Paying it on a
    daemon thread while the driver does host-side initialization takes it
    off the first stage's critical path.  The computation itself runs on
    the caller's thread (no concurrent compile); only the fetch is
    backgrounded.
    """
    import threading

    try:
        import jax.numpy as jnp
        y = (jnp.zeros((1,), jnp.float32) + 1)
        y.block_until_ready()
    except Exception:
        return

    def fetch():
        try:
            import numpy as np
            np.asarray(y)
        except Exception:
            pass

    threading.Thread(target=fetch, daemon=True,
                     name='s2p-tpu-d2h-warmup').start()
