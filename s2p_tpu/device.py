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
