"""TPU-hardware-only regression tests (skipped on the CPU test mesh).

Run on the bench chip with:  JAX_PLATFORMS= python -m pytest tests/ -m tpu

The batched matcher's XLA mis-fusion workaround (ops/mgm_flow.py: an
optimization_barrier between the census cost producer and the aggregation
consumers; without it >=~350 px tiles compute a wrong first-side WTA on
TPU, measured 2026-08) is re-verified here at full tile size whenever the
XLA version moves.  conftest pins the suite to the CPU platform, so this
module spawns a SUBPROCESS with the default (TPU) platform.
"""

import json
import os
import subprocess
import sys

import pytest

_WORKER = r"""
import json
import numpy as np
import jax
if jax.default_backend() not in ('tpu', 'axon'):
    print(json.dumps({'skip': jax.default_backend()}))
    raise SystemExit(0)
import sys
sys.path.insert(0, '/root/repo')
from s2p_tpu import device
device.configure()
import jax.numpy as jnp
from s2p_tpu.config import Config
from s2p_tpu.core.matching import mgm_variant_from_cfg
from s2p_tpu.ops.mgm_flow import mgm_binary_match, mgm_binary_match_batch

variant = mgm_variant_from_cfg(Config(roi={'x': 0, 'y': 0, 'w': 1, 'h': 1}))
H, W, D = 448, 512, 80
rng = np.random.RandomState(0)
b1 = rng.rand(2, H, W).astype(np.float32) * 1000
b2 = np.roll(b1, 7, axis=2) + rng.rand(2, H, W).astype(np.float32)
ints = jnp.full((2,), 1, jnp.int32)
out_b = mgm_binary_match_batch(
    jnp.asarray(b1), jnp.asarray(b2), jnp.full((2,), -40, jnp.int32), D,
    ints * H, ints * W, ints * W, ints * D, variant)
disp_b = np.asarray(out_b['disp'])
ok = True
for k in range(2):
    d_s, _ = mgm_binary_match(b1[k], b2[k], -40, D - 41, variant)
    d_s = np.asarray(d_s)
    same = np.array_equal(np.nan_to_num(d_s), np.nan_to_num(disp_b[k])) \
        and np.array_equal(np.isnan(d_s), np.isnan(disp_b[k]))
    ok = ok and same
print(json.dumps({'bitwise': bool(ok)}))
"""


@pytest.mark.tpu
def test_batched_matcher_bitwise_on_tpu():
    """batched == single, bitwise, at full tile size on the real chip
    (guards the optimization_barrier workaround across XLA upgrades)."""
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    out = subprocess.run([sys.executable, '-c', _WORKER], env=env,
                         capture_output=True, timeout=3000)
    line = out.stdout.decode().strip().splitlines()[-1]
    res = json.loads(line)
    if 'skip' in res:
        pytest.skip(f'no TPU backend (got {res["skip"]})')
    assert res['bitwise']
