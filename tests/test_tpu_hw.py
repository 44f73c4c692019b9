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


_WORKER_FOLD = r"""
import json
import numpy as np
import jax
if jax.default_backend() not in ('tpu', 'axon'):
    print(json.dumps({'skip': jax.default_backend()}))
    raise SystemExit(0)
import os, sys
sys.path.insert(0, '/root/repo')
os.environ['S2P_TPU_LANE_FOLD'] = '2'
from s2p_tpu import device
device.configure()
import jax.numpy as jnp
from s2p_tpu.config import Config
from s2p_tpu.core.matching import mgm_variant_from_cfg
from s2p_tpu.ops.mgm_flow import mgm_binary_match_batch

variant = mgm_variant_from_cfg(Config(roi={'x': 0, 'y': 0, 'w': 1, 'h': 1}))
H, W, D = 448, 512, 80
rng = np.random.RandomState(0)
b1 = rng.rand(4, H, W).astype(np.float32) * 1000
b2 = np.roll(b1, 7, axis=2) + rng.rand(4, H, W).astype(np.float32)
ints = jnp.full((4,), 1, jnp.int32)
args = (jnp.asarray(b1), jnp.asarray(b2), jnp.full((4,), -40, jnp.int32), D,
        ints * (H - 3), ints * (W - 5), ints * (W - 5), ints * D)
folded = np.asarray(mgm_binary_match_batch(*args, variant)['disp'])
os.environ['S2P_TPU_LANE_FOLD'] = '1'
jax.clear_caches()
plain = np.asarray(mgm_binary_match_batch(*args, variant)['disp'])
ok = bool(np.array_equal(folded, plain, equal_nan=True))
print(json.dumps({'bitwise': ok}))
"""


@pytest.mark.tpu
def test_lane_folded_matcher_bitwise_on_tpu():
    """The lane-folded batch kernel (PERF.md lever-2 infrastructure,
    opt-in) == the per-tile batch, bitwise, at full tile size on the
    real chip."""
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    out = subprocess.run([sys.executable, '-c', _WORKER_FOLD], env=env,
                         capture_output=True, timeout=3000)
    line = out.stdout.decode().strip().splitlines()[-1]
    res = json.loads(line)
    if 'skip' in res:
        pytest.skip(f'no TPU backend (got {res["skip"]})')
    assert res['bitwise']


_WORKER_SIFT = r"""
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
from s2p_tpu.ops.sift import (_match_kernel_jit, _match_kernel_split_jit,
                              _pad_concat_jit)
from s2p_tpu.ops.sift_tpu import keypoints_from_arrays_tpu

rng = np.random.RandomState(3)
crops = [rng.rand(200, 240).astype(np.float32) * 800 for _ in range(2)]
ths = [0.0133, 0.0133]
offs = [(10, 20), (30, 5)]
full = keypoints_from_arrays_tpu(crops, ths, offs)
dev = keypoints_from_arrays_tpu(crops, ths, offs, device_desc=True)
ok = True
for rows, d in zip(full, dev):
    ok &= bool(np.array_equal(rows[:, :4], d['meta']))
    chunks = [np.asarray(c) for c in d['desc_chunks']]
    desc = (np.concatenate(chunks, axis=0)[:d['count']] if chunks
            else np.zeros((0, 128), np.float32))
    ok &= bool(np.array_equal(rows[:, 4:], desc))

# the split match kernel == the row-based kernel on the same inputs
k1, k2 = full
fc = np.asarray([0.0, 1.0, 0.0, -1.0, 0.5], np.float32)
N1 = -(-len(k1) // 2048) * 2048
N2 = -(-len(k2) // 2048) * 2048
k1p = np.zeros((N1, 132), np.float32); k1p[:len(k1)] = k1
k2p = np.zeros((N2, 132), np.float32); k2p[:len(k2)] = k2
a = np.asarray(_match_kernel_jit()(k1p, k2p, len(k1), len(k2), fc,
                                   np.float32(8.0)))
d1 = _pad_concat_jit(N1)(*dev[0]['desc_chunks'])
d2 = _pad_concat_jit(N2)(*dev[1]['desc_chunks'])
m1 = np.zeros((N1, 4), np.float32); m1[:len(k1)] = dev[0]['meta']
m2 = np.zeros((N2, 4), np.float32); m2[:len(k2)] = dev[1]['meta']
b = np.asarray(_match_kernel_split_jit()(m1, d1, m2, d2, len(k1), len(k2),
                                         fc, np.float32(8.0)))
ok &= bool(np.array_equal(a[:len(k1)], b[:len(k1)], equal_nan=True))
print(json.dumps({'bitwise': ok, 'n': [len(k1), len(k2)]}))
"""


@pytest.mark.tpu
def test_device_resident_sift_matching_bitwise_on_tpu():
    """The device-resident descriptor path (stage-1 round-5 refactor):
    meta+chunks reassemble to the full keypoint rows bitwise, and the
    split match kernel equals the row-based kernel on the real chip."""
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    out = subprocess.run([sys.executable, '-c', _WORKER_SIFT], env=env,
                         capture_output=True, timeout=3000)
    line = out.stdout.decode().strip().splitlines()[-1]
    res = json.loads(line)
    if 'skip' in res:
        pytest.skip(f'no TPU backend (got {res["skip"]})')
    assert res['bitwise']
