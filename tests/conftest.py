"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
exercised on host devices (same XLA partitioner code paths).  The axon
sitecustomize pins jax_platforms to the TPU tunnel, so the CPU override must
go through jax.config (env JAX_PLATFORMS is merged, not replaced).
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


def data_path(p):
    """Path into the reference test data (read-only mount)."""
    return os.path.join('/root/reference/tests/data', p)


@pytest.fixture
def ref_data():
    return data_path
