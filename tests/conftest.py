"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths (mesh/pjit/psum) are exercised without TPU
hardware (SURVEY.md §4).

Note: this environment force-registers a TPU PJRT plugin in every
interpreter and exports JAX_PLATFORMS=axon, so we must override the
platform via jax.config (env vars alone are not sufficient)."""
import os

xla_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8'
    ).strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
    yield
