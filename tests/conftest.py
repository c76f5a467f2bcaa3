"""Test configuration: force CPU backend with 8 virtual devices so the
multi-chip sharding paths (mesh/pjit/psum) are exercised without TPU
hardware (SURVEY.md §4)."""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
xla_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
    yield
