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


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
    """Cap XLA-CPU RSS growth across the suite.

    Compiled executables and dispatch caches accumulate per process;
    on small (1-core/12 GB) hosts the xdist workers otherwise segfault
    near the end of a full run (observed twice at ~1h20m; the victim
    test passes in isolation). Module-scoped fixtures never outlive
    this teardown, so nothing is recompiled that was still needed."""
    yield
    import gc
    jax.clear_caches()
    gc.collect()
