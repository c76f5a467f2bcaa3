"""Multi-process CPU cluster test for parallel/multihost.py: a real
2-process `jax.distributed` cluster (1 CPU device each), per-process
batch feeding via `jax.make_array_from_process_local_data`, a global
sharded reduction, and a metric-state psum across processes — the CPU
simulation of the multi-host pod path (SURVEY.md §2.8)."""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os
import sys

import numpy as np

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
sys.path.insert(0, REPO_PATH)

import jax
# the ambient env pins JAX_PLATFORMS=axon harder than env vars can
# override in plain subprocesses (CLAUDE.md): force via jax.config
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

from nicr_mtsa_tpu.parallel.multihost import (
    host_local_batch_to_global, initialize_multihost, is_coordinator,
    make_global_mesh, process_batch_slice,
)
from nicr_mtsa_tpu.parallel.mesh import batch_sharding, replicated
from nicr_mtsa_tpu.metrics.base import psum_state

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
initialize_multihost(coordinator_address=sys.argv[3],
                     num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert is_coordinator() == (pid == 0)

mesh = make_global_mesh()
assert mesh.devices.size == nproc

# the full dataset exists nowhere; each process loads only its rows
GLOBAL_B = 8
full = np.arange(GLOBAL_B * 4, dtype=np.float32).reshape(GLOBAL_B, 4)
rows = process_batch_slice(GLOBAL_B)
local = {'x': full[rows]}
gbatch = host_local_batch_to_global(local, mesh)
assert gbatch['x'].shape == (GLOBAL_B, 4)

# global reduction under GSPMD jit: must equal the unsharded sum
total = jax.jit(lambda b: jnp.sum(b['x'] * 2.0),
                in_shardings=(batch_sharding(mesh),),
                out_shardings=replicated(mesh))(gbatch)
expect = float(np.sum(full * 2.0))
assert abs(float(total) - expect) < 1e-3, (float(total), expect)

# metric-state reduction across processes: per-shard histogram +
# psum_state == global histogram (dist_reduce_fx='sum' across hosts)
from jax.sharding import PartitionSpec as P


def local_update(b):
    idx = (b['x'][:, 0].astype(jnp.int32)) % 5
    state = {'hist': jnp.zeros((5,), jnp.float32).at[idx].add(1.0)}
    return psum_state(state, 'data')


state = jax.jit(jax.shard_map(local_update, mesh=mesh,
                              in_specs=(P('data'),), out_specs=P()),
                in_shardings=(batch_sharding(mesh),),
                out_shardings=replicated(mesh))(gbatch)
ref = np.zeros(5, np.float32)
np.add.at(ref, full[:, 0].astype(np.int64) % 5, 1.0)
np.testing.assert_allclose(np.asarray(state['hist']), ref)

print(f'proc {pid} ok', flush=True)
"""


def test_two_process_cpu_cluster(tmp_path):
    port = _free_port()
    nproc = 2
    script = tmp_path / 'worker.py'
    script.write_text('REPO_PATH = %r\n' % REPO + _WORKER)

    procs = []
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'XLA_FLAGS')}
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(pid), str(nproc),
             f'127.0.0.1:{port}'],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=210)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    assert 'proc 0 ok' in outs[0]
    assert 'proc 1 ok' in outs[1]


def _free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port
