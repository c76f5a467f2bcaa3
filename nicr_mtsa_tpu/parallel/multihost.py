"""Multi-host (multi-process) SPMD entry points.

The reference stops at single-process DDP delegation (SURVEY.md §2.8);
on TPU pods every host drives its local chips and participates in ONE
global SPMD program, so the framework needs three pieces beyond the
single-controller path in `mesh.py`/`train.py`:

1. process bring-up: `initialize_multihost` wraps
   `jax.distributed.initialize` (coordinator discovery is automatic on
   Cloud TPU; explicit on CPU test clusters),
2. data feeding: each process loads only its own batch slice;
   `host_local_batch_to_global` assembles the global sharded array
   from per-process shards via `jax.make_array_from_process_local_data`
   -- no host ever materializes the global batch,
3. reduction domains: gradients and metric states reduce over the full
   mesh. XLA routes the reduction over ICI within a slice and over DCN
   across slices automatically when the mesh is built from
   `jax.devices()` in process order (ICI-contiguous axes innermost).
   Metric states in the sharded eval step reduce with
   `metrics.base.psum_state` exactly as in the single-host case -- the
   psum simply spans more devices; `dist_reduce_fx='sum'` semantics
   are unchanged (ref metric/pq.py:228-246).

A v5e-8 slice is single-host; this module is exercised with a
multi-process CPU cluster in tests (one coordinator, N processes, 1
CPU device each) which is JAX's supported simulation of the pod case.
"""
from typing import Any, Dict, Optional

import jax
import numpy as np

from .mesh import batch_sharding, make_mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list] = None,
) -> None:
    """Join (or form) the multi-process JAX cluster.

    On Cloud TPU all arguments are discovered from the metadata server;
    pass them explicitly for CPU/GPU clusters. Must run before any
    other jax call in the process. Safe to call in a single-process
    setup with no arguments only on TPU; elsewhere pass the explicit
    triple."""
    kwargs: Dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    if local_device_ids is not None:
        kwargs['local_device_ids'] = local_device_ids
    jax.distributed.initialize(**kwargs)


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def make_global_mesh(axis_names=('data',)):
    """Mesh over ALL processes' devices (jax.devices() is globally
    ordered: process-major, so the data axis is ICI-contiguous within
    each slice and DCN hops only appear between process groups)."""
    return make_mesh(axis_names=axis_names)


def process_batch_slice(global_batch_size: int) -> slice:
    """Half-open row range of the GLOBAL batch this process must load.

    The global batch is laid out process-major (matching
    `jax.make_array_from_process_local_data`'s contract for a
    batch-sharded array), so process p of P loads rows
    [p*B/P, (p+1)*B/P)."""
    per = global_batch_size // jax.process_count()
    if per * jax.process_count() != global_batch_size:
        raise ValueError(
            f'global batch {global_batch_size} must divide evenly over '
            f'{jax.process_count()} processes')
    p = jax.process_index()
    return slice(p * per, (p + 1) * per)


def host_local_batch_to_global(local_batch, mesh,
                               axis_name: str = 'data'):
    """Assemble the global data-sharded batch from each process's local
    slice (rows `process_batch_slice`). Every leaf's leading dim is the
    LOCAL batch size; the result is a pytree of global jax.Arrays whose
    addressable shards are exactly the local rows -- no cross-host data
    movement happens here (the arrays are metadata-stitched), and none
    happens later either because train/eval steps only ever reduce
    scalars/states across hosts."""
    sharding = batch_sharding(mesh, axis_name)
    n_proc = jax.process_count()

    def to_global(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree_util.tree_map(to_global, local_batch)


def all_processes_agree(value) -> bool:
    """Cross-host sanity check (e.g. same step number after resume):
    allgather the scalar from every process and compare."""
    from jax.experimental import multihost_utils
    vals = np.asarray(
        multihost_utils.process_allgather(np.asarray(value)))
    return bool(np.all(vals == vals.reshape(-1)[0]))


def spmd_main(train_loop, *, coordinator_address=None,
              num_processes=None, process_id=None):
    """Boilerplate pod entry: initialize the cluster, build the global
    mesh, run `train_loop(mesh)`, and fence collectives before exit
    (a process exiting early hangs the others' collectives)."""
    initialize_multihost(coordinator_address=coordinator_address,
                         num_processes=num_processes,
                         process_id=process_id)
    mesh = make_global_mesh()
    try:
        return train_loop(mesh)
    finally:
        jax.effects_barrier()
