"""Device mesh + sharding helpers.

The reference has no parallelism of its own (SURVEY.md §2.8): DP is
delegated to an external DDP/NCCL trainer and metric states carry
`dist_reduce_fx='sum'`. Here the equivalents are first-class:

- one `jax.sharding.Mesh` with a `data` axis (optionally a `model`
  axis for TP later),
- batches sharded over `data` via NamedSharding; parameters and
  optimizer state replicated,
- gradient/metric reduction emerges from XLA's partitioner (psum over
  ICI) -- no NCCL code, no process pool.

Multi-host: call `jax.distributed.initialize()` before `make_mesh`
and feed per-process shards via
`jax.make_array_from_process_local_data`.
"""
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ('data',),
    mesh_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    device_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(device_array, axis_names)


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = 'data'):
    """Place (nested dicts of) arrays with the leading batch dim
    sharded over the data axis."""
    sharding = batch_sharding(mesh, axis_name)

    def place(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, optimizer state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
