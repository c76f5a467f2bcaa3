"""Sharded train step: data-parallel SPMD via jit + NamedSharding.

The batch is sharded over the mesh's `data` axis, parameters and
optimizer state are replicated; XLA's partitioner inserts the gradient
all-reduce over ICI automatically (the sharded counterpart of DDP's
NCCL all-reduce that the reference delegates to an external trainer,
SURVEY.md §2.8)."""
from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, replicated


def make_sharded_train_step(pipeline, mesh: Mesh, axis_name: str = 'data'):
    """Wrap a MultiTaskPipeline's train-step computation with explicit
    input/output shardings over `mesh`. Returns
    `step(state, batch, loss_weights, rng) -> (state, losses)`."""
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)

    def _step(state, batch, loss_weights, rng):
        return pipeline._train_step_impl(state, batch, loss_weights, rng)

    return jax.jit(
        _step,
        in_shardings=(repl, data, repl, repl),
        out_shardings=(repl, repl),
    )


def make_sharded_eval_forward(pipeline, mesh: Mesh, axis_name: str = 'data'):
    """Sharded forward + postprocessing for evaluation; per-image
    postprocessing (NMS/grouping/merge) is embarrassingly parallel
    over the batch so it shards cleanly over `data`."""
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)

    def _fwd(params, batch_stats, batch):
        return pipeline._val_forward_impl(params, batch_stats, batch)

    return jax.jit(_fwd, in_shardings=(repl, repl, data),
                   out_shardings=data)
