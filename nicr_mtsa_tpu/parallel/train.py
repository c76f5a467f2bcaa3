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


def make_sharded_eval_forward(pipeline, mesh: Mesh, axis_name: str = 'data',
                              static_batch: Optional[Dict] = None):
    """Sharded forward + postprocessing for evaluation; per-image
    postprocessing (NMS/grouping/merge) is embarrassingly parallel
    over the batch so it shards cleanly over `data`.

    Non-array batch entries (the `_applied_preprocessing` provenance
    meta with its static crop slices) cannot be jit inputs; pass them
    via `static_batch` -- they are closed over, mirroring
    `MultiTaskPipeline.make_fused_eval_step`."""
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)
    static_batch = dict(static_batch or {})

    def _fwd(params, batch_stats, batch):
        full_batch = dict(batch)
        full_batch.update(static_batch)
        return pipeline._val_forward_impl(params, batch_stats, full_batch)

    return jax.jit(_fwd, in_shardings=(repl, repl, data),
                   out_shardings=data)


def make_sharded_infer(pipeline, mesh: Mesh, axis_name: str = 'data'):
    """Data-parallel SERVING: shard a PanopticInferencePipeline's
    uint8 frame batch over the mesh's `data` axis with replicated
    parameters. The whole fused program (normalize -> forward -> NMS ->
    grouping -> merge) is per-image, so it partitions with no
    cross-device collectives on the critical path. Returns
    `infer(variables, rgb_u8, depth_u16) -> outputs` with outputs
    sharded over `data` (use `jax.device_get` or keep sharded for a
    downstream consumer)."""
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)

    return jax.jit(
        pipeline._infer_impl,
        in_shardings=(repl, data, data),
        out_shardings=data,
    )
