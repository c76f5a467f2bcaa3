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


def make_sharded_train_step(pipeline, mesh: Mesh, axis_name: str = 'data',
                            donate_state: bool = True):
    """Wrap a MultiTaskPipeline's train-step computation with explicit
    input/output shardings over `mesh`. Returns
    `step(state, batch, loss_weights, rng) -> (state, losses)`.

    `donate_state` (default on: the canonical `state = step(state, ...)`
    loop never reads the old state) lets XLA reuse the param/optimizer
    buffers in place instead of double-buffering them each step."""
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)

    def _step(state, batch, loss_weights, rng):
        return pipeline._train_step_impl(state, batch, loss_weights, rng)

    return jax.jit(
        _step,
        in_shardings=(repl, data, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
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


def make_sharded_eval_step(pipeline, mesh: Mesh,
                           static_batch: Optional[Dict] = None,
                           axis_name: str = 'data',
                           output_keys=None):
    """ONE jitted evaluation program over the mesh: forward +
    postprocessing + losses via GSPMD (jit with shardings keeps global
    semantics, so losses match the single-device fused step exactly),
    and metric-STATE updates per-shard inside `shard_map` with an
    explicit `psum_state` all-reduce over `axis_name`.

    The shard_map section is the TPU-native replacement for
    torchmetrics' `dist_reduce_fx='sum'` (reference metric/pq.py:
    228-246 accumulates per-process states that DDP sums at compute
    time): every device updates an empty state from its local batch
    shard, the psum rides ICI, and the summed contribution is added to
    the carried state — so the returned states are replicated and
    bit-equal to a single-device `make_fused_eval_step` run on the
    unsharded batch (tested in tests/test_parallel.py).

    Returns `step(params, batch_stats, batch, metric_states) ->
    (predictions_post, losses, new_metric_states)`; `batch` must be
    arrays-only (`strip_non_arrays`), non-array provenance goes in
    `static_batch`."""
    from ..metrics.base import add_states, psum_state

    helpers = pipeline.task_helpers
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)
    static_batch = dict(static_batch or {})
    metric_helpers = {name: h for name, h in helpers.items()
                      if hasattr(h, 'update_metric_states')}

    def _local_update(batch_shard, preds_shard):
        from ..pipeline import _add_shared_gt_slots
        full = dict(batch_shard)
        full.update(static_batch)
        _add_shared_gt_slots(full)
        contribs = {}
        for name, helper in metric_helpers.items():
            contribs[name] = helper.update_metric_states(
                None, full, preds_shard)
        return psum_state(contribs, axis_name)

    def step(params, batch_stats, batch, metric_states):
        full_batch = dict(batch)
        full_batch.update(static_batch)
        predictions_post = pipeline._val_forward_impl(
            params, batch_stats, full_batch)

        losses = {}
        for name, helper in helpers.items():
            if hasattr(helper, 'compute_losses') and name != 'panoptic':
                losses.update(helper.compute_losses(
                    full_batch, predictions_post))

        contribs = jax.shard_map(
            _local_update, mesh=mesh,
            in_specs=(P(axis_name), P(axis_name)),
            out_specs=P())(batch, predictions_post)

        new_states = dict(metric_states)
        for name in metric_helpers:
            prev = metric_states.get(name)
            new_states[name] = contribs[name] if prev is None \
                else add_states(prev, contribs[name])
        if output_keys is not None:
            # metric-only epochs pass (): unreturned fullres buffers
            # are DCE'd/fused into the metric updates by XLA
            predictions_post = {k: predictions_post[k]
                                for k in output_keys}
        return predictions_post, losses, new_states

    return jax.jit(step, in_shardings=(repl, repl, data, repl),
                   out_shardings=(data, repl, repl))


def make_spatial_infer(pipeline, mesh: Mesh, axis_name: str = 'space'):
    """Single-image LATENCY serving: shard the image HEIGHT over the
    mesh (spatial partitioning). For throughput the data axis is always
    the right answer (make_sharded_infer), but a single frame cannot be
    batch-sharded -- row sharding lets all chips cooperate on one
    image: XLA's partitioner inserts the conv halo exchanges over ICI
    and turns the context module's global pools into psums
    automatically.

    Serves the dense semantic head (fullres argmax idx + max-softmax
    score, row-sharded in/out). The panoptic grouping/merge path needs
    global image state (top-k centers over the whole frame) and stays
    on the data-parallel path. Row count at the deepest stage (H/32)
    should be >= the mesh size or trailing shards idle.

    Returns `infer(variables, rgb_u8, depth_u16) -> dict`."""
    from ..ops.pallas.semantic_reduce import semantic_score_idx

    repl = replicated(mesh)
    rows = NamedSharding(mesh, P(None, axis_name))

    def infer(variables, rgb_u8, depth_u16):
        inputs = pipeline.preprocess(rgb_u8, depth_u16)
        preds = pipeline.model.apply(variables, inputs, train=False)
        score, idx = semantic_score_idx(preds['semantic'][0])
        return {'semantic_segmentation_idx': idx,
                'semantic_segmentation_score': score}

    return jax.jit(infer, in_shardings=(repl, rows, rows),
                   out_shardings=rows)


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
