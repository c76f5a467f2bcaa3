"""Training/eval/inference pipelines.

The reference repo provides every layer *of* a trainer but no trainer
(SURVEY.md preamble); the downstream EMSANet repo wires them together.
This module IS that wiring, TPU-first:

- `MultiTaskPipeline.train_step`: one jitted program -- forward,
  per-task losses (task helpers), loss weighting, grads, optax update.
- `MultiTaskPipeline.validation_step`: jitted forward+postprocessing;
  task-helper metric updates accumulate device states.
- `PanopticInferencePipeline`: the serving path -- uint8 RGB-D in,
  panoptic maps out, preprocessing fused into the same jit program
  (the BASELINE.json north star).
"""
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .data.preprocessing.base import APPLIED_PREPROCESSING_KEY
from .data.preprocessing.normalize import RGB_MEAN, RGB_STD
from .models.multi_task import (
    MultiTaskModel, MultiTaskModelConfig, build_model,
)
from .postprocessing import (
    DenseVisualEmbeddingPostprocessing,
    InstancePostprocessing,
    NormalPostprocessing,
    PanopticPostprocessing,
    ScenePostprocessing,
    SemanticPostprocessing,
)
from .tasks.base import get_total_loss_key


def strip_non_arrays(batch):
    """Drop entries a jitted step cannot take (provenance meta, ragged
    lists, python objects); keep (nested dicts of) arrays. Ragged DVE
    LUT lists must be padded host-side first (see
    tasks/dense_visual_embedding.pad_embedding_luts)."""
    out = {}
    for key, value in batch.items():
        if isinstance(value, dict):
            nested = strip_non_arrays(value)
            if nested:
                out[key] = nested
        elif isinstance(value, (np.ndarray, jnp.ndarray)):
            out[key] = value
    return out


def _add_shared_gt_slots(full_batch) -> None:
    """Precompute the GT PQ slot map once per step (in place).

    The panoptic helper and the instance helper both score against the
    SAME fullres GT panoptic + segment table; without this, each
    pq_compare re-runs the bucketed `ids_to_slots` search over the
    (B, H, W) GT map (CSE across the nested pq_compare jit calls is
    not guaranteed). Helpers pick the key up via
    `batch.get('panoptic_gt_slots_fullres')`."""
    if 'panoptic_segment_table_fullres' not in full_batch:
        return
    from .data.preprocessing.resize import get_fullres
    from .ops.segments import ids_to_slots
    target = get_fullres(full_batch, 'panoptic')
    if target is None:
        return
    full_batch['panoptic_gt_slots_fullres'] = ids_to_slots(
        jnp.asarray(target, jnp.int32),
        jnp.asarray(full_batch['panoptic_segment_table_fullres']))


def default_postprocessors(
    tasks: Sequence[str],
    semantic_classes_is_thing: Sequence[bool],   # without void
    compute_scores: bool = False,
    top_k_instances: int = 64,
    heatmap_threshold: float = 0.1,
    heatmap_nms_kernel_size: int = 3,
    semantic_class_has_orientation: Optional[Sequence[bool]] = None,
    **dve_kwargs,
) -> Dict[str, Any]:
    """Build the per-task postprocessors for the enabled tasks."""
    tasks = set(tasks)
    post: Dict[str, Any] = {}
    sem_post = SemanticPostprocessing()
    ins_post = InstancePostprocessing(
        heatmap_threshold=heatmap_threshold,
        heatmap_nms_kernel_size=heatmap_nms_kernel_size,
        top_k_instances=top_k_instances)
    if 'panoptic' in tasks or ('semantic' in tasks and 'instance' in tasks):
        if semantic_class_has_orientation is None:
            semantic_class_has_orientation = semantic_classes_is_thing
        post['panoptic'] = PanopticPostprocessing(
            semantic_postprocessing=sem_post,
            instance_postprocessing=ins_post,
            semantic_classes_is_thing=tuple(semantic_classes_is_thing),
            semantic_class_has_orientation=tuple(
                semantic_class_has_orientation),
            compute_scores=compute_scores)
    else:
        if 'semantic' in tasks:
            post['semantic'] = sem_post
        if 'instance' in tasks:
            post['instance'] = ins_post
    if 'normal' in tasks:
        post['normal'] = NormalPostprocessing()
    if 'scene' in tasks:
        post['scene'] = ScenePostprocessing()
    if 'dense_visual_embedding' in tasks:
        post['dense_visual_embedding'] = \
            DenseVisualEmbeddingPostprocessing(**dve_kwargs)
    return post


class MultiTaskPipeline:
    """Wires model, postprocessors, task helpers, loss weighting, and
    the optimizer into jitted train / validation steps."""

    def __init__(
        self,
        model: MultiTaskModel,
        postprocessors: Dict[str, Any],
        task_helpers: Dict[str, Any],
        loss_weighting=None,
        optimizer: Optional[optax.GradientTransformation] = None,
        donate_train_state: bool = False,
    ) -> None:
        self.model = model
        self.postprocessors = postprocessors
        self.task_helpers = task_helpers
        self.loss_weighting = loss_weighting
        self.optimizer = optimizer or optax.adam(1e-4)
        self.donate_train_state = donate_train_state

        # donating `state` lets XLA update params/optimizer buffers in
        # place instead of double-buffering them every step (2x the
        # param+opt memory otherwise). Opt-in because the caller's old
        # state becomes invalid after the step.
        self._jit_train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=(0,) if donate_train_state else ())

    # --- init ---------------------------------------------------------------
    def init_variables(self, rng, example_inputs):
        # jit the initializer: eager per-op dispatch of a full model
        # init is minutes on CPU/TPU-tunnel backends
        @jax.jit
        def _init(rng, inputs):
            return self.model.init(
                {'params': rng, 'dropout': jax.random.fold_in(rng, 1)},
                inputs, train=True)
        return _init(rng, example_inputs)

    def create_train_state(self, rng, example_inputs):
        variables = self.init_variables(rng, example_inputs)
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        opt_state = self.optimizer.init(params)
        return {'params': params, 'batch_stats': batch_stats,
                'opt_state': opt_state,
                'step': jnp.zeros((), jnp.int32)}

    # --- forward ------------------------------------------------------------
    def apply_model(self, params, batch_stats, inputs, train, rng=None):
        variables = {'params': params}
        if batch_stats:
            variables['batch_stats'] = batch_stats
        kwargs = {}
        if train:
            kwargs['rngs'] = {'dropout': rng}
            kwargs['mutable'] = ['batch_stats'] if batch_stats else []
            outputs, updates = self.model.apply(
                variables, inputs, train=True, **kwargs)
            return outputs, updates.get('batch_stats', {})
        return self.model.apply(variables, inputs, train=False), batch_stats

    def model_inputs(self, batch):
        """The modality dict the model's encoder expects. A single
        4-channel multimodal backbone (swin-multi-*) gets 'rgbd',
        concatenated from rgb+depth if the batch carries them
        separately (the usual preprocessing output)."""
        encoder = getattr(self.model, 'encoder', None)
        backbone = getattr(encoder, 'backbone', None)
        if backbone is not None:      # single-backbone encoder
            n_in = getattr(backbone, 'n_input_channels', 3)
            want = ('rgbd',) if n_in == 4 else \
                   ('depth',) if n_in == 1 else ('rgb',)
            if all(k in batch for k in want):
                return {k: batch[k] for k in want}
            if n_in == 4 and 'rgb' in batch and 'depth' in batch:
                return {'rgbd': jnp.concatenate(
                    [batch['rgb'], batch['depth']], axis=-1)}
        return {k: batch[k] for k in ('rgb', 'depth', 'rgbd')
                if k in batch}

    # --- training -----------------------------------------------------------
    def compute_losses(self, batch, predictions):
        """Per-task losses on RAW outputs (training-mode postproc is a
        pass-through dict rename)."""
        predictions_post = {}
        for task, raw in predictions.items():
            post = self.postprocessors.get(task)
            if post is None and task in ('semantic', 'instance') \
                    and 'panoptic' in self.postprocessors:
                # panoptic postprocessor handles both sub-tasks in
                # training via the per-task naming convention
                from .models.upsampling import (
                    DEFERRED_TYPES, apply_deferred_upsampling,
                )
                prefix = task
                main = raw[0]
                if isinstance(main, DEFERRED_TYPES):
                    main = apply_deferred_upsampling(main)
                predictions_post[f'{prefix}_output'] = main
                predictions_post[f'{prefix}_side_outputs'] = raw[1]
                continue
            if post is not None:
                predictions_post.update(
                    post.postprocess(raw, batch, is_training=True))

        losses = {}
        for task, helper in self.task_helpers.items():
            if task == 'panoptic':
                continue    # no loss
            if not hasattr(helper, 'compute_losses'):
                continue
            losses.update(helper.compute_losses(batch, predictions_post))
        return losses

    def _total_loss(self, losses, loss_weights):
        total_keys = [k for k in losses if k.endswith('_total_loss')]
        if loss_weights is None:
            return sum(losses[k] for k in total_keys)
        return sum(loss_weights.get(k, 1.0) * losses[k] for k in total_keys
                   if k in loss_weights) + \
            sum(losses[k] for k in total_keys if k not in loss_weights)

    def _train_step_impl(self, state, batch, loss_weights, rng):
        def loss_fn(params):
            inputs = self.model_inputs(batch)
            predictions, new_batch_stats = self.apply_model(
                params, state['batch_stats'], inputs, train=True, rng=rng)
            losses = self.compute_losses(batch, predictions)
            total = self._total_loss(losses, loss_weights)
            return total, (losses, new_batch_stats)

        (total, (losses, new_batch_stats)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state['params'])

        updates, new_opt_state = self.optimizer.update(
            grads, state['opt_state'], state['params'])
        new_params = optax.apply_updates(state['params'], updates)

        new_state = {'params': new_params,
                     'batch_stats': new_batch_stats,
                     'opt_state': new_opt_state,
                     'step': state['step'] + 1}
        losses['total_loss'] = total
        return new_state, losses

    def train_step(self, state, batch, batch_idx: int = 0, rng=None):
        """One optimizer step (jitted). Loss-weighting state machines
        (DWA/RLW) run host-side; their scalar weights enter the jitted
        program as arguments."""
        if rng is None:
            rng = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
        if self.loss_weighting is not None:
            weights = {k: jnp.asarray(v, jnp.float32)
                       for k, v in self.loss_weighting.weights.items()}
        else:
            weights = None
        new_state, losses = self._jit_train_step(state, batch, weights, rng)

        if self.loss_weighting is not None:
            # feed the weighting state machine (device->host sync of a
            # few scalars once per step; epoch-granular for DWA)
            host_losses = {k: losses[k]
                           for k in self.loss_weighting.weights}
            self.loss_weighting.reduce_losses(host_losses, batch_idx)
        return new_state, losses

    # --- validation ---------------------------------------------------------
    def _val_forward_impl(self, params, batch_stats, batch):
        inputs = self.model_inputs(batch)
        predictions, _ = self.apply_model(
            params, batch_stats, inputs, train=False)

        predictions_post = {}
        for task, raw in predictions.items():
            post = self.postprocessors.get(task)
            if post is not None:
                predictions_post.update(
                    post.postprocess(raw, batch, is_training=False))
        if 'panoptic' in self.postprocessors and 'semantic' in predictions \
                and 'instance' in predictions:
            predictions_post.update(
                self.postprocessors['panoptic'].postprocess(
                    ((predictions['semantic'][0], predictions['instance'][0]),
                     (predictions['semantic'][1], predictions['instance'][1])),
                    batch, is_training=False))
        return predictions_post

    def validation_step(self, state, batch, batch_idx: int = 0):
        """Jitted forward + postprocessing, then task-helper loss /
        metric-state updates."""
        predictions_post = self._val_forward_impl(
            state['params'], state['batch_stats'], batch)

        all_losses, all_logs = {}, {}
        for task, helper in self.task_helpers.items():
            losses, logs = helper.validation_step(
                batch, batch_idx, predictions_post)
            all_losses.update(losses)
            all_logs.update(logs)
        return predictions_post, all_losses, all_logs

    def validation_epoch_end(self):
        artifacts, examples, logs = {}, {}, {}
        for helper in self.task_helpers.values():
            a, e, l = helper.validation_epoch_end()
            artifacts.update(a)
            examples.update(e)
            logs.update(l)
        return artifacts, examples, logs

    # --- fused evaluation ---------------------------------------------------
    def make_fused_eval_step(self, static_batch: Dict[str, Any],
                             output_keys: Optional[Sequence[str]] = None):
        """Build ONE jitted program: forward + postprocessing + metric
        STATE updates, with metric states threaded functionally -- the
        eval path never round-trips to host (BASELINE.json north star;
        the reference syncs at the merge, every metric update, and
        every per-instance `.item()`, SURVEY.md §3.2).

        `static_batch` carries the non-array keys every batch shares
        (`_applied_preprocessing` meta with the Resize valid-region
        slices). The returned step consumes metric states keyed by
        task-helper name and the helpers' `update_metrics`-compatible
        inputs; host code merely carries the state pytree between
        calls and runs `compute()` once per epoch.

        `output_keys` selects which prediction keys the step RETURNS.
        Every returned key is a live jit output, so the default (all
        keys) forces the whole fullres per-task buffer inventory into
        HBM even when only the metric reductions consume it. A
        metric-only epoch should pass `output_keys=()`: XLA then dead-
        code-eliminates / fuses the unconsumed fullres maps into the
        metric updates (the reference keeps predictions alive per batch
        unconditionally, SURVEY.md §3.2; visualization examples there
        only read batch 0 -- request keys for that batch alone)."""
        helpers = self.task_helpers

        def step(params, batch_stats, batch, metric_states):
            full_batch = dict(batch)
            full_batch.update(static_batch)
            predictions_post = self._val_forward_impl(
                params, batch_stats, full_batch)
            _add_shared_gt_slots(full_batch)

            new_states = dict(metric_states)
            losses = {}
            for name, helper in helpers.items():
                if hasattr(helper, 'compute_losses') \
                        and name != 'panoptic':
                    losses.update(helper.compute_losses(
                        full_batch, predictions_post))
                if hasattr(helper, 'update_metric_states'):
                    new_states[name] = helper.update_metric_states(
                        metric_states.get(name), full_batch,
                        predictions_post)
            if output_keys is not None:
                predictions_post = {k: predictions_post[k]
                                    for k in output_keys}
            return predictions_post, losses, new_states

        return jax.jit(step)


class PanopticInferencePipeline:
    """Serving path: raw uint8 rgb + uint16 depth -> panoptic maps,
    everything (normalize, forward, NMS, grouping, merge) in ONE jit
    program on device. This is the path the reference runs as
    numpy/OpenCV preprocessing + torch forward + CPU merge
    (SURVEY.md §3.2) and the BASELINE.json north-star benchmark."""

    def __init__(
        self,
        model: MultiTaskModel,
        panoptic_postprocessing: PanopticPostprocessing,
        depth_mean: float = 2841.94941272766,    # NYUv2 stats
        depth_std: float = 1417.2594281672277,
        compute_dtype=jnp.bfloat16,
        extra_output_tasks: tuple = (),
    ) -> None:
        """extra_output_tasks: additional dense task heads ('normal',
        'dense_visual_embedding', ...) whose raw main outputs are added
        to the serving dict as '<task>_output'. Off by default: unused
        heads are dead code XLA eliminates from the serving program,
        so requesting them is the only thing that pays for them."""
        self.model = model
        self.post = panoptic_postprocessing
        self._depth_mean = float(depth_mean)
        self._depth_std = float(depth_std)
        self._compute_dtype = compute_dtype
        self._extra_output_tasks = tuple(extra_output_tasks)
        self._jit_infer = jax.jit(self._infer_impl)

    def preprocess(self, rgb_u8, depth_u16):
        """On-device normalize (reference does this per-sample in
        numpy, normalize.py:44-47 / 99-124). Emits the input dict the
        model's encoder expects: {'rgb', 'depth'} for dual-backbone
        fusion encoders, {'rgbd'} (channel concat) for single
        4-channel multimodal backbones (e.g. swin-multi-*), or a
        single modality for 3-/1-channel backbones."""
        rgb = (rgb_u8.astype(jnp.float32) - jnp.asarray(RGB_MEAN)) \
            / jnp.asarray(RGB_STD)
        depth = depth_u16.astype(jnp.float32)
        invalid = depth == 0.0
        depth = (depth - self._depth_mean) / self._depth_std
        depth = jnp.where(invalid, 0.0, depth)
        if depth.ndim == 3:
            depth = depth[..., None]
        rgb = rgb.astype(self._compute_dtype)
        depth = depth.astype(self._compute_dtype)

        encoder = getattr(self.model, 'encoder', None)
        backbone = getattr(encoder, 'backbone', None)
        if backbone is not None:    # single-backbone encoder
            n_in = getattr(backbone, 'n_input_channels', 3)
            if n_in == 4:
                return {'rgbd': jnp.concatenate([rgb, depth], axis=-1)}
            if n_in == 1:
                return {'depth': depth}
            return {'rgb': rgb}
        return {'rgb': rgb, 'depth': depth}

    def _infer_impl(self, variables, rgb_u8, depth_u16):
        inputs = self.preprocess(rgb_u8, depth_u16)
        predictions = self.model.apply(variables, inputs, train=False)

        B, H, W = rgb_u8.shape[:3]
        batch = {
            APPLIED_PREPROCESSING_KEY: [[{
                'type': 'Resize',
                'valid_region_slice_y': slice(0, H),
                'valid_region_slice_x': slice(0, W),
            }]],
            'rgb_fullres': rgb_u8,
        }
        r_dict = self.post.postprocess(
            ((predictions['semantic'][0], predictions['instance'][0]),
             (predictions['semantic'][1], predictions['instance'][1])),
            batch, is_training=False)
        outputs = {
            'panoptic': r_dict['panoptic_segmentation_deeplab'],
            'panoptic_semantic':
                r_dict['panoptic_segmentation_deeplab_semantic_idx'],
            'panoptic_instance':
                r_dict['panoptic_segmentation_deeplab_instance_idx'],
            'semantic_idx': r_dict['semantic_segmentation_idx'],
            'semantic_score': r_dict['semantic_segmentation_score'],
        }
        if 'scene' in predictions:
            outputs['scene_logits'] = predictions['scene'][0]
        for task in self._extra_output_tasks:
            main = predictions[task][0]
            from .models.upsampling import (
                DEFERRED_TYPES, apply_deferred_upsampling,
            )
            if isinstance(main, DEFERRED_TYPES):
                main = apply_deferred_upsampling(main)
            outputs[f'{task}_output'] = main
        return outputs

    def __call__(self, variables, rgb_u8, depth_u16):
        return self._jit_infer(variables, rgb_u8, depth_u16)
