"""Semantic task helper (reference task_helper/semantic.py:22-161):
class-weighted CE over main + side outputs; validation accumulates a
full-resolution confusion-matrix mIoU (void-masked, labels shifted by
-1) -- on device here instead of the reference's CPU."""
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.preprocessing.resize import get_fullres_key
from ..losses import CrossEntropyLossSemantic
from ..metrics import MeanIntersectionOverUnion, confusion_matrix
from .base import (
    TaskHelperBase, append_detached_losses_to_logs, append_profile_to_logs,
)


class SemanticTaskHelper(TaskHelperBase):
    def __init__(
        self,
        n_classes: int,
        class_weights: Optional[np.ndarray] = None,
        label_smoothing: float = 0.0,
        disable_multiscale_supervision: bool = False,
        examples_cmap=None,
        store_examples: bool = False,
    ) -> None:
        self._n_classes = n_classes
        self._class_weights = class_weights
        self._label_smoothing = label_smoothing
        self._disable_multiscale_supervision = disable_multiscale_supervision
        self._examples: Dict[str, Any] = {}
        self._examples_cmap = examples_cmap
        self._store_examples = store_examples
        self.initialize()

    def initialize(self) -> None:
        self._loss = CrossEntropyLossSemantic(
            weights=self._class_weights,
            label_smoothing=self._label_smoothing)
        self._metric_iou = MeanIntersectionOverUnion(
            n_classes=self._n_classes)
        self._metric_iou.reset()

    def compute_losses(self, batch, predictions_post) -> Dict:
        """Jittable loss core."""
        no_ms = self._disable_multiscale_supervision
        preds, targets, keys = self.collect_predictions_and_targets_for_loss(
            batch=batch, batch_key='semantic',
            predictions_post=predictions_post,
            predictions_post_key='semantic_output',
            side_outputs_key=None if no_ms else 'semantic_side_outputs')

        loss_outputs = self._loss(preds, targets)

        loss_dict = {
            f'semantic_loss_{key}': loss / jnp.maximum(n, 1)
            for key, (loss, n) in zip(keys, loss_outputs)
        }
        loss_dict[self.mark_as_total('semantic')] = self.accumulate_losses(
            losses=[loss for loss, _ in loss_outputs],
            n_elements=[n for _, n in loss_outputs])
        return loss_dict

    @append_profile_to_logs('semantic_step_time')
    @append_detached_losses_to_logs()
    def training_step(self, batch, batch_idx, predictions_post):
        return self.compute_losses(batch, predictions_post), {}

    def update_metrics(self, batch, predictions_post) -> None:
        """Jittable under the stateful-wrapper convention: fullres
        argmax vs fullres GT. Void pixels map to the (unused) diagonal
        (0, 0) cell instead of boolean indexing -- static shapes."""
        target = self.get_fullres(batch, 'semantic')
        preds = predictions_post[get_fullres_key('semantic_segmentation_idx')]
        valid = target != 0
        # void -> pred 0 / target 0 (counts only into cm[0, 0], which
        # neither intersects nor unions any real class row/col... but
        # class 0 IS real here (labels shifted); so subtract later:
        # instead map void pairs to an identical dummy (0,0) and
        # remove the added count
        t = jnp.where(valid, target.astype(jnp.int32) - 1, 0)
        p = jnp.where(valid, preds.astype(jnp.int32), 0)
        cm = confusion_matrix(p, t, self._n_classes)
        n_void = jnp.sum(~valid).astype(cm.dtype)
        cm = cm.at[0, 0].add(-n_void)
        self._metric_iou.state = self._metric_iou.state + cm

    # --- functional metric-state API (fused eval step) ----------------------
    def empty_metric_states(self):
        return self._metric_iou.empty_state()

    def update_metric_states(self, state, batch, predictions_post):
        if state is None:
            state = self.empty_metric_states()
        target = self.get_fullres(batch, 'semantic')
        preds = predictions_post[get_fullres_key('semantic_segmentation_idx')]
        valid = target != 0
        t = jnp.where(valid, target.astype(jnp.int32) - 1, 0)
        p = jnp.where(valid, preds.astype(jnp.int32), 0)
        cm = confusion_matrix(p, t, self._n_classes)
        cm = cm.at[0, 0].add(-jnp.sum(~valid).astype(cm.dtype))
        return state + cm

    def load_metric_states(self, state):
        """Adopt fused-eval states so validation_epoch_end reports
        them."""
        self._metric_iou.state = state

    @append_profile_to_logs('semantic_step_time')
    @append_detached_losses_to_logs()
    def validation_step(self, batch, batch_idx, predictions_post):
        loss_dict = self.compute_losses(batch, predictions_post)
        self.update_metrics(batch, predictions_post)

        if self._store_examples and batch_idx == 0:
            from ..visualization import (
                visualize_heatmap_pil, visualize_semantic_pil,
            )
            ex = np.asarray(predictions_post['semantic_segmentation_idx'][0])
            self._examples[f'semantic_example_batch_idx_0_0'] = \
                visualize_semantic_pil(ex, colors=self._examples_cmap)
            ex = np.asarray(predictions_post['semantic_segmentation_score'][0])
            self._examples[f'semantic_example_batch_score_0_0'] = \
                visualize_heatmap_pil(ex, min_=0, max_=1)

        return loss_dict, {}

    @append_profile_to_logs('semantic_epoch_end_time')
    def validation_epoch_end(self):
        miou, ious = self._metric_iou.compute(return_ious=True)
        logs = {'semantic_miou': miou}
        artifacts = {'semantic_cm': np.asarray(self._metric_iou.state),
                     'semantic_ious_per_class': ious}
        self._metric_iou.reset()
        return artifacts, self._examples, logs
