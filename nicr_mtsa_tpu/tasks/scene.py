"""Scene classification task helper (reference
task_helper/scene.py:18-132): mean-reduced CE with void (-1) ignored;
confusion matrix -> accuracy + balanced accuracy."""
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import confusion_matrix
from .base import (
    TaskHelperBase, append_detached_losses_to_logs, append_profile_to_logs,
)


class SceneTaskHelper(TaskHelperBase):
    def __init__(
        self,
        n_classes: int,
        class_weights: Optional[np.ndarray] = None,
        label_smoothing: float = 0.0,
    ) -> None:
        self._n_classes = n_classes
        self._class_weights = (None if class_weights is None
                               else jnp.asarray(class_weights))
        self._label_smoothing = float(label_smoothing)
        self.initialize()

    def initialize(self) -> None:
        self._cm_state = jnp.zeros(
            (self._n_classes, self._n_classes), jnp.int32)

    def compute_losses(self, batch, predictions_post) -> Dict:
        logits = predictions_post['scene_output']       # (B, C)
        target = batch['scene'].astype(jnp.int32) - 1   # -1 = void
        valid = target >= 0
        tclip = jnp.clip(target, 0, self._n_classes - 1)

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, tclip[:, None], axis=-1)[:, 0]
        if self._label_smoothing > 0:
            ls = self._label_smoothing
            nll = (1 - ls) * nll + ls * -jnp.mean(logp, axis=-1)
        if self._class_weights is not None:
            w = self._class_weights[tclip]
            nll = nll * w
            denom = jnp.sum(jnp.where(valid, w, 0.0))
        else:
            denom = jnp.sum(valid.astype(jnp.float32))
        nll = jnp.where(valid, nll, 0.0)
        total = jnp.sum(nll) / jnp.maximum(denom, 1e-12)
        return {self.mark_as_total('scene'): total}

    @append_profile_to_logs('scene_step_time')
    @append_detached_losses_to_logs()
    def training_step(self, batch, batch_idx, predictions_post):
        return self.compute_losses(batch, predictions_post), {}

    def empty_metric_states(self):
        return jnp.zeros((self._n_classes, self._n_classes), jnp.int32)

    def update_metric_states(self, state, batch, predictions_post):
        if state is None:
            state = self.empty_metric_states()
        target = batch['scene'].astype(jnp.int32)
        valid = target != 0
        preds = predictions_post['scene_class_idx'].astype(jnp.int32)
        t = jnp.where(valid, target - 1, 0)
        p = jnp.where(valid, preds, 0)
        cm = confusion_matrix(p, t, self._n_classes)
        cm = cm.at[0, 0].add(-jnp.sum(~valid).astype(cm.dtype))
        return state + cm

    def load_metric_states(self, state):
        """Adopt fused-eval states so validation_epoch_end reports
        them."""
        self._cm_state = state

    @append_profile_to_logs('scene_step_time')
    @append_detached_losses_to_logs()
    def validation_step(self, batch, batch_idx, predictions_post):
        loss_dict = self.compute_losses(batch, predictions_post)

        target = batch['scene'].astype(jnp.int32)
        valid = target != 0
        preds = predictions_post['scene_class_idx'].astype(jnp.int32)
        # void samples map to the (0, 0) cell and are removed again
        t = jnp.where(valid, target - 1, 0)
        p = jnp.where(valid, preds, 0)
        cm = confusion_matrix(p, t, self._n_classes)
        cm = cm.at[0, 0].add(-jnp.sum(~valid).astype(cm.dtype))
        self._cm_state = self._cm_state + cm

        return loss_dict, {}

    @append_profile_to_logs('scene_epoch_end_time')
    def validation_epoch_end(self):
        cm = np.asarray(self._cm_state).astype(np.float64)
        tp = np.diag(cm)
        gt = cm.sum(axis=1)
        mask = gt != 0
        tp, gt = tp[mask], gt[mask]
        acc = float(tp.sum() / gt.sum()) if gt.sum() else 0.0
        bacc = float(np.mean(tp / gt)) if len(gt) else 0.0

        artifacts = {'scene_cm': np.asarray(self._cm_state)}
        logs = {'scene_acc': np.float32(acc), 'scene_bacc': np.float32(bacc)}
        self.initialize()
        return artifacts, {}, logs
