"""Surface-normal task helper (reference task_helper/normal.py:27-167):
L1/MSE masked to pixels with a valid (non-zero) GT normal; RMSE metric
at full resolution."""
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.preprocessing.resize import get_fullres_key
from ..losses import L1Loss, MSELoss
from ..metrics import RootMeanSquaredError
from .base import (
    TaskHelperBase, append_detached_losses_to_logs, append_profile_to_logs,
)


KNOWN_NORMAL_LOSS_FUNCTIONS = ('l1', 'mse')


def _get_valid_gt_normals(gt):
    """Valid = GT normal vector is not all-zero (channels-last)."""
    return jnp.any(gt != 0, axis=-1)


class NormalTaskHelper(TaskHelperBase):
    def __init__(
        self,
        loss_name: str = 'l1',
        disable_multiscale_supervision: bool = False,
        store_examples: bool = False,
    ) -> None:
        assert loss_name in KNOWN_NORMAL_LOSS_FUNCTIONS
        self._loss_class = MSELoss if loss_name == 'mse' else L1Loss
        self._disable_multiscale_supervision = disable_multiscale_supervision
        self._examples: Dict[str, Any] = {}
        self._store_examples = store_examples
        self.initialize()

    def initialize(self) -> None:
        self._loss = self._loss_class(reduction='sum')
        self._metric_rmse = RootMeanSquaredError()
        self._metric_rmse.reset()

    def compute_losses(self, batch, predictions_post) -> Dict:
        no_ms = self._disable_multiscale_supervision
        preds, targets, keys = self.collect_predictions_and_targets_for_loss(
            batch=batch, batch_key='normal',
            predictions_post=predictions_post,
            predictions_post_key='normal_output',
            side_outputs_key=None if no_ms else 'normal_side_outputs')

        masks_valid = [_get_valid_gt_normals(gt) for gt in targets]
        n_valid = [jnp.sum(m.astype(jnp.int32)) for m in masks_valid]
        preds_masked = [pred * mask[..., None]
                        for mask, pred in zip(masks_valid, preds)]

        loss_outputs = self._loss(preds_masked, targets)

        loss_dict = {
            f'normal_loss_{key}': loss / jnp.maximum(n, 1)
            for key, (loss, _), n in zip(keys, loss_outputs, n_valid)
        }
        loss_dict[self.mark_as_total('normal')] = self.accumulate_losses(
            losses=[loss for loss, _ in loss_outputs],
            n_elements=n_valid)
        return loss_dict

    @append_profile_to_logs('normal_step_time')
    @append_detached_losses_to_logs()
    def training_step(self, batch, batch_idx, predictions_post):
        return self.compute_losses(batch, predictions_post), {}

    def empty_metric_states(self):
        return self._metric_rmse.empty_state()

    def update_metric_states(self, state, batch, predictions_post):
        if state is None:
            state = self.empty_metric_states()
        target = jnp.asarray(self.get_fullres(batch, 'normal'))
        return self._metric_rmse.update_state(
            state, predictions_post[get_fullres_key('normal_output')],
            target, mask=_get_valid_gt_normals(target))

    def load_metric_states(self, state):
        """Adopt fused-eval states so validation_epoch_end reports
        them."""
        self._metric_rmse.state = state

    @append_profile_to_logs('normal_step_time')
    @append_detached_losses_to_logs()
    def validation_step(self, batch, batch_idx, predictions_post):
        loss_dict = self.compute_losses(batch, predictions_post)

        target = jnp.asarray(self.get_fullres(batch, 'normal'))
        self._metric_rmse.update(
            predictions_post[get_fullres_key('normal_output')],
            target, mask=_get_valid_gt_normals(target))

        if self._store_examples and batch_idx == 0:
            from ..visualization import visualize_normal_pil
            ex = np.asarray(predictions_post['normal_output'][0])
            self._examples['normal_example_batch_0_0'] = \
                visualize_normal_pil(ex)

        return loss_dict, {}

    @append_profile_to_logs('normal_epoch_end_time')
    def validation_epoch_end(self):
        logs = {'normal_rmse': self._metric_rmse.compute()}
        self._metric_rmse.reset()
        return {}, self._examples, logs
