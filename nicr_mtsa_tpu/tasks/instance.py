"""Instance task helper (reference task_helper/instance.py:35-436).

Training: masked center MSE/L1 (instance_center_mask), masked offset
L1 (instance_foreground), von-Mises orientation loss on masked pixels.
Masking keeps static shapes: predictions are zeroed outside the mask
and the valid count divides the sum -- the reference's
`.cpu().item()` count syncs become device scalars.

Validation: the predicted instance segmentation is merged with the GT
semantic (isolating instance-branch quality) and scored with the
orientation-aware PQ; a plain MAE against GT instances is also kept.
"""
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.preprocessing.resize import get_fullres_key
from ..losses import L1Loss, MSELoss, VonMisesLossBiternion
from ..metrics import (
    MeanAbsoluteAngularError, PanopticQualityWithOrientationMAE,
)
from ..ops.merge import deeplab_merge, deeplab_merge_pq
from ..ops.segments import SEGMENT_TABLE_PAD, merged_segment_table
from ._orientation_tables import gt_slot_angles, pred_slot_angles
from .base import (
    TaskHelperBase, append_detached_losses_to_logs, append_profile_to_logs,
)


KNOWN_INSTANCE_CENTER_LOSS_FUNCTIONS = ('mse', 'l1')


class InstanceTaskHelper(TaskHelperBase):
    def __init__(
        self,
        semantic_n_classes: int,                  # with void
        semantic_classes_is_thing: Tuple[bool, ...],
        loss_name_instance_center: str = 'mse',
        disable_multiscale_supervision: bool = False,
        top_k_instances: int = 64,
        store_examples: bool = False,
    ) -> None:
        assert loss_name_instance_center in \
            KNOWN_INSTANCE_CENTER_LOSS_FUNCTIONS
        self._loss_name_instance_center = loss_name_instance_center
        self._disable_multiscale_supervision = disable_multiscale_supervision
        self._semantic_n_classes = semantic_n_classes
        self._semantic_classes_is_thing = \
            np.asarray(semantic_classes_is_thing, dtype=bool)
        self._with_orientation = False
        self._examples: Dict[str, Any] = {}
        self._store_examples = store_examples
        self._max_instances_per_category = 1 << 16
        self._top_k_instances = top_k_instances
        self.initialize()

    def initialize(self) -> None:
        if 'mse' == self._loss_name_instance_center:
            self._loss_center = MSELoss(reduction='sum')
        else:
            self._loss_center = L1Loss(reduction='sum')
        self._loss_offset = L1Loss(reduction='sum')
        self._loss_orientation = VonMisesLossBiternion()

        self._mae_pq_deeplab = PanopticQualityWithOrientationMAE(
            num_categories=self._semantic_n_classes,
            ignored_label=0,
            max_instances_per_category=self._max_instances_per_category,
            offset=256 ** 3,
            is_thing=self._semantic_classes_is_thing,
        )
        self._mae_gt = MeanAbsoluteAngularError()

    # --- losses -------------------------------------------------------------
    def compute_losses(self, batch, predictions_post) -> Dict:
        no_ms = self._disable_multiscale_supervision
        preds, keys, downscales = self.collect_predictions_for_loss(
            predictions_post, 'instance_output',
            None if no_ms else 'instance_side_outputs')

        preds_center, preds_offset, preds_orientation = [], [], []
        for pred in preds:
            preds_center.append(pred[0][..., 0])    # drop channel axis
            preds_offset.append(pred[1])
            if len(pred) == 3:
                preds_orientation.append(pred[2])
        self._with_orientation = len(preds_orientation) > 0

        # centers: MSE/L1 masked by instance_center_mask
        masks_center = self.collect_targets_for_loss(
            batch, 'instance_center_mask', downscales)
        targets_center = self.collect_targets_for_loss(
            batch, 'instance_center', downscales)
        preds_center_masked = [
            pred * mask for mask, pred in zip(masks_center, preds_center)]
        loss_center = self._loss_center(preds_center_masked, targets_center)
        n_center = [jnp.sum(m.astype(jnp.int32)) for m in masks_center]

        # offsets: L1 masked by instance_foreground
        masks_fg = self.collect_targets_for_loss(
            batch, 'instance_foreground', downscales)
        targets_offset = self.collect_targets_for_loss(
            batch, 'instance_offset', downscales)
        preds_offset_masked = [
            pred * mask[..., None]
            for mask, pred in zip(masks_fg, preds_offset)]
        loss_offset = self._loss_offset(preds_offset_masked, targets_offset)
        n_offset = [jnp.sum(m.astype(jnp.int32)) for m in masks_fg]

        # orientations: von Mises on masked (N, 2) -- static shapes via
        # zero-masking (zero biternions give cos=0 -> nonzero score, so
        # mask the SCORE instead: compute per-pixel and zero invalid)
        loss_orientation, n_orientation = [], []
        if self._with_orientation:
            masks_ori = self.collect_targets_for_loss(
                batch, 'orientation_foreground', downscales)
            targets_ori = self.collect_targets_for_loss(
                batch, 'orientation', downscales)
            loss_fn = VonMisesLossBiternion(reduction='none')
            for pred, target, mask in zip(preds_orientation, targets_ori,
                                          masks_ori):
                p = pred.reshape(-1, 2)
                t = target.reshape(-1, 2)
                (score, _), = loss_fn([p], [t])
                score = jnp.where(mask.reshape(-1, 1), score, 0.0)
                n = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
                loss_orientation.append(jnp.sum(score))
                n_orientation.append(n)

        loss_dict = {}
        loss_dict.update({
            f'instance_center_loss_{key}': loss / jnp.maximum(n, 1)
            for key, (loss, _), n in zip(keys, loss_center, n_center)})
        loss_dict.update({
            f'instance_offset_loss_{key}': loss / jnp.maximum(n, 1)
            for key, (loss, _), n in zip(keys, loss_offset, n_offset)})
        if self._with_orientation:
            loss_dict.update({
                f'instance_orientation_loss_{key}': loss / n
                for key, loss, n in zip(keys, loss_orientation,
                                        n_orientation)})

        loss_dict[self.mark_as_total('instance_center')] = \
            self.accumulate_losses([l for l, _ in loss_center], n_center)
        loss_dict[self.mark_as_total('instance_offset')] = \
            self.accumulate_losses([l for l, _ in loss_offset], n_offset)
        if self._with_orientation:
            loss_dict[self.mark_as_total('instance_orientation')] = \
                self.accumulate_losses(loss_orientation, n_orientation)
        return loss_dict

    @append_profile_to_logs('instance_step_time')
    @append_detached_losses_to_logs()
    def training_step(self, batch, batch_idx, predictions_post):
        return self.compute_losses(batch, predictions_post), {}

    # --- validation ---------------------------------------------------------
    def _merge_with_gt_semantic(self, batch, predictions_post):
        """Merge predicted instances with the GT semantic segmentation
        (fullres) -- isolates instance-branch quality."""
        semantic = jnp.asarray(self.get_fullres(batch, 'semantic'),
                               jnp.int32)
        instance_pred = predictions_post[
            get_fullres_key('instance_segmentation_gt_foreground')]
        instance_gt = jnp.asarray(self.get_fullres(batch, 'instance'))
        fg = instance_gt != 0

        return deeplab_merge(
            semantic, instance_pred.astype(jnp.int32), fg,
            jnp.asarray(self._semantic_classes_is_thing),
            max_instances_per_category=self._max_instances_per_category,
            top_k=self._top_k_instances,
            n_classes_with_void=self._semantic_n_classes,
        )

    # --- functional metric-state API (fused eval step) ----------------------
    # The reference scores the instance branch in isolation by merging
    # predicted instances with the GT semantic and running the
    # orientation-aware PQ (ref task_helper/instance.py:35-436). Here
    # that pipeline runs INSIDE the fused eval jit: the GT side (slot
    # map of 'panoptic_fullres' against 'panoptic_segment_table_fullres'
    # and the GT angle tables) is byte-identical to the panoptic
    # helper's, so XLA CSEs it across the two PQ pipelines -- only the
    # pred-side slot map / intersection is new work. Orientation MAE
    # uses the precomputed 'panoptic_gt_angle_table' (preprocessing)
    # instead of validation_step's host dict walk; the plain
    # MAE-on-GT-instances metric (self._mae_gt) needs host-aligned id
    # dicts and stays on the non-fused validation_step path.
    def empty_metric_states(self):
        return {'pq': self._mae_pq_deeplab.empty_state()}

    def update_metric_states(self, state, batch, predictions_post):
        if state is None:
            state = self.empty_metric_states()
        # merge-with-GT-semantic composed with the PQ slot mapping:
        # the fullres merged id map never materializes and the pred
        # slots skip the bucketed table search (ops/merge.py
        # deeplab_merge_pq; state-equal to the validation_step path,
        # asserted in tests/test_pipeline.py)
        semantic = jnp.asarray(self.get_fullres(batch, 'semantic'),
                               jnp.int32)
        instance_pred = predictions_post[
            get_fullres_key('instance_segmentation_gt_foreground')]
        instance_gt = jnp.asarray(self.get_fullres(batch, 'instance'))
        merge = deeplab_merge_pq(
            semantic, instance_pred.astype(jnp.int32),
            instance_gt != 0,
            jnp.asarray(self._semantic_classes_is_thing),
            max_instances_per_category=self._max_instances_per_category,
            top_k=self._top_k_instances,
            n_classes_with_void=self._semantic_n_classes,
            pred_table_size=self._mae_pq_deeplab._pred_table_size)
        panoptic_target = jnp.asarray(
            self.get_fullres(batch, 'panoptic'), jnp.int32)
        gt_table = jnp.asarray(batch['panoptic_segment_table_fullres'])

        kwargs = {}
        ori_key = ('orientations_instance_segmentation'
                   '_gt_orientation_foreground')
        if 'panoptic_gt_angle_table' in batch \
                and ori_key in predictions_post:
            pred_angle, pred_angle_valid = pred_slot_angles(
                merge.pred_table, merge.panoptic_id_table,
                predictions_post[ori_key])
            kwargs = dict(
                gt_angle=jnp.asarray(batch['panoptic_gt_angle_table']),
                gt_angle_valid=jnp.asarray(
                    batch['panoptic_gt_angle_table_valid']),
                pred_angle=pred_angle,
                pred_angle_valid=pred_angle_valid,
            )

        pq_state = self._mae_pq_deeplab.update_state(
            state['pq'], None, panoptic_target,
            gt_table=gt_table, pred_table=merge.pred_table,
            pred_slots=merge.slots,
            gt_slots=batch.get('panoptic_gt_slots_fullres'), **kwargs)
        return {'pq': pq_state}

    def load_metric_states(self, state):
        """Adopt fused-eval states so validation_epoch_end reports
        them."""
        self._mae_pq_deeplab.state = state['pq']

    @append_profile_to_logs('instance_step_time')
    @append_detached_losses_to_logs()
    def validation_step(self, batch, batch_idx, predictions_post):
        loss_dict = self.compute_losses(batch, predictions_post)

        merge = self._merge_with_gt_semantic(batch, predictions_post)
        panoptic_target = jnp.asarray(
            self.get_fullres(batch, 'panoptic'), jnp.int32)
        gt_table = jnp.asarray(batch['panoptic_segment_table_fullres'])
        pred_table = merged_segment_table(
            merge.panoptic, self._semantic_n_classes,
            self._top_k_instances, self._max_instances_per_category,
            self._mae_pq_deeplab._pred_table_size)

        kwargs = {}
        if self._with_orientation:
            # GT angles per GT segment slot (host)
            gt_angle, gt_angle_valid = gt_slot_angles(
                np.asarray(gt_table),
                batch['panoptic_ids_to_instance_dict_fullres'],
                batch['orientations_present'])
            # predicted angles per pred segment slot (device)
            angles_by_instance = predictions_post[
                'orientations_instance_segmentation_gt_orientation_foreground']
            pred_angle, pred_angle_valid = pred_slot_angles(
                pred_table, merge.panoptic_id_table, angles_by_instance)
            kwargs = dict(
                gt_angle=jnp.asarray(gt_angle),
                gt_angle_valid=jnp.asarray(gt_angle_valid),
                pred_angle=pred_angle,
                pred_angle_valid=pred_angle_valid,
            )

            # plain MAE on GT instances
            full_gt = predictions_post[
                'orientations_gt_instance_gt_orientation_foreground']
            tgt_angles, tgt_valid = self._gt_table_target_angles(
                np.asarray(full_gt['ids']), batch['orientations_present'])
            self._mae_gt.update(
                full_gt['angles'], jnp.asarray(tgt_angles),
                valid=jnp.asarray(tgt_valid)
                & jnp.asarray(np.asarray(full_gt['valid'])))

        self._mae_pq_deeplab.update(
            merge.panoptic, panoptic_target,
            gt_table=gt_table, pred_table=pred_table, **kwargs)

        if self._store_examples and batch_idx == 0:
            self._store_example_images(batch, predictions_post)

        return loss_dict, {}

    @staticmethod
    def _gt_table_target_angles(ids_table, orientations_present):
        """Align GT orientation dicts to instance-id tables (host)."""
        B, S = ids_table.shape
        angles = np.zeros((B, S), np.float32)
        valid = np.zeros((B, S), bool)
        for b in range(B):
            ori = orientations_present[b]
            for s in range(S):
                iid = int(ids_table[b, s])
                if iid in (0, SEGMENT_TABLE_PAD):
                    continue
                if iid in ori:
                    angles[b, s] = float(ori[iid])
                    valid[b, s] = True
        return angles, valid

    def _store_example_images(self, batch, predictions_post):
        from ..visualization import (
            visualize_instance_center_pil, visualize_instance_offset_pil,
            visualize_instance_pil, visualize_orientation_pil,
        )
        center, offset, *orientation = predictions_post['instance_output']
        self._examples['instance_center_heatmap_example_batch_0_0'] = \
            visualize_instance_center_pil(
                center_img=np.asarray(center[0, ..., 0]), min_=0, max_=1)
        self._examples['instance_offset_example_batch_0_0'] = \
            visualize_instance_offset_pil(np.asarray(offset[0]))
        meta = predictions_post['instance_segmentation_gt_meta']
        centers = [tuple(yx) for yx, v in
                   zip(np.asarray(meta['centers_yx'][0]),
                       np.asarray(meta['valid'][0])) if v]
        self._examples['instance_predicted_centers_example_batch_0_0'] = \
            visualize_instance_center_pil(
                centers=centers, height=center.shape[1],
                width=center.shape[2])
        self._examples['instance_instance_example_batch_0_0'] = \
            visualize_instance_pil(np.asarray(
                predictions_post['instance_segmentation_gt_foreground'][0]))
        if orientation:
            self._examples['orientation_example_batch_0_0'] = \
                visualize_orientation_pil(np.asarray(orientation[0][0]))

    @append_profile_to_logs('instance_epoch_end_time')
    def validation_epoch_end(self):
        artifacts, logs = {}, {}
        results = self._mae_pq_deeplab.compute(suffix='_deeplab')
        for key, value in results.items():
            if np.ndim(value) == 0:
                logs[f'instance_{key}'] = value
            else:
                artifacts[f'instance_{key}'] = value
        self._mae_pq_deeplab.reset()

        if self._with_orientation:
            mae_rad, mae_deg = self._mae_gt.compute()
            logs['orientation_mae_gt_rad'] = mae_rad
            logs['orientation_mae_gt_deg'] = mae_deg
            self._mae_gt.reset()

        return artifacts, self._examples, logs
