"""Panoptic task helper (reference task_helper/panoptic.py:28-212):
validation-only -- PQ/SQ/RQ (+ orientation MAE) on the merged panoptic
prediction, plus mIoU of the panoptic-derived semantic."""
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.preprocessing.resize import get_fullres_key
from ..metrics import (
    MeanIntersectionOverUnion, PanopticQualityWithOrientationMAE,
    confusion_matrix,
)
from ..ops.segments import merged_segment_table
from ._orientation_tables import gt_slot_angles, pred_slot_angles
from .base import TaskHelperBase, append_profile_to_logs


class PanopticTaskHelper(TaskHelperBase):
    def __init__(
        self,
        semantic_n_classes: int,                   # with void
        semantic_classes_is_thing: Tuple[bool, ...],
        semantic_label_list=None,                  # for visualization
        store_examples: bool = False,
    ) -> None:
        self._semantic_n_classes = semantic_n_classes
        self._semantic_classes_is_thing = \
            np.asarray(semantic_classes_is_thing, dtype=bool)
        self._semantic_label_list = semantic_label_list
        self._max_instances_per_category = 1 << 16
        self._with_orientation = False
        self._examples: Dict[str, Any] = {}
        self._store_examples = store_examples
        self.initialize()

    def initialize(self) -> None:
        self._mae_pq_deeplab = PanopticQualityWithOrientationMAE(
            num_categories=self._semantic_n_classes,
            ignored_label=0,
            max_instances_per_category=self._max_instances_per_category,
            offset=256 ** 3,
            is_thing=self._semantic_classes_is_thing,
        )
        self._metric_iou = MeanIntersectionOverUnion(
            n_classes=self._semantic_n_classes,
            ignore_first_class=True)      # ignore void for miou
        self._metric_iou.reset()

    @append_profile_to_logs('panoptic_step_time')
    def training_step(self, batch, batch_idx, predictions_post):
        # merging + PQ happen at validation only
        return {}, {}

    # --- functional metric-state API (fused eval step) ----------------------
    # Orientation MAE in fused mode requires precomputed GT angle
    # tables in the batch ('panoptic_gt_angle_table'/'_valid', aligned
    # to 'panoptic_segment_table_fullres'); otherwise only PQ + mIoU
    # states update inside the jit.
    def empty_metric_states(self):
        return {'pq': self._mae_pq_deeplab.empty_state(),
                'miou': self._metric_iou.empty_state()}

    def update_metric_states(self, state, batch, predictions_post):
        if state is None:
            state = self.empty_metric_states()
        panoptic_target = jnp.asarray(
            self.get_fullres(batch, 'panoptic'), jnp.int32)
        gt_table = jnp.asarray(batch['panoptic_segment_table_fullres'])
        panoptic_pred = predictions_post[
            get_fullres_key('panoptic_segmentation_deeplab')] \
            .astype(jnp.int32)
        pred_slots = None
        slots_key = get_fullres_key('panoptic_segmentation_deeplab_slots')
        if slots_key in predictions_post \
                and 'panoptic_segmentation_deeplab_slot_table' \
                in predictions_post:
            # merge-produced slot map (nearest-resized to fullres like
            # the id map itself -- slots commute with nearest resize):
            # skips merged_segment_table + the bucketed table search
            pred_table = predictions_post[
                'panoptic_segmentation_deeplab_slot_table']
            pred_slots = predictions_post[slots_key].astype(jnp.int32)
        else:
            # sort-free segment table: merged maps have rank <= K ids
            top_k = predictions_post[
                'panoptic_segmentation_deeplab_ids'].shape[1] - 1
            pred_table = merged_segment_table(
                panoptic_pred, self._semantic_n_classes, top_k,
                self._max_instances_per_category,
                self._mae_pq_deeplab._pred_table_size)

        kwargs = {}
        if 'panoptic_gt_angle_table' in batch and \
                'orientations_panoptic_segmentation_deeplab_instance' \
                in predictions_post:
            pred_angle, pred_angle_valid = pred_slot_angles(
                pred_table,
                predictions_post['panoptic_segmentation_deeplab_ids'],
                predictions_post[
                    'orientations_panoptic_segmentation_deeplab_instance'])
            kwargs = dict(
                gt_angle=batch['panoptic_gt_angle_table'],
                gt_angle_valid=batch['panoptic_gt_angle_table_valid'],
                pred_angle=pred_angle, pred_angle_valid=pred_angle_valid)

        pq_state = self._mae_pq_deeplab.update_state(
            state['pq'], panoptic_pred, panoptic_target,
            gt_table=gt_table, pred_table=pred_table,
            pred_slots=pred_slots,
            gt_slots=batch.get('panoptic_gt_slots_fullres'), **kwargs)

        deeplab_semantic = panoptic_pred // self._max_instances_per_category
        target_semantic = jnp.asarray(
            self.get_fullres(batch, 'semantic'), jnp.int32)
        miou_state = self._metric_iou.update_state(
            state['miou'], deeplab_semantic, target_semantic)
        return {'pq': pq_state, 'miou': miou_state}

    def load_metric_states(self, state):
        """Adopt fused-eval states so validation_epoch_end reports
        them."""
        self._mae_pq_deeplab.state = state['pq']
        self._metric_iou.state = state['miou']

    @append_profile_to_logs('panoptic_step_time')
    def validation_step(self, batch, batch_idx, predictions_post):
        self._with_orientation = 'orientations_present' in batch

        panoptic_target = jnp.asarray(
            self.get_fullres(batch, 'panoptic'), jnp.int32)
        gt_table = jnp.asarray(batch['panoptic_segment_table_fullres'])

        panoptic_pred = predictions_post[
            get_fullres_key('panoptic_segmentation_deeplab')].astype(jnp.int32)
        id_table = predictions_post['panoptic_segmentation_deeplab_ids']

        pred_table = merged_segment_table(
            panoptic_pred, self._semantic_n_classes,
            id_table.shape[1] - 1, self._max_instances_per_category,
            self._mae_pq_deeplab._pred_table_size)

        kwargs = {}
        if self._with_orientation:
            gt_angle, gt_angle_valid = gt_slot_angles(
                np.asarray(gt_table),
                batch['panoptic_ids_to_instance_dict_fullres'],
                batch['orientations_present'])
            angles_by_instance = predictions_post[
                'orientations_panoptic_segmentation_deeplab_instance']
            pred_angle, pred_angle_valid = pred_slot_angles(
                pred_table, id_table, angles_by_instance)
            kwargs = dict(
                gt_angle=jnp.asarray(gt_angle),
                gt_angle_valid=jnp.asarray(gt_angle_valid),
                pred_angle=pred_angle,
                pred_angle_valid=pred_angle_valid,
            )

        self._mae_pq_deeplab.update(
            panoptic_pred, panoptic_target,
            gt_table=gt_table, pred_table=pred_table, **kwargs)

        # mIoU of the panoptic-derived semantic (merging may have
        # changed classes)
        deeplab_semantic = panoptic_pred // self._max_instances_per_category
        target_semantic = jnp.asarray(
            self.get_fullres(batch, 'semantic'), jnp.int32)
        self._metric_iou.update(deeplab_semantic, target_semantic)

        if self._store_examples and batch_idx == 0:
            self._store_example_images(predictions_post)

        return {}, {}

    def _store_example_images(self, predictions_post):
        from ..visualization import (
            visualize_heatmap_pil, visualize_instance_pil,
            visualize_panoptic_pil, visualize_semantic_pil,
        )
        pan = np.asarray(predictions_post['panoptic_segmentation_deeplab'][0])
        self._examples['panoptic_example_batch_deeplab_0_0'] = \
            visualize_panoptic_pil(
                pan, max_instances=self._max_instances_per_category,
                classes_is_thing=self._semantic_classes_is_thing)
        self._examples['panoptic_example_batch_deeplab_semantic_0_0'] = \
            visualize_semantic_pil(pan // self._max_instances_per_category)
        self._examples['panoptic_example_batch_deeplab_instance_0_0'] = \
            visualize_instance_pil(np.asarray(predictions_post[
                'panoptic_segmentation_deeplab_instance_idx'][0]))
        for score_key in ('semantic_score', 'instance_score',
                          'panoptic_score'):
            full_key = f'panoptic_segmentation_deeplab_{score_key}'
            if full_key in predictions_post:
                self._examples[
                    f'panoptic_example_batch_deeplab_{score_key}_0_0'] = \
                    visualize_heatmap_pil(
                        np.asarray(predictions_post[full_key][0]),
                        min_=0, max_=1)

    @append_profile_to_logs('panoptic_epoch_end_time')
    def validation_epoch_end(self):
        artifacts, logs = {}, {}
        results = self._mae_pq_deeplab.compute(suffix='_deeplab')
        for key, value in results.items():
            if np.ndim(value) == 0:
                logs[f'panoptic_{key}'] = value
            else:
                artifacts[f'panoptic_{key}'] = value
        self._mae_pq_deeplab.reset()

        artifacts['panoptic_deeplab_semantic_cm'] = \
            np.asarray(self._metric_iou.state)
        miou, ious = self._metric_iou.compute(return_ious=True)
        logs['panoptic_deeplab_semantic_miou'] = miou
        artifacts['panoptic_deeplab_semantic_ious_per_class'] = ious
        self._metric_iou.reset()

        return artifacts, self._examples, logs
