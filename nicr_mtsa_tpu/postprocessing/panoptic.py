"""Panoptic postprocessing (reference
model/postprocessing/panoptic.py:23-316): semantic + instance
postprocessing, thing-foreground derivation, on-device deeplab merge,
optional dense scores, full-resolution outputs, per-panoptic-instance
orientations.

Everything runs on device with fixed shapes: the reference's forced
`.cpu()` merge and python score loops (panoptic.py:143-239) become the
K-table merge kernel (ops/merge.py) and gather/segment-mean ops."""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.preprocessing.resize import get_fullres_key
from ..ops.grouping import instance_orientations
from ..ops.lookup import bool_table_lookup, value_table_lookup
from ..ops.merge import deeplab_merge_pq
from .base import DensePostprocessingBase
from .instance import InstancePostprocessing
from .semantic import SemanticPostprocessing


class PanopticPostprocessing(DensePostprocessingBase):
    def __init__(
        self,
        semantic_postprocessing: SemanticPostprocessing,
        instance_postprocessing: InstancePostprocessing,
        semantic_classes_is_thing: Tuple[bool, ...],
        semantic_class_has_orientation: Tuple[bool, ...],
        normalized_offset: bool = True,
        compute_scores: bool = False,
        **kwargs,
    ) -> None:
        self._semantic_postprocessing = semantic_postprocessing
        self._instance_postprocessing = instance_postprocessing

        # class tables; the *_panoptic variants include void at index 0
        is_thing = np.asarray(semantic_classes_is_thing, dtype=bool)
        self._thing_class_table = jnp.asarray(is_thing)          # no void
        self._thing_class_table_panoptic = jnp.asarray(
            np.concatenate([[False], is_thing]))
        has_ori = np.asarray(semantic_class_has_orientation, dtype=bool)
        self._orientation_class_table_panoptic = jnp.asarray(
            np.concatenate([[False], has_ori]))
        self._n_classes_with_void = len(is_thing) + 1

        self._normalized_offset = normalized_offset
        self._compute_scores = compute_scores
        self._max_instances_per_category = 1 << 16

    @property
    def max_instances_per_category(self):
        return self._max_instances_per_category

    def _postprocess_training(self, data, batch):
        (s_output, i_output), (s_side, i_side) = data
        r_dict = self._semantic_postprocessing._postprocess_training(
            (s_output, s_side), batch)
        r_dict.update(self._instance_postprocessing._postprocess_training(
            (i_output, i_side), batch))
        return r_dict

    def _postprocess_inference(self, data, batch):
        (s_output, i_output), (s_side, i_side) = data

        r_dict = self._semantic_postprocessing._postprocess_inference(
            (s_output, s_side), batch)
        r_dict.update(self._instance_postprocessing._postprocess_inference(
            (i_output, i_side), batch))

        post = self._instance_postprocessing
        with_orientation = (3 == len(i_output))
        if with_orientation:
            center_heatmap, center_offset, orientation = i_output
        else:
            center_heatmap, center_offset = i_output
        center_offset_ = post._denormalize(center_offset)

        # thing-foreground mask from the semantic prediction (computed
        # at working resolution, before fullres upsampling)
        semantic_idx = r_dict['semantic_segmentation_idx']   # (B, H, W)
        foreground_mask = bool_table_lookup(semantic_idx,
                                            self._thing_class_table)
        r_dict['panoptic_foreground_mask'] = foreground_mask

        # re-group instances under the panoptic foreground
        result = post._get_instance_segmentation(
            center_heatmap, center_offset_, foreground_mask)
        instance_segmentation = result.segmentation

        # deeplab merge on device (semantic + 1: void missing in preds)
        # -- the _pq variant also emits the per-pixel PQ slot map +
        # segment table, so the metric consumers skip the fullres
        # bucketed table search (slots commute with the nearest
        # fullres resize; unused outputs are DCE'd in serving)
        merge = deeplab_merge_pq(
            semantic_idx + 1,
            instance_segmentation,
            foreground_mask,
            self._thing_class_table_panoptic,
            max_instances_per_category=self._max_instances_per_category,
            top_k=post._top_k_instances,
            n_classes_with_void=self._n_classes_with_void,
        )
        panoptic_seg = merge.panoptic
        r_dict['panoptic_segmentation_deeplab'] = panoptic_seg
        # (B, K+1) raw-instance-id -> panoptic id (the reference's
        # per-sample {panoptic_id: instance_id} dict, inverted + padded)
        r_dict['panoptic_segmentation_deeplab_ids'] = \
            merge.panoptic_id_table
        r_dict['panoptic_segmentation_deeplab_slots'] = merge.slots
        r_dict['panoptic_segmentation_deeplab_slot_table'] = \
            merge.pred_table

        pan_seg_semantic = panoptic_seg // self._max_instances_per_category
        r_dict['panoptic_segmentation_deeplab_semantic_idx'] = \
            pan_seg_semantic
        # raw instance ids stay unique; merged ids are per-class
        r_dict['panoptic_segmentation_deeplab_instance_idx'] = \
            instance_segmentation
        r_dict['panoptic_segmentation_deeplab_instance_meta'] = {
            'centers_yx': result.centers.yx,
            'scores': result.scores,
            'valid': result.centers.valid,
            'areas': result.areas,
            'panoptic_ids': merge.panoptic_id_table,
            'semantic_idx': merge.instance_class,
        }

        if self._compute_scores:
            r_dict = self._add_scores(
                r_dict, panoptic_seg, pan_seg_semantic,
                instance_segmentation, result, merge, batch)

        # fullres crops/resizes
        crop_slices, resize_shape = self._fullres_args(batch, 'instance')

        for key in ('panoptic_segmentation_deeplab',
                    'panoptic_segmentation_deeplab_instance_idx',
                    'panoptic_segmentation_deeplab_semantic_idx',
                    'panoptic_segmentation_deeplab_slots'):
            r_dict[get_fullres_key(key)] = \
                self._crop_to_valid_region_and_resize_prediction(
                    r_dict[key], crop_slices, resize_shape, mode='nearest')
        if self._compute_scores:
            for key in ('panoptic_segmentation_deeplab_semantic_score',
                        'panoptic_segmentation_deeplab_instance_score',
                        'panoptic_segmentation_deeplab_panoptic_score'):
                r_dict[get_fullres_key(key)] = \
                    self._crop_to_valid_region_and_resize_prediction(
                        r_dict[key], crop_slices, resize_shape,
                        mode='nearest')

        if with_orientation:
            # orientation foreground from panoptic-derived semantic
            fg_ori = bool_table_lookup(
                jnp.clip(pan_seg_semantic, 0,
                         self._n_classes_with_void - 1),
                self._orientation_class_table_panoptic)
            r_dict['orientations_panoptic_segmentation_deeplab_instance'] = \
                instance_orientations(
                    orientation,
                    r_dict['panoptic_segmentation_deeplab_instance_idx'],
                    fg_ori, top_k=post._top_k_instances)

        return r_dict

    def _add_scores(self, r_dict, panoptic_seg, pan_seg_semantic,
                    instance_segmentation, result, merge, batch):
        """Dense semantic/instance/panoptic scores (YOLO /
        Panoptic-DeepLab style, reference panoptic.py:171-239): stuff
        pixels carry the semantic score; thing pixels carry
        instance_score * mean semantic score of their instance."""
        K = self._instance_postprocessing._top_k_instances
        semantic_scores = r_dict['semantic_softmax_scores']  # (B,H,W,C)

        void_mask = pan_seg_semantic == 0
        gather_idx = jnp.where(void_mask, 0, pan_seg_semantic - 1)
        oh = jax.nn.one_hot(gather_idx, semantic_scores.shape[-1],
                            dtype=semantic_scores.dtype)
        sem_score = jnp.sum(oh * semantic_scores, axis=-1)
        sem_score = jnp.where(void_mask, 0.0, sem_score)
        r_dict['panoptic_segmentation_deeplab_semantic_score'] = sem_score

        B, H, W = instance_segmentation.shape
        flat_ins = instance_segmentation.reshape(B, -1)

        # valid-instance pixels = pixels whose panoptic id is a thing id
        valid_instance = merge.panoptic_id_table != 0        # (B, K+1)
        px_valid = value_table_lookup(
            flat_ins, valid_instance.astype(jnp.int32)) > 0

        # per-pixel instance score (0-padded table; slot 0 = bg -> 0)
        score_table = jnp.concatenate(
            [jnp.zeros((B, 1), result.scores.dtype), result.scores], axis=1)
        inst_score = value_table_lookup(flat_ins, score_table)
        inst_score = jnp.where(px_valid, inst_score, 0.0)
        r_dict['panoptic_segmentation_deeplab_instance_score'] = \
            inst_score.reshape(B, H, W)

        # mean semantic score per instance over its panoptic pixels
        flat_sem_score = sem_score.reshape(B, -1)
        masked_ins = jnp.where(px_valid, flat_ins, 0)
        onehot = jax.nn.one_hot(masked_ins, K + 1, dtype=jnp.float32)
        sums = jnp.einsum('bpk,bp->bk', onehot, flat_sem_score)
        counts = jnp.maximum(jnp.sum(onehot, axis=1), 1.0)
        mean_sem = sums / counts                              # (B, K+1)
        px_mean_sem = value_table_lookup(flat_ins, mean_sem)

        pan_score = jnp.where(px_valid, inst_score * px_mean_sem,
                              flat_sem_score)
        r_dict['panoptic_segmentation_deeplab_panoptic_score'] = \
            pan_score.reshape(B, H, W)

        meta = r_dict['panoptic_segmentation_deeplab_instance_meta']
        meta['semantic_score'] = mean_sem[:, 1:]
        meta['panoptic_score'] = result.scores * mean_sem[:, 1:]
        return r_dict
