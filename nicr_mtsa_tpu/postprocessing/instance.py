"""Instance postprocessing (reference
model/postprocessing/instance.py:24-468): center NMS + offset-vote
pixel grouping + per-instance orientation readout, on device.

Ragged outputs of the reference become padded arrays:
- instance meta dicts -> {'centers_yx', 'areas', 'scores', 'valid'},
- per-instance orientation dicts -> {'ids', 'angles', 'valid'} tables
  (for GT instance maps with arbitrary ids) or (B, K+1) angle arrays
  indexed by raw predicted instance id."""
from typing import Optional, Union

import jax
import jax.numpy as jnp

from ..data.preprocessing.resize import get_fullres_key
from ..ops.grouping import (
    denormalize_offsets,
    get_instance_segmentation,
    instance_orientations,
)
from ..ops.segments import SEGMENT_TABLE_PAD, ids_to_slots, unique_table
from .base import DensePostprocessingBase


def segment_orientation_table(
    orientation: jnp.ndarray,      # (B, H, W, 2) biternion
    ids_map: jnp.ndarray,          # (B, H, W) arbitrary integer ids
    foreground_mask,               # (B, H, W) bool or None
    table_size: int = 128,
):
    """Average orientation per segment of an id map with arbitrary ids
    (e.g. GT instance maps): compress ids to a sorted table, then
    segment-sum the biternion channels. Returns
    {'ids': (B, S), 'angles': (B, S), 'valid': (B, S)}."""
    B = ids_map.shape[0]
    flat_ids = ids_map.reshape(B, -1).astype(jnp.int32)
    table = unique_table(flat_ids, table_size)
    S = table.shape[-1]

    masked_ids = flat_ids
    if foreground_mask is not None:
        fg = foreground_mask
        if fg.ndim == 4:
            fg = fg[..., 0]
        # id 0 = background; rely on slot-of-0 if present, else drop via
        # an out-of-table marker
        masked_ids = jnp.where(fg.reshape(B, -1), flat_ids, -1)

    slots = ids_to_slots(masked_ids, table)            # S = dropped
    onehot = jax.nn.one_hot(slots, S + 1, dtype=jnp.float32)
    flat_ori = orientation.reshape(B, -1, 2).astype(jnp.float32)
    sums = jnp.einsum('bps,bpc->bsc', onehot, flat_ori,
                      preferred_element_type=jnp.float32)[:, :S]
    counts = jnp.sum(onehot, axis=1)[:, :S]
    angles = jnp.arctan2(sums[..., 1], sums[..., 0])
    valid = (table != SEGMENT_TABLE_PAD) & (table != 0) & (counts > 0)
    return {'ids': table, 'angles': angles, 'valid': valid}


class InstancePostprocessing(DensePostprocessingBase):
    def __init__(
        self,
        heatmap_threshold: float = 0.1,
        heatmap_nms_kernel_size: int = 3,
        heatmap_apply_foreground_mask: bool = False,
        top_k_instances: int = 64,
        normalized_offset: bool = True,
        offset_distance_threshold: Union[None, int] = None,
        **kwargs,
    ) -> None:
        assert heatmap_nms_kernel_size % 2 == 1
        assert top_k_instances <= 254
        self._heatmap_threshold = heatmap_threshold
        self._heatmap_nms_kernel_size = heatmap_nms_kernel_size
        self._heatmap_apply_foreground_mask = heatmap_apply_foreground_mask
        self._top_k_instances = top_k_instances
        self._normalized_offset = normalized_offset
        self._offset_distance_threshold = offset_distance_threshold
        self.debug = kwargs.get('debug', False)

    # --- jittable cores -----------------------------------------------------
    def _denormalize(self, center_offset):
        if not self._normalized_offset:
            return center_offset
        h, w = center_offset.shape[1:3]
        return denormalize_offsets(center_offset, h, w)

    def _get_instance_segmentation(self, center_heatmap, center_offset,
                                   foreground_mask):
        """center_offset must be UNnormalized (pixel units)."""
        return get_instance_segmentation(
            center_heatmap, center_offset, foreground_mask,
            threshold=self._heatmap_threshold,
            kernel_size=self._heatmap_nms_kernel_size,
            top_k=self._top_k_instances,
            offset_distance_threshold=self._offset_distance_threshold,
            heatmap_apply_foreground_mask=self._heatmap_apply_foreground_mask,
        )

    def _get_instance_orientation(self, orientation, instance_segmentation,
                                  foreground_mask):
        """Predicted instance maps (ids 0..K): (B, K+1) angle array."""
        return instance_orientations(
            orientation, instance_segmentation, foreground_mask,
            top_k=self._top_k_instances)

    # ------------------------------------------------------------------------
    def _postprocess_training(self, data, batch):
        output, side_outputs = data
        return {'instance_output': output,
                'instance_side_outputs': side_outputs}

    def _postprocess_inference(self, data, batch):
        output, side_outputs = data
        with_orientation = (3 == len(output))
        if with_orientation:
            center_heatmap, center_offset, orientation = output
        else:
            center_heatmap, center_offset = output

        r_dict = {
            'instance_output': output,
            'instance_side_outputs': side_outputs,
            'instance_centers': center_heatmap,
            'instance_offsets': center_offset,
        }

        center_offset_ = self._denormalize(center_offset)

        # i-1: segmentation under the GT foreground (dataset evaluation)
        if 'instance_foreground' in batch:
            fg = batch['instance_foreground']
            result = self._get_instance_segmentation(
                center_heatmap, center_offset_, fg)
            r_dict['instance_segmentation_gt_foreground'] = \
                result.segmentation
            r_dict['instance_segmentation_gt_meta'] = {
                'centers_yx': result.centers.yx,
                'scores': result.scores,
                'valid': result.centers.valid,
                'areas': result.areas,
            }
            crop_slices, resize_shape = self._fullres_args(batch, 'instance')
            r_dict[get_fullres_key('instance_segmentation_gt_foreground')] = \
                self._crop_to_valid_region_and_resize_prediction(
                    result.segmentation, crop_slices, resize_shape,
                    mode='nearest')

        # i-2: everything foreground (debugging)
        if self.debug:
            all_fg = jnp.ones(center_heatmap.shape[:3], dtype=bool)
            result = self._get_instance_segmentation(
                center_heatmap, center_offset_, all_fg)
            r_dict['instance_segmentation_all_foreground'] = \
                result.segmentation
            crop_slices, resize_shape = self._fullres_args(batch, 'instance')
            r_dict[get_fullres_key('instance_segmentation_all_foreground')] = \
                self._crop_to_valid_region_and_resize_prediction(
                    result.segmentation, crop_slices, resize_shape,
                    mode='nearest')

        if not with_orientation:
            return r_dict

        # o-1: GT instances + GT orientation foreground
        if all(k in batch for k in ('instance', 'orientation_foreground')):
            r_dict['orientations_gt_instance_gt_orientation_foreground'] = \
                segment_orientation_table(
                    orientation, batch['instance'],
                    batch['orientation_foreground'])

        # o-2: predicted instances + GT orientation foreground
        if all(k in batch for k in ('instance_foreground',
                                    'orientation_foreground')):
            r_dict['orientations_instance_segmentation'
                   '_gt_orientation_foreground'] = \
                self._get_instance_orientation(
                    orientation,
                    r_dict['instance_segmentation_gt_foreground'],
                    batch['orientation_foreground'])

        if self.debug:
            r_dict['orientations_gt_instance'] = segment_orientation_table(
                orientation, batch['instance'], None)
            r_dict['orientations_instance_segmentation'] = \
                self._get_instance_orientation(
                    orientation,
                    r_dict['instance_segmentation_gt_foreground'], None)

        return r_dict
