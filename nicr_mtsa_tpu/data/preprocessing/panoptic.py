"""GT panoptic target generation via naive merge (reference
data/preprocessing/panoptic.py:16-85).

In addition to the reference keys, this also stores a fixed-size
sorted `panoptic_segment_table` per sample -- the device-side PQ
metric uses it to compress unbounded panoptic ids to dense segment
slots without an on-device sort (see metrics/pq.py).
"""
from typing import Any, Dict, Tuple, Union

import numpy as np

from ...ops.merge_np import naive_merge_semantic_and_instance_np
from ...types import SampleType
from .._types import CollateIgnoredDict
from .base import PreprocessingBase
from .utils import _keys_available


MAX_INSTANCES_PER_CATEGORY = 1 << 16    # hypersim has >256 instances/image
DEFAULT_SEGMENT_TABLE_SIZE = 256


class PanopticTargetGenerator(PreprocessingBase):
    def __init__(
        self,
        semantic_classes_is_thing: Union[None, Tuple[bool, ...]] = None,
        use_is_thing_from_meta: bool = False,
        multiscale_processing: bool = True,
        segment_table_size: int = DEFAULT_SEGMENT_TABLE_SIZE,
    ) -> None:
        if semantic_classes_is_thing is None:
            self._thing_class_ids = None
        else:
            assert not use_is_thing_from_meta
            self._thing_class_ids = np.flatnonzero(
                np.asarray(semantic_classes_is_thing))
        self._use_is_thing_from_meta = use_is_thing_from_meta
        self._void_label = 0
        self._segment_table_size = segment_table_size

        super().__init__(
            multiscale_processing=multiscale_processing,
            fixed_parameters=dict(
                max_instances_per_category=MAX_INSTANCES_PER_CATEGORY,
                void_label=self._void_label))

    def _merge(self, semantic, instance, thing_ids):
        return naive_merge_semantic_and_instance_np(
            semantic, instance.astype(np.uint16),
            max_instances_per_category=MAX_INSTANCES_PER_CATEGORY,
            thing_ids=thing_ids, void_label=self._void_label)

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        if not _keys_available(sample, ('instance', 'semantic')):
            return sample, {}

        thing_ids = self._thing_class_ids
        if thing_ids is None and self._use_is_thing_from_meta:
            thing_ids = np.flatnonzero(np.asarray(
                sample['meta']['semantic_label_list'].classes_is_thing))

        panoptic_targets, panoptic_targets_id_dicts = self._merge(
            sample['semantic'], sample['instance'], thing_ids)

        sample['panoptic'] = panoptic_targets
        sample['panoptic_ids_to_instance_dict'] = \
            CollateIgnoredDict(panoptic_targets_id_dicts)

        # fixed-size sorted segment table for the sort-free device PQ;
        # padded at the end with int32 max so the table stays sorted
        # (contract of ops/segments.py ids_to_slots)
        from ...ops.segments import SEGMENT_TABLE_PAD
        ids = np.unique(panoptic_targets).astype(np.int64)
        table = np.full((self._segment_table_size,),
                        np.int64(SEGMENT_TABLE_PAD), dtype=np.int64)
        n = min(len(ids), self._segment_table_size)
        table[:n] = ids[:n]
        sample['panoptic_segment_table'] = table
        if len(ids) > self._segment_table_size:
            # should not happen for the supported datasets; record it
            dyn_overflow = len(ids) - self._segment_table_size
        else:
            dyn_overflow = 0

        # full-resolution panoptic targets (the reference obtains these
        # by running the generator before resizing; the task helpers
        # evaluate PQ at full resolution against them)
        sem_fullres = sample.get('semantic_fullres')
        ins_fullres = sample.get('instance_fullres')
        if (sem_fullres is not None and ins_fullres is not None
                and 'panoptic_fullres' not in sample):
            pan_fullres, id_dict_fullres = self._merge(
                sem_fullres, ins_fullres, thing_ids)
            sample['panoptic_fullres'] = pan_fullres
            sample['panoptic_ids_to_instance_dict_fullres'] = \
                CollateIgnoredDict(id_dict_fullres)
            ids_f = np.unique(pan_fullres).astype(np.int64)
            table_f = np.full((self._segment_table_size,),
                              np.int64(SEGMENT_TABLE_PAD), dtype=np.int64)
            table_f[:min(len(ids_f), self._segment_table_size)] = \
                ids_f[:self._segment_table_size]
            sample['panoptic_segment_table_fullres'] = table_f

            # per-slot GT orientation angles aligned to the fullres
            # segment table: lets the fused eval step compute the
            # orientation MAE fully on device
            # (tasks/panoptic.update_metric_states)
            if 'orientations' in sample:
                angles = np.zeros((self._segment_table_size,), np.float32)
                valid = np.zeros((self._segment_table_size,), bool)
                for slot, pan_id in enumerate(table_f):
                    ins_id = id_dict_fullres.get(int(pan_id))
                    if ins_id is not None \
                            and ins_id in sample['orientations']:
                        angles[slot] = float(sample['orientations'][ins_id])
                        valid[slot] = True
                sample['panoptic_gt_angle_table'] = angles
                sample['panoptic_gt_angle_table_valid'] = valid

        return sample, {
            'thing_semantic_classes': thing_ids,
            'segment_table_overflow': dyn_overflow,
        }
