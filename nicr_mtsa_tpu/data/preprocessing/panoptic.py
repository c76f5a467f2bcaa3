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
        self._thing_class_ids = None
        if semantic_classes_is_thing is not None:
            assert not use_is_thing_from_meta
            self._thing_class_ids = np.where(semantic_classes_is_thing)[0]
        self._use_is_thing_from_meta = use_is_thing_from_meta
        if self._use_is_thing_from_meta:
            assert self._thing_class_ids is None

        self._max_instances_per_category = MAX_INSTANCES_PER_CATEGORY
        self._void_label = 0
        self._segment_table_size = segment_table_size

        super().__init__(
            fixed_parameters={
                'max_instances_per_category': self._max_instances_per_category,
                'void_label': self._void_label,
            },
            multiscale_processing=multiscale_processing,
        )

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        if not _keys_available(sample, ('instance', 'semantic')):
            return sample, {}

        thing_ids = self._thing_class_ids
        if thing_ids is None and self._use_is_thing_from_meta:
            thing_ids = np.where(
                sample['meta']['semantic_label_list'].classes_is_thing
            )[0]

        panoptic_targets, panoptic_targets_id_dicts = \
            naive_merge_semantic_and_instance_np(
                sample['semantic'],
                sample['instance'].astype(np.uint16),
                max_instances_per_category=self._max_instances_per_category,
                thing_ids=thing_ids,
                void_label=self._void_label,
            )

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
            pan_fullres, id_dict_fullres = \
                naive_merge_semantic_and_instance_np(
                    sem_fullres,
                    ins_fullres.astype(np.uint16),
                    max_instances_per_category=self._max_instances_per_category,
                    thing_ids=thing_ids,
                    void_label=self._void_label,
                )
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
