"""Host (numpy) panoptic merge twins.

These are the reference-semantics implementations of the semantic +
instance -> panoptic merge (reference utils/panoptic_merge.py:43-169),
used for GT target generation on the host and as the golden model for
the on-device fixed-shape merge in `ops/merge.py`:

- `naive_merge_semantic_and_instance_np`: no majority vote; instances
  crossing class borders are split per class (used for GT generation).
- `deeplab_merge_semantic_and_instance_np`: majority vote per instance
  within the thing mask (Panoptic-DeepLab style; used for predictions).

Panoptic ids are `class_id * max_instances_per_category + new_id`,
with per-class new ids enumerated from 1 in ascending instance-id
order; stuff classes get `class_id * max_instances_per_category`.
"""
from typing import Dict, List, Sequence, Tuple

from collections import Counter

import numpy as np


def naive_merge_semantic_and_instance_np(
    sem_seg: np.ndarray,
    ins_seg: np.ndarray,
    max_instances_per_category: int,
    thing_ids: Sequence[int],
    void_label: int,
) -> Tuple[np.ndarray, Dict[int, int]]:
    assert sem_seg.dtype in (np.uint8, np.uint16)
    assert ins_seg.dtype == np.uint16
    assert void_label >= 0

    pan_seg = np.zeros_like(sem_seg, dtype=np.uint32) + void_label
    class_id_tracker: Counter = Counter()
    id_dict: Dict[int, int] = {}
    thing_id_set = (set(int(t) for t in thing_ids)
                    if thing_ids is not None else set())

    for ins_id in np.unique(ins_seg):
        if ins_id == 0:
            continue
        thing_mask = ins_seg == ins_id
        if not thing_mask.any():
            continue
        # naive: take every semantic label covered by this instance; an
        # instance spanning several classes is split into several segments
        for class_id in np.unique(sem_seg[thing_mask]):
            if class_id == 0:
                continue
            class_id = np.uint32(class_id)
            class_id_tracker[int(class_id)] += 1    # first id is 1
            new_ins_id = class_id_tracker[int(class_id)]
            panoptic_id = class_id * max_instances_per_category + new_ins_id
            id_dict[int(panoptic_id)] = int(ins_id)
            pan_seg[(sem_seg == class_id) & thing_mask] = panoptic_id

    # paste stuff on instance-free pixels
    for class_id in np.unique(sem_seg):
        if class_id == 0 or int(class_id) in thing_id_set:
            continue
        class_id = np.uint32(class_id)
        stuff_mask = (sem_seg == class_id) & (ins_seg == 0)
        pan_seg[stuff_mask] = class_id * max_instances_per_category

    return pan_seg, id_dict


def deeplab_merge_semantic_and_instance_np(
    sem_seg: np.ndarray,
    ins_seg: np.ndarray,
    semantic_thing_seg: np.ndarray,
    max_instances_per_category: int,
    thing_ids: Sequence[int],
    void_label: int,
) -> Tuple[np.ndarray, Dict[int, int]]:
    assert sem_seg.dtype in (np.uint8, np.uint16)
    assert ins_seg.dtype == np.uint16
    assert void_label >= 0

    pan_seg = np.zeros_like(sem_seg, dtype=np.uint32) + void_label
    is_thing = (ins_seg > 0) & (semantic_thing_seg > 0)

    class_id_tracker: Counter = Counter()
    id_dict: Dict[int, int] = {}
    thing_id_set = (set(int(t) for t in thing_ids)
                    if thing_ids is not None else set())

    for ins_id in np.unique(ins_seg):
        if ins_id == 0:
            continue
        thing_mask = (ins_seg == ins_id) & is_thing
        if not thing_mask.any():
            continue
        # majority vote; ties resolve to the smallest class id (matches
        # scipy.stats.mode / np.bincount().argmax())
        class_id = np.bincount(sem_seg[thing_mask].ravel()).argmax()
        if class_id == 0:
            continue
        class_id = np.uint32(class_id)
        class_id_tracker[int(class_id)] += 1
        new_ins_id = class_id_tracker[int(class_id)]
        panoptic_id = class_id * max_instances_per_category + new_ins_id
        id_dict[int(panoptic_id)] = int(ins_id)
        pan_seg[thing_mask] = panoptic_id

    for class_id in np.unique(sem_seg):
        if class_id == 0 or int(class_id) in thing_id_set:
            continue
        class_id = np.uint32(class_id)
        stuff_mask = (sem_seg == class_id) & (ins_seg == 0)
        pan_seg[stuff_mask] = class_id * max_instances_per_category

    return pan_seg, id_dict


def deeplab_merge_batch_np(
    semantic_batch: np.ndarray,
    instance_batch: np.ndarray,
    instance_fg_batch: np.ndarray,
    max_instances_per_category: int,
    thing_ids: Sequence[int],
    void_label: int,
) -> Tuple[np.ndarray, List[Dict[int, int]]]:
    panoptic_preds = []
    panoptic_id_dicts = []
    for sem, ins, fg in zip(semantic_batch, instance_batch, instance_fg_batch):
        pan, id_dict = deeplab_merge_semantic_and_instance_np(
            sem, ins, fg, max_instances_per_category, thing_ids, void_label
        )
        panoptic_preds.append(pan)
        panoptic_id_dicts.append(id_dict)
    return np.stack(panoptic_preds), panoptic_id_dicts
