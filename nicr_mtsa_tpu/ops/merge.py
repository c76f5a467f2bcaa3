"""On-device Panoptic-DeepLab merge -- fixed-shape, batched, jittable.

Replaces the reference's forced-CPU python loop
(utils/panoptic_merge.py:172-225, called at
model/postprocessing/panoptic.py:143-152) with dense ops over the
bounded K-instance table:

1. per-instance class histogram via a one-hot matmul (MXU),
2. majority class = argmax (ties -> smallest class id, matching
   torch.mode / scipy.stats.mode / np.bincount().argmax()),
3. per-class running instance ids via a cumulative sum over the
   instance slots (ascending id order = the reference's
   torch.unique order),
4. per-pixel panoptic id assembly by gather from the K-table.

The reference's {panoptic_id: instance_id} dict becomes the dense
`panoptic_id_table` (K+1,) mapping raw instance id -> panoptic id.
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .lookup import bool_table_lookup, value_table_lookup
from .segments import SEGMENT_TABLE_PAD, ids_to_slots


class PanopticMerge(NamedTuple):
    panoptic: jnp.ndarray           # (B, H, W) int32 panoptic ids
    panoptic_id_table: jnp.ndarray  # (B, K+1) int32: raw ins id -> pan id
    instance_class: jnp.ndarray     # (B, K+1) int32 majority class (0=void)


@partial(jax.jit, static_argnames=('max_instances_per_category', 'top_k',
                                   'n_classes_with_void'))
def deeplab_merge(
    semantic: jnp.ndarray,           # (B, H, W) int32, 0 = void
    instance: jnp.ndarray,           # (B, H, W) int32 ids 0..K
    semantic_thing_seg: jnp.ndarray,  # (B, H, W) bool foreground
    thing_class_table: jnp.ndarray,  # (C,) bool, index = class id with void
    max_instances_per_category: int = 1 << 16,
    top_k: int = 64,
    n_classes_with_void: int = 41,
) -> PanopticMerge:
    B, H, W = semantic.shape
    K = top_k
    C = n_classes_with_void
    M = max_instances_per_category
    if semantic_thing_seg.ndim == 4:
        semantic_thing_seg = semantic_thing_seg[..., 0]

    flat_sem = semantic.reshape(B, -1)
    flat_ins = instance.reshape(B, -1)
    flat_fg = semantic_thing_seg.reshape(B, -1)

    is_thing_px = (flat_ins > 0) & flat_fg

    # (1) per-instance class histogram over thing pixels (MXU matmul);
    # instance slot 0 collects all non-thing pixels and is ignored
    ins_slot = jnp.where(is_thing_px, flat_ins, 0)
    onehot_ins = jax.nn.one_hot(ins_slot, K + 1, dtype=jnp.bfloat16)
    onehot_sem = jax.nn.one_hot(flat_sem, C, dtype=jnp.bfloat16)
    hist = jnp.einsum('bpk,bpc->bkc', onehot_ins, onehot_sem,
                      preferred_element_type=jnp.float32)   # (B, K+1, C)

    counts = jnp.sum(hist, axis=-1)                         # (B, K+1)
    # (2) majority class; argmax ties -> smallest class id
    majority = jnp.argmax(hist, axis=-1).astype(jnp.int32)  # (B, K+1)
    valid_instance = (counts > 0) & (majority > 0)
    valid_instance = valid_instance.at[:, 0].set(False)

    # (3) per-class rank among valid instances, ascending instance id:
    # rank[k] = #{j <= k : valid_j and class_j == class_k}
    class_onehot = jax.nn.one_hot(
        jnp.where(valid_instance, majority, 0), C,
        dtype=jnp.int32) * valid_instance[..., None].astype(jnp.int32)
    cum = jnp.cumsum(class_onehot, axis=1)                  # (B, K+1, C)
    rank = jnp.take_along_axis(cum, majority[..., None],
                               axis=-1)[..., 0]             # (B, K+1)

    panoptic_id_table = jnp.where(
        valid_instance, majority * M + rank, 0).astype(jnp.int32)

    # (4) per-pixel assembly (one-hot matmul lookups: native gathers
    # of small tables serialize on the TPU scalar core, ~20 ms/batch)
    table_gather = value_table_lookup(ins_slot, panoptic_id_table)
    is_stuff_class = ~bool_table_lookup(
        jnp.clip(flat_sem, 0, C - 1), thing_class_table)
    stuff_px = (flat_ins == 0) & (flat_sem > 0) & is_stuff_class

    pan = jnp.where(is_thing_px, table_gather, 0)
    pan = jnp.where(stuff_px, flat_sem * M, pan)

    return PanopticMerge(
        panoptic=pan.reshape(B, H, W).astype(jnp.int32),
        panoptic_id_table=panoptic_id_table,
        instance_class=jnp.where(valid_instance, majority, 0),
    )


class PanopticMergeSlots(NamedTuple):
    slots: jnp.ndarray              # (B, H, W) int32 pred PQ slots
    pred_table: jnp.ndarray         # (B, S) int32 sorted, PAD-padded
    panoptic_id_table: jnp.ndarray  # (B, K+1) int32: raw ins id -> pan id
    instance_class: jnp.ndarray     # (B, K+1) int32 majority class
    panoptic: jnp.ndarray           # (B, H, W) int32 merged id map


@partial(jax.jit, static_argnames=('max_instances_per_category', 'top_k',
                                   'n_classes_with_void',
                                   'pred_table_size'))
def deeplab_merge_pq(
    semantic: jnp.ndarray,           # (B, H, W) int32, 0 = void
    instance: jnp.ndarray,           # (B, H, W) int32 ids 0..K
    semantic_thing_seg: jnp.ndarray,  # (B, H, W) bool foreground
    thing_class_table: jnp.ndarray,  # (C,) bool, index = class id with void
    max_instances_per_category: int = 1 << 16,
    top_k: int = 64,
    n_classes_with_void: int = 41,
    pred_table_size: int = 128,
) -> PanopticMergeSlots:
    """`deeplab_merge` composed with the PQ slot mapping: the merged
    panoptic-id MAP never materializes. PQ consumes the merged map
    only through `ids_to_slots(map, merged_segment_table(map))`
    (metrics/pq.py), so this emits the per-pixel SLOTS directly from
    the merge's own small tables -- each pixel's slot comes from one
    of two (B, <=K+1)-wide one-hot lookups (thing: instance id ->
    table slot; stuff: class -> table slot) instead of the fullres
    bucketed table search, and the candidate table is built from the
    (C + K)-entry id grid instead of a pixel-map histogram.

    The table is sorted and PAD-padded like `merged_segment_table`'s
    but STRUCTURALLY over-inclusive: every stuff class contributes a
    candidate id even with zero pixels (a zero-area slot is inert in
    `pq_compare` -- never a TP/FN match, and the FP mask requires
    area > 0 -- and PQ is slot-permutation-invariant, so the states
    are equal; asserted against the map-derived path in
    tests/test_ops.py and tests/test_pipeline.py). Requires
    pred_table_size >= C + top_k + 1."""
    B, H, W = semantic.shape
    K = top_k
    C = n_classes_with_void
    M = max_instances_per_category
    S = pred_table_size
    assert S >= C + K + 1, (
        f'pred_table_size {S} < C + K + 1 = {C + K + 1}')
    if semantic_thing_seg.ndim == 4:
        semantic_thing_seg = semantic_thing_seg[..., 0]

    flat_sem = semantic.reshape(B, -1)
    flat_ins = instance.reshape(B, -1)
    flat_fg = semantic_thing_seg.reshape(B, -1)
    is_thing_px = (flat_ins > 0) & flat_fg

    # steps (1)-(3) of deeplab_merge: majority class + per-class rank
    ins_slot = jnp.where(is_thing_px, flat_ins, 0)
    onehot_ins = jax.nn.one_hot(ins_slot, K + 1, dtype=jnp.bfloat16)
    onehot_sem = jax.nn.one_hot(flat_sem, C, dtype=jnp.bfloat16)
    hist = jnp.einsum('bpk,bpc->bkc', onehot_ins, onehot_sem,
                      preferred_element_type=jnp.float32)
    counts = jnp.sum(hist, axis=-1)
    majority = jnp.argmax(hist, axis=-1).astype(jnp.int32)
    valid_instance = (counts > 0) & (majority > 0)
    valid_instance = valid_instance.at[:, 0].set(False)
    class_onehot = jax.nn.one_hot(
        jnp.where(valid_instance, majority, 0), C,
        dtype=jnp.int32) * valid_instance[..., None].astype(jnp.int32)
    cum = jnp.cumsum(class_onehot, axis=1)
    rank = jnp.take_along_axis(cum, majority[..., None],
                               axis=-1)[..., 0]
    panoptic_id_table = jnp.where(
        valid_instance, majority * M + rank, 0).astype(jnp.int32)

    # structured candidate ids: void 0, one per stuff class, one per
    # valid instance -- (B, 1 + (C-1) + K), PAD for absent candidates
    is_stuff = ~thing_class_table
    cls_ids = jnp.arange(1, C, dtype=jnp.int32)
    stuff_cand = jnp.where(is_stuff[1:], cls_ids * M,
                           jnp.int32(SEGMENT_TABLE_PAD))
    thing_cand = jnp.where(valid_instance[:, 1:],
                           panoptic_id_table[:, 1:],
                           jnp.int32(SEGMENT_TABLE_PAD))
    cand = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32),
         jnp.broadcast_to(stuff_cand[None], (B, C - 1)),
         thing_cand], axis=-1)                        # (B, C + K)
    table = jnp.sort(cand, axis=-1)
    pred_table = jnp.concatenate(
        [table,
         jnp.full((B, S - table.shape[-1]), jnp.int32(SEGMENT_TABLE_PAD))],
        axis=-1)                                      # (B, S) sorted

    # slot-of-candidate tables (tiny compare-counts against the table)
    slot_by_inst = ids_to_slots(panoptic_id_table, pred_table)
    slot_by_inst = jnp.where(valid_instance, slot_by_inst, 0)  # -> slot(0)=0
    cls_all = jnp.arange(C, dtype=jnp.int32) * M      # (C,)
    stuff_ok = is_stuff & (jnp.arange(C) > 0)
    slot_by_class = ids_to_slots(
        jnp.broadcast_to(cls_all[None], (B, C)), pred_table)
    slot_by_class = jnp.where(stuff_ok[None], slot_by_class, 0)

    # per-pixel slot assembly (id 0 sorts first, so the void slot is 0)
    slot_thing = value_table_lookup(ins_slot, slot_by_inst)
    is_stuff_class = ~bool_table_lookup(
        jnp.clip(flat_sem, 0, C - 1), thing_class_table)
    stuff_px = (flat_ins == 0) & (flat_sem > 0) & is_stuff_class
    slot_stuff = value_table_lookup(
        jnp.clip(flat_sem, 0, C - 1), slot_by_class)
    slots = jnp.where(is_thing_px, slot_thing,
                      jnp.where(stuff_px, slot_stuff, 0))

    # the merged id MAP, assembled exactly as deeplab_merge does --
    # callers that only consume the slots (metric-only eval) leave it
    # unused and XLA dead-code-eliminates the assembly
    table_gather = value_table_lookup(ins_slot, panoptic_id_table)
    pan = jnp.where(is_thing_px, table_gather, 0)
    pan = jnp.where(stuff_px, flat_sem * M, pan)

    return PanopticMergeSlots(
        slots=slots.reshape(B, H, W).astype(jnp.int32),
        pred_table=pred_table,
        panoptic_id_table=panoptic_id_table,
        instance_class=jnp.where(valid_instance, majority, 0),
        panoptic=pan.reshape(B, H, W).astype(jnp.int32),
    )
