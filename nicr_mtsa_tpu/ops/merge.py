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
