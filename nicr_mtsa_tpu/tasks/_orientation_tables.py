"""Angle-table plumbing for the orientation-aware PQ metric.

The reference matches orientations through python dicts
({panoptic_id: instance_id} and {instance_id: angle},
metric/mae.py:129-162). The fixed-shape build aligns angles to
segment-table slots instead:

- GT side (host): walk the per-sample id dicts once per batch,
- prediction side (device): match the pred segment table against the
  merge's (K+1,) panoptic-id table and gather from the per-instance
  angle array."""
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.segments import SEGMENT_TABLE_PAD


def gt_slot_angles(
    gt_table: np.ndarray,                 # (B, S) sorted panoptic ids
    panoptic_id_dicts: List[Dict[int, int]],
    orientations_present: List[Dict[int, float]],
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: (B, S) angles + validity per GT segment slot."""
    gt_table = np.asarray(gt_table)
    B, S = gt_table.shape
    angles = np.zeros((B, S), np.float32)
    valid = np.zeros((B, S), bool)
    for b in range(B):
        id_dict = panoptic_id_dicts[b]
        ori = orientations_present[b]
        for s in range(S):
            pan_id = int(gt_table[b, s])
            if pan_id in (0, SEGMENT_TABLE_PAD):
                continue
            ins_id = id_dict.get(pan_id)
            if ins_id is None:
                continue
            angle = ori.get(ins_id)
            if angle is None:
                continue
            angles[b, s] = float(angle)
            valid[b, s] = True
    return angles, valid


def pred_slot_angles(
    pred_table: jnp.ndarray,          # (B, S) panoptic ids
    panoptic_id_table: jnp.ndarray,   # (B, K+1): raw ins id -> pan id
    angles_by_instance: jnp.ndarray,  # (B, K+1) angle per raw ins id
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side: (B, S) angles + validity per pred segment slot."""
    eq = (pred_table[:, :, None] == panoptic_id_table[:, None, :])
    eq = eq & (pred_table != 0)[:, :, None] \
           & (pred_table != SEGMENT_TABLE_PAD)[:, :, None] \
           & (panoptic_id_table != 0)[:, None, :]
    valid = jnp.any(eq, axis=-1)
    k = jnp.argmax(eq, axis=-1)
    angles = jnp.take_along_axis(angles_by_instance, k, axis=1)
    return angles, valid
