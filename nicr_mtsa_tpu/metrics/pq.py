"""Panoptic Quality, fully on device with fixed shapes.

Reference metric/pq.py:30-361 (TF-models-derived): per-image segment
areas, intersection ids `target * offset + pred`, IoU > 0.5 matching
with void-overlap union correction, per-class TP/FN/FP/IoU states --
implemented there as python dict loops parallelized by a spawn
multiprocessing pool.

Here each image's unbounded panoptic-id space is compressed to a
bounded sorted segment table (ops/segments.py); the intersection-area
"dict" is the dense (S_gt+1, S_pred+1) matrix from a one-hot MXU
matmul; matching, void/ignore corrections, and the per-class
reductions are masked dense ops. The `target * offset + pred` 64-bit
id arithmetic disappears entirely: pairs are (slot, slot) indices, so
no int64 is needed. States accumulate in HBM and merge with
`lax.psum` (metrics/base.py) -- no process pool, no host round-trip.

Matched (gt_slot, pred_slot) pairs are also returned, which the
orientation-MAE variant (PanopticQualityWithOrientationMAE,
reference metric/mae.py:70-172) consumes via per-slot angle tables.
"""
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.segments import (
    SEGMENT_TABLE_PAD, ids_to_slots, intersection_matrix, unique_table,
)
from .base import MetricBase
from .mae import abs_angle_error_rad


_EPSILON = 1e-10


class PQCompareResult(NamedTuple):
    iou_per_class: jnp.ndarray    # (C,) float32
    tp_per_class: jnp.ndarray     # (C,) float32
    fn_per_class: jnp.ndarray     # (C,) float32
    fp_per_class: jnp.ndarray     # (C,) float32
    match: jnp.ndarray            # (B, S_gt, S_pred) bool matched pairs
    gt_table: jnp.ndarray         # (B, S_gt)
    pred_table: jnp.ndarray       # (B, S_pred)


@partial(jax.jit, static_argnames=(
    'num_categories', 'ignored_label', 'max_instances_per_category'))
def pq_compare(
    pred: jnp.ndarray,            # (B, H, W) int32 panoptic ids
    target: jnp.ndarray,          # (B, H, W) int32 panoptic ids
    gt_table: jnp.ndarray,        # (B, S_gt) sorted, PAD-padded
    pred_table: jnp.ndarray,      # (B, S_pred) sorted, PAD-padded
    num_categories: int,
    ignored_label: int,
    max_instances_per_category: int,
    pred_slots: jnp.ndarray = None,  # (B, H, W) precomputed slot map
    gt_slots: jnp.ndarray = None,    # (B, H, W) precomputed slot map
) -> PQCompareResult:
    """`pred` may be None when `pred_slots` is given: producers that
    know each pixel's (class, rank) emit the slot map directly
    (ops/merge.deeplab_merge_pq) and skip the bucketed table search
    -- the id MAP is only ever consumed through its slots. `gt_slots`
    lets an eval step that runs SEVERAL PQ pipelines against the same
    GT (panoptic + instance-with-GT-semantic) compute the GT slot map
    once (pipeline.make_fused_eval_step)."""
    B = target.shape[0]
    C = num_categories
    M = max_instances_per_category
    S_gt = gt_table.shape[-1]
    S_pred = pred_table.shape[-1]
    void_segment_id = ignored_label * M

    # (B, H, W) maps stay unflattened: ids_to_slots/intersection_matrix
    # broadcast/contract the spatial dims directly, so the batch-minor
    # maps never pay a (B, P) linearization copy (~13 ms at B128 eval)
    if gt_slots is None:
        gt_slots = ids_to_slots(target.astype(jnp.int32), gt_table)
    if pred_slots is None:
        pred_slots = ids_to_slots(pred.astype(jnp.int32), pred_table)
    N_full = intersection_matrix(gt_slots, pred_slots, S_gt, S_pred)

    # segment areas include the overflow row/col (total pixel counts)
    gt_area = jnp.sum(N_full, axis=2)[:, :S_gt]        # (B, S_gt)
    pred_area = jnp.sum(N_full, axis=1)[:, :S_pred]    # (B, S_pred)
    N = N_full[:, :S_gt, :S_pred]

    gt_valid = gt_table != SEGMENT_TABLE_PAD
    pred_valid = pred_table != SEGMENT_TABLE_PAD
    gt_cat = jnp.clip(gt_table // M, 0, C - 1)
    pred_cat = jnp.clip(pred_table // M, 0, C - 1)

    # union correction: overlap of each pred segment with the single
    # gt void segment (id = ignored_label * M)
    gt_is_void_seg = (gt_valid & (gt_table == void_segment_id)
                      ).astype(jnp.float32)
    r = jnp.einsum('bg,bgq->bq', gt_is_void_seg, N)    # (B, S_pred)

    # total overlap of each pred segment with ALL ignored-category gt
    # segments (instance id > 0 included)
    gt_is_ignored = (gt_valid & (gt_cat == ignored_label)
                     ).astype(jnp.float32)
    pio = jnp.einsum('bg,bgq->bq', gt_is_ignored, N)   # (B, S_pred)

    same_cat = gt_cat[:, :, None] == pred_cat[:, None, :]
    pair_valid = gt_valid[:, :, None] & pred_valid[:, None, :]
    union = (gt_area[:, :, None] + pred_area[:, None, :]
             - N - r[:, None, :])
    iou = jnp.where(union > 0, N / jnp.maximum(union, 1.0), 0.0)

    # reference skips the single intersection id == void_segment_id,
    # i.e. the pair (gt id 0, pred id void_segment_id)
    exclude_pair = ((gt_table == 0)[:, :, None]
                    & (pred_table == void_segment_id)[:, None, :])

    match = (same_cat & pair_valid & (N > 0) & (iou > 0.5)
             & ~exclude_pair)

    # per-class reductions (each gt/pred slot matches at most one
    # partner since IoU > 0.5 is exclusive)
    gt_matched = jnp.any(match, axis=2)                # (B, S_gt)
    pred_matched = jnp.any(match, axis=1)              # (B, S_pred)
    iou_per_gt = jnp.sum(jnp.where(match, iou, 0.0), axis=2)

    oh_gt_cat = jax.nn.one_hot(gt_cat, C, dtype=jnp.float32)
    oh_pred_cat = jax.nn.one_hot(pred_cat, C, dtype=jnp.float32)

    tp_per_class = jnp.einsum('bg,bgc->c',
                              gt_matched.astype(jnp.float32), oh_gt_cat)
    iou_per_class = jnp.einsum('bg,bgc->c', iou_per_gt, oh_gt_cat)

    fn_mask = (gt_valid & ~gt_matched & (gt_cat != ignored_label)
               & (gt_area > 0))
    fn_per_class = jnp.einsum('bg,bgc->c',
                              fn_mask.astype(jnp.float32), oh_gt_cat)

    # an unmatched prediction mostly covered by ignored gt is forgiven
    mostly_ignored = pio > 0.5 * pred_area
    fp_mask = (pred_valid & ~pred_matched & ~mostly_ignored
               & (pred_area > 0))
    fp_per_class = jnp.einsum('bq,bqc->c',
                              fp_mask.astype(jnp.float32), oh_pred_cat)

    return PQCompareResult(
        iou_per_class=iou_per_class, tp_per_class=tp_per_class,
        fn_per_class=fn_per_class, fp_per_class=fp_per_class,
        match=match, gt_table=gt_table, pred_table=pred_table,
    )


def realdiv_maybe_zero(x, y):
    out = np.zeros_like(x)
    np.divide(x, y, out=out, where=np.abs(y) >= _EPSILON)
    return out


class PanopticQuality(MetricBase):
    def __init__(
        self,
        num_categories: int,
        ignored_label: int,
        max_instances_per_category: int,
        offset: int = 256 ** 3,        # API parity; unused (slot pairs)
        is_thing: Union[np.ndarray, List[bool], None] = None,
        gt_table_size: int = 256,
        pred_table_size: int = 128,
    ) -> None:
        self.num_categories = num_categories
        self.ignored_label = ignored_label
        self.max_instances_per_category = max_instances_per_category
        self.is_thing = np.asarray(is_thing, dtype=bool)
        self.is_stuff = np.logical_not(self.is_thing)
        assert len(self.is_thing) == self.num_categories
        self._gt_table_size = gt_table_size
        self._pred_table_size = pred_table_size

    def empty_state(self):
        C = self.num_categories
        return {
            'iou_per_class': jnp.zeros((C,), jnp.float32),
            'tp_per_class': jnp.zeros((C,), jnp.float32),
            'fn_per_class': jnp.zeros((C,), jnp.float32),
            'fp_per_class': jnp.zeros((C,), jnp.float32),
        }

    def _tables(self, preds, targets, gt_table, pred_table):
        B = targets.shape[0]
        if gt_table is None:
            gt_table = unique_table(
                targets.reshape(B, -1), self._gt_table_size)
        if pred_table is None:
            pred_table = unique_table(
                preds.reshape(B, -1), self._pred_table_size)
        return gt_table, pred_table

    def compare(self, preds, targets, gt_table=None, pred_table=None,
                pred_slots=None, gt_slots=None):
        """Jittable core; returns the PQCompareResult for one batch."""
        gt_table, pred_table = self._tables(preds, targets,
                                            gt_table, pred_table)
        return pq_compare(
            preds, targets, gt_table, pred_table,
            num_categories=self.num_categories,
            ignored_label=self.ignored_label,
            max_instances_per_category=self.max_instances_per_category,
            pred_slots=pred_slots, gt_slots=gt_slots,
        )

    def update_state(self, state, preds, targets,
                     gt_table=None, pred_table=None, pred_slots=None,
                     gt_slots=None):
        res = self.compare(preds, targets, gt_table, pred_table,
                           pred_slots, gt_slots)
        return {
            'iou_per_class': state['iou_per_class'] + res.iou_per_class,
            'tp_per_class': state['tp_per_class'] + res.tp_per_class,
            'fn_per_class': state['fn_per_class'] + res.fn_per_class,
            'fp_per_class': state['fp_per_class'] + res.fp_per_class,
        }

    # --- results ------------------------------------------------------------
    def _np_state(self):
        return {k: np.asarray(v).astype(np.float64)
                for k, v in self.state.items()}

    def result_per_category(self, state=None) -> Dict:
        s = ({k: np.asarray(v).astype(np.float64) for k, v in state.items()}
             if state is not None else self._np_state())
        sq = realdiv_maybe_zero(s['iou_per_class'], s['tp_per_class'])
        rq = realdiv_maybe_zero(
            s['tp_per_class'],
            s['tp_per_class'] + 0.5 * s['fn_per_class']
            + 0.5 * s['fp_per_class'])
        return {'sq_per_class': sq, 'rq_per_class': rq,
                'pq_per_class': sq * rq}

    def _valid_categories(self, s, with_gt_only: bool):
        total = s['tp_per_class'] + s['fn_per_class']
        if not with_gt_only:
            total = total + s['fp_per_class']
        valid = total != 0
        if 0 <= self.ignored_label < self.num_categories:
            valid[self.ignored_label] = False
        return valid

    def compute_from_state(self, state, suffix: str = '') -> Dict:
        s = {k: np.asarray(v).astype(np.float64) for k, v in state.items()}
        results = self.result_per_category(state)

        valid = self._valid_categories(s, with_gt_only=False)
        valid_with_gt = self._valid_categories(s, with_gt_only=True)

        category_sets = {
            f'all{suffix}': valid,
            f'things{suffix}': valid & self.is_thing,
            f'stuff{suffix}': valid & self.is_stuff,
            f'all_with_gt{suffix}': valid_with_gt,
            f'things_with_gt{suffix}': valid_with_gt & self.is_thing,
            f'stuff_with_gt{suffix}': valid_with_gt & self.is_stuff,
        }

        for name, in_set in category_sets.items():
            if in_set.any():
                results.update({
                    f'{name}_pq': results['pq_per_class'][in_set].mean(),
                    f'{name}_sq': results['sq_per_class'][in_set].mean(),
                    f'{name}_rq': results['rq_per_class'][in_set].mean(),
                    f'{name}_num_categories': int(in_set.sum()),
                })
            else:
                results.update({
                    f'{name}_pq': 0.0, f'{name}_sq': 0.0,
                    f'{name}_rq': 0.0, f'{name}_num_categories': 0,
                })
        return results


class PanopticQualityWithOrientationMAE(PanopticQuality):
    """PQ plus mean absolute angular error over matched instances.

    The reference (metric/mae.py:70-172) walks matched pairs through
    two {panoptic_id: instance_id} dicts and two orientation dicts in
    python. Here both sides provide per-segment-slot angle tables
    (angle + validity), and the masked error reduction is dense."""

    def empty_state(self):
        state = super().empty_state()
        state['sum_angular_error'] = jnp.zeros((), jnp.float32)
        state['n_elements'] = jnp.zeros((), jnp.int32)
        return state

    def update_state(
        self, state, preds, targets,
        gt_table=None, pred_table=None,
        gt_angle=None, gt_angle_valid=None,          # (B, S_gt)
        pred_angle=None, pred_angle_valid=None,      # (B, S_pred)
        pred_slots=None, gt_slots=None,
    ):
        gt_table, pred_table = self._tables(preds, targets,
                                            gt_table, pred_table)
        res = pq_compare(
            preds, targets, gt_table, pred_table,
            num_categories=self.num_categories,
            ignored_label=self.ignored_label,
            max_instances_per_category=self.max_instances_per_category,
            pred_slots=pred_slots, gt_slots=gt_slots,
        )
        new = {
            'iou_per_class': state['iou_per_class'] + res.iou_per_class,
            'tp_per_class': state['tp_per_class'] + res.tp_per_class,
            'fn_per_class': state['fn_per_class'] + res.fn_per_class,
            'fp_per_class': state['fp_per_class'] + res.fp_per_class,
        }

        if gt_angle is not None and pred_angle is not None:
            pair_ok = (res.match
                       & gt_angle_valid[:, :, None]
                       & pred_angle_valid[:, None, :]
                       # gt panoptic id 0 is not a real instance
                       & (gt_table != 0)[:, :, None])
            err = abs_angle_error_rad(pred_angle[:, None, :],
                                      gt_angle[:, :, None])
            new['sum_angular_error'] = state['sum_angular_error'] + \
                jnp.sum(jnp.where(pair_ok, err, 0.0))
            new['n_elements'] = state['n_elements'] + \
                jnp.sum(pair_ok.astype(jnp.int32))
        else:
            new['sum_angular_error'] = state['sum_angular_error']
            new['n_elements'] = state['n_elements']
        return new

    def compute_from_state(self, state, suffix: str = '') -> Dict:
        results = super().compute_from_state(state, suffix=suffix)
        n = int(np.asarray(state['n_elements']))
        rad = (float(np.asarray(state['sum_angular_error'])) / n
               if n else float('nan'))
        results[f'mae{suffix}_rad'] = rad
        results[f'mae{suffix}_deg'] = np.rad2deg(rad)
        return results
