"""Mean intersection-over-union via an on-device confusion matrix.

Reference metric/miou.py:9-94: int64 confusion matrix from
bincount(target * C + pred); optional void row/col exclusion; classes
without GT pixels are ignored; per-class IoUs on request. The
reference deliberately keeps this on CPU (task_helper/semantic.py:52);
the TPU build keeps the state in device memory and accumulates with a
one-hot matmul (MXU) instead of bincount."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .base import MetricBase


@partial(jax.jit, static_argnames=('n_classes',))
def confusion_matrix(preds, target, n_classes: int):
    """(...,) int preds/target -> (C, C) int32 confusion counts
    (rows = target, cols = prediction). The pixel axes stay
    unflattened: the dot_general contracts them all directly, so
    batch-minor (B, H, W) maps never pay a linearization copy."""
    oh_t = jax.nn.one_hot(target, n_classes, dtype=jnp.bfloat16)
    oh_p = jax.nn.one_hot(preds, n_classes, dtype=jnp.bfloat16)
    px = tuple(range(target.ndim))
    cm = jax.lax.dot_general(oh_t, oh_p, ((px, px), ((), ())),
                             preferred_element_type=jnp.float32)
    return cm.astype(jnp.int32)


class MeanIntersectionOverUnion(MetricBase):
    def __init__(self, n_classes: int, ignore_first_class: bool = False):
        self._n_classes = n_classes
        self._ignore_first_class = ignore_first_class

    def empty_state(self):
        return jnp.zeros((self._n_classes, self._n_classes), jnp.int32)

    def update_state(self, state, preds, target):
        return state + confusion_matrix(preds, target, self._n_classes)

    def compute_from_state(self, state, return_ious: bool = False):
        confmat = np.asarray(state).astype(np.float64)
        tp = np.diag(confmat)
        sum_pred = confmat.sum(axis=0)
        sum_gt = confmat.sum(axis=1)

        if self._ignore_first_class:
            # exclude void row/col; void GT pixels predicted as a class
            # must not count against that class's prediction sum
            tp = tp[1:]
            sum_pred = sum_pred[1:] - confmat[0, 1:]
            sum_gt = sum_gt[1:]

        mask = sum_gt != 0
        tp_m = tp[mask]
        union = sum_pred[mask] + sum_gt[mask] - tp_m
        iou = tp_m / union

        miou = np.float32(iou.mean() if len(iou) else 0.0)

        if return_ious:
            ious = np.full((self._n_classes,), np.nan, dtype=np.float32)
            idx = np.nonzero(mask)[0]
            if self._ignore_first_class:
                idx = idx + 1
            ious[idx] = iou
            return miou, ious
        return miou
