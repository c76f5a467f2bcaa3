"""Semantic cross-entropy (reference loss/ce.py:13-68).

- targets carry void as 0; the network predicts without void, so
  targets are shifted by -1 and label -1 is ignored,
- optional per-class weights multiply each pixel's loss
  (torch CrossEntropyLoss(weight=..., reduction='sum') semantics),
- `weighted_reduction=True` (ESANet) divides by the weighted pixel sum
  instead of the plain count downstream.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .base import LossBase


class CrossEntropyLossSemantic(LossBase):
    def __init__(
        self,
        weights=None,
        label_smoothing: float = 0.0,
        weighted_reduction: bool = False,
    ) -> None:
        self._weights = None if weights is None else jnp.asarray(weights)
        self._label_smoothing = float(label_smoothing)
        self._weighted_reduction = weighted_reduction
        if weighted_reduction:
            assert self._weights is not None

    def _compute_loss(self, input_, target) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """input_: (..., C) logits; target: (...) int with 0 = void."""
        n_classes = input_.shape[-1]
        target_shifted = target.astype(jnp.int32) - 1
        valid = target_shifted >= 0
        tclip = jnp.clip(target_shifted, 0, n_classes - 1)

        logp = jax.nn.log_softmax(input_.astype(jnp.float32), axis=-1)
        # one-hot reduction instead of take_along_axis / weights[tclip]:
        # XLA:TPU lowers big-index gathers to serialized scalar-core
        # code (72.7 ms for the fullres selection at B16 -- PERF.md
        # lesson 1); the one-hot select fuses into a vector reduce and
        # is bit-exact (exactly one 1.0 term per pixel)
        onehot = jax.nn.one_hot(tclip, n_classes, dtype=logp.dtype)
        nll = -jnp.sum(logp * onehot, axis=-1)
        if self._label_smoothing > 0.0:
            ls = self._label_smoothing
            smooth = -jnp.mean(logp, axis=-1)
            nll = (1.0 - ls) * nll + ls * smooth

        if self._weights is not None:
            pixel_w = jnp.sum(
                onehot * self._weights.astype(logp.dtype), axis=-1)
            nll = nll * pixel_w

        nll = jnp.where(valid, nll, 0.0)
        loss = jnp.sum(nll)
        n_elements = jnp.sum(valid.astype(jnp.int32))

        if not self._weighted_reduction:
            return loss, n_elements

        # ESANet weighted reduction: divide by the weighted pixel sum.
        # NOTE: n_elements stays the non-void count, exactly like the
        # reference (ce.py:56-68) -- downstream accumulate_losses then
        # divides the already-normalized loss by the element count too.
        weighted_pixel_sum = jnp.sum(jnp.where(valid, pixel_w, 0.0))
        loss = loss / jnp.maximum(weighted_pixel_sum, 1e-12)
        return loss, n_elements
