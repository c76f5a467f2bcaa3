"""L1 / MSE / cosine-embedding losses (reference loss/l1.py, mse.py,
cos_emb.py): per-element losses averaged over the channel axis, then
summed; `n_elements` = number of pixels. Channels-last layout."""
from typing import Optional, Tuple

import jax.numpy as jnp

from .base import LossBase


def _reduce(loss, reduction: str, n_input_elements: int):
    if 'sum' == reduction:
        if loss.ndim in (2, 4):
            # (B, H, W, C) or (N, C): average over the channel axis
            loss = jnp.mean(loss, axis=-1)
        n_elements = loss.size
        return jnp.sum(loss), jnp.asarray(n_elements, jnp.int32)
    if 'mean' == reduction:
        return jnp.mean(loss), jnp.asarray(1, jnp.int32)
    # 'none': n = input element count like the reference -- as a PLAIN
    # python int, since it can exceed int32 at dense-embedding shapes
    # (B64 x 480x640 x D512 = 10e9; an eager int32 device scalar
    # overflowed at trace time). Callers of 'none' compute their own
    # masked counts.
    return loss, n_input_elements


class L1Loss(LossBase):
    def __init__(self, reduction: str = 'sum') -> None:
        assert reduction in ('sum', 'mean', 'none')
        self._reduction = reduction

    def _compute_loss(self, input_, target):
        loss = jnp.abs(input_.astype(jnp.float32)
                       - target.astype(jnp.float32))
        return _reduce(loss, self._reduction, input_.size)


class MSELoss(LossBase):
    def __init__(self, reduction: str = 'sum') -> None:
        assert reduction in ('sum', 'mean', 'none')
        self._reduction = reduction

    def _compute_loss(self, input_, target):
        diff = input_.astype(jnp.float32) - target.astype(jnp.float32)
        return _reduce(diff * diff, self._reduction, input_.size)


class CosineEmbeddingLoss(LossBase):
    """1 - cos(input, target) for similar pairs (the only mode the
    reference uses; target_similarity defaults to all-ones)."""

    def __init__(self, reduction: str = 'sum') -> None:
        assert reduction in ('sum', 'mean', 'none')
        self._reduction = reduction

    def _compute_loss(self, input_, target, target_similarity=None):
        x = input_.astype(jnp.float32)
        y = target.astype(jnp.float32)
        cos = jnp.sum(x * y, axis=-1) / jnp.maximum(
            jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1),
            1e-8)
        loss = 1.0 - cos
        if target_similarity is not None:
            # dissimilar pairs: max(0, cos) (torch semantics, margin 0)
            sim = target_similarity
            while sim.ndim < loss.ndim:
                sim = sim[..., None]
            loss = jnp.where(sim > 0, loss, jnp.maximum(cos, 0.0))

        # loss has no channel axis anymore -> plain sum/mean
        if 'sum' == self._reduction:
            return jnp.sum(loss), jnp.asarray(loss.size, jnp.int32)
        if 'mean' == self._reduction:
            return jnp.mean(loss), jnp.asarray(1, jnp.int32)
        # 'none': n = input element count like the reference, as a
        # plain python int (can exceed int32 at dense-embedding shapes)
        return loss, input_.size
