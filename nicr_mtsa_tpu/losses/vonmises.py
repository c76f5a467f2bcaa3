"""Von Mises loss on biternion (cos, sin) pairs (reference
loss/vonmises.py:18-51, after Beyer et al., GCPR 2015):
`1 - exp(kappa * (cos(delta) - 1))` where `cos(delta)` is the dot
product of unit-length biternions. Inputs are (N, 2) -- masking
happens upstream by flattening to valid pixels only."""
from typing import Tuple

import jax.numpy as jnp

from .base import LossBase


class VonMisesLossBiternion(LossBase):
    def __init__(self, reduction: str = 'sum', kappa: float = 1.0) -> None:
        if reduction not in ('sum', 'none'):
            raise ValueError(f"unsupported reduction: '{reduction}'")
        self._kappa = float(kappa)
        self._reduction = reduction

    def _compute_loss(self, input_, target) -> Tuple:
        if 2 != input_.ndim or 2 != target.ndim:
            raise ValueError(
                'expected biternion inputs of shape (n, 2); reshape '
                'channels-last maps to (b*h*w, 2) after masking')
        cos_delta = jnp.sum(
            input_.astype(jnp.float32) * target.astype(jnp.float32),
            axis=1, keepdims=True)
        per_pair = 1.0 - jnp.exp(self._kappa * (cos_delta - 1.0))

        n_elements = jnp.asarray(per_pair.size, jnp.int32)
        if self._reduction == 'none':
            return per_pair, n_elements
        return jnp.sum(per_pair), n_elements
