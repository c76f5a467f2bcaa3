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
        assert reduction in ('sum', 'none')
        self._kappa = float(kappa)
        self._reduction = reduction

    def _compute_loss(self, input_, target) -> Tuple:
        if input_.ndim != 2 or target.ndim != 2:
            raise ValueError(
                "VonMisesLossBiternion does only support 2d inputs with "
                "shape (n, 2); reshape channels-last inputs to "
                "(b*h*w, c=2) after masking."
            )
        cos_angles = jnp.sum(
            input_.astype(jnp.float32) * target.astype(jnp.float32),
            axis=1, keepdims=True)
        score = 1.0 - jnp.exp(self._kappa * (cos_angles - 1.0))

        n_elements = jnp.asarray(score.size, jnp.int32)
        if 'sum' == self._reduction:
            return jnp.sum(score), n_elements
        return score, n_elements
