"""Loss protocol (reference loss/base.py:11-33): a loss is applied to
a sequence of per-scale (input, target) pairs and returns a tuple of
`(loss_sum, n_elements)` per scale. `n_elements` stays a DEVICE scalar
-- the reference's `.cpu().detach().item()` host syncs (one per loss
term per scale, loss/ce.py:50) are exactly what the TPU build removes:
the final `sum(losses)/sum(n_elements)` reduction happens inside the
jitted train step."""
import abc
from typing import Sequence, Tuple

import jax.numpy as jnp


class LossBase(abc.ABC):
    @abc.abstractmethod
    def _compute_loss(self, input_, target) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ...

    def __call__(
        self,
        input_tensors: Sequence,
        target_tensors: Sequence,
    ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]:
        return tuple(
            self._compute_loss(input_, target)
            for input_, target in zip(input_tensors, target_tensors)
        )
