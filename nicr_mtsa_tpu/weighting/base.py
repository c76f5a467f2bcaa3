"""Multi-task loss weighting (reference loss_weighting/base.py:12-43).

`reduce_losses({task_key: total_loss}, batch_idx) -> scalar`. The
weights themselves are host-side trainer state (floats): weight
updates happen at epoch boundaries (DWA) or per step from host RNG
(RLW), so the jitted train step receives them as ordinary array
arguments and stays cache-friendly."""
import abc
from typing import Dict, Union

import jax.numpy as jnp


class LossWeightingBase(abc.ABC):
    @property
    @abc.abstractmethod
    def weights(self) -> Dict[str, float]:
        ...

    @abc.abstractmethod
    def reset_weights(self) -> None:
        ...

    @abc.abstractmethod
    def reduce_losses(self, losses: Dict, batch_idx: int):
        ...

    def _weighted_sum(self, losses: Dict):
        return sum(self.weights[key] * losses[key] for key in self.weights)
