"""Fixed loss weighting (reference loss_weighting/fixed.py:14-37)."""
from copy import deepcopy
from typing import Dict, Union

from .base import LossWeightingBase


class FixedLossWeighting(LossWeightingBase):
    """Static weighted sum of the per-task total losses."""

    def __init__(self, weights: Dict[str, float]) -> None:
        self._initial_weights = weights
        self.reset_weights()

    @property
    def weights(self) -> Dict[str, float]:
        return self._weights

    def reset_weights(self) -> None:
        self._weights = deepcopy(self._initial_weights)

    def reduce_losses(self, losses: Dict, batch_idx: int):
        return self._weighted_sum(losses)
