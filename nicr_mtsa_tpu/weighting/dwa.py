"""Dynamic Weight Average (reference loss_weighting/dwa.py:15-101,
after Liu et al., arXiv:1803.10704): per-epoch weights are the softmax
of the loss ratio between the last two epochs, scaled by the number of
tasks and a temperature. The epoch buffer and two-epoch history are
host-side trainer state and must be part of checkpoints (see
parallel/checkpoint.py)."""
from collections import deque
from copy import deepcopy
from typing import Dict, Sequence

import numpy as np


from .base import LossWeightingBase


class DynamicWeightAverage(LossWeightingBase):
    def __init__(
        self,
        loss_keys_to_consider: Sequence[str],
        temperature: float = 2.0,
    ) -> None:
        self._loss_keys = tuple(loss_keys_to_consider)
        self._temperature = temperature

        self._loss_history = deque([], maxlen=2)
        self._loss_buffer = []
        self._default_weights = {k: 1.0 for k in self._loss_keys}
        self._weights = deepcopy(self._default_weights)

    @property
    def weights(self) -> Dict[str, float]:
        return self._weights

    def reset_weights(self) -> None:
        self._loss_buffer = []
        self._loss_history = deque([], maxlen=2)
        self._weights = deepcopy(self._default_weights)

    def _compute_weights(self) -> None:
        if self._loss_buffer:
            self._loss_history.append({
                k: float(np.mean([float(losses[k])
                                  for losses in self._loss_buffer]))
                for k in self._loss_keys
            })

        if len(self._loss_history) < 2:
            self._weights = deepcopy(self._default_weights)
            return

        ratios = np.array([
            self._loss_history[-1][k] / self._loss_history[-2][k]
            for k in self._loss_keys
        ])
        e = np.exp(ratios / self._temperature)
        weights = len(ratios) * e / e.sum()
        self._weights = {k: float(w)
                         for k, w in zip(self._loss_keys, weights)}

    def reduce_losses(self, losses: Dict, batch_idx: int):
        if 0 == batch_idx:
            # new epoch: recompute weights from the buffered epoch means
            self._compute_weights()

        detached = {k: float(losses[k]) for k in self._loss_keys}
        if len(self._loss_buffer) == batch_idx:
            self._loss_buffer.append(detached)
        else:
            self._loss_buffer[batch_idx] = detached

        return self._weighted_sum(losses)

    # --- checkpoint/resume support ------------------------------------------
    def state_dict(self) -> Dict:
        return {'loss_history': list(self._loss_history),
                'loss_buffer': list(self._loss_buffer),
                'weights': dict(self._weights)}

    def load_state_dict(self, state: Dict) -> None:
        self._loss_history = deque(state['loss_history'], maxlen=2)
        self._loss_buffer = list(state['loss_buffer'])
        self._weights = dict(state['weights'])
