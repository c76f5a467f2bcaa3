"""Backbone interface.

Reference model/backbone/base.py:12-43: a backbone is a sequence of
stages with per-stage `n_channels` / `downsampling` metadata. Here a
backbone is a flax module whose `__call__(x, train)` returns the list
of ALL stage outputs (the encoder picks the ones it needs for skips;
XLA dead-code-eliminates unused outputs, so this costs nothing).

The reference's per-stage `memory_layout` metadata (nchw vs nhwc for
Swin) is gone: everything is NHWC on TPU.
"""
from typing import Any, List, Sequence

import jax.numpy as jnp
import flax.linen as nn


class Backbone(nn.Module):
    """Abstract backbone; subclasses define the `stages_*` metadata as
    properties derived from their config fields."""
    dtype: Any = jnp.float32

    @property
    def stages_n_channels(self) -> List[int]:
        raise NotImplementedError

    @property
    def stages_downsampling(self) -> List[int]:
        raise NotImplementedError

    @property
    def n_stages(self) -> int:
        return len(self.stages_n_channels)

    def __call__(self, x, train: bool = False) -> Sequence:
        raise NotImplementedError
