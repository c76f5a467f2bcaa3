"""Backbone pretraining heads (reference
model/backbone/pretraining/_imagenet.py:14-46): GAP + FC classifier
used to pretrain backbones on ImageNet before scene-analysis
training."""
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .base import Backbone


class ImageNetClassifier(nn.Module):
    backbone: Backbone = None
    n_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = self.backbone(x, train)
        x = jnp.mean(outs[-1], axis=(1, 2))    # global average pool
        return nn.Dense(self.n_classes, dtype=self.dtype, name='fc')(x)
