"""Scene classification decoder: a single Linear on the global-pool
branch of the context module (fallback: GAP of the context output),
reference model/decoder/scene.py:20-65."""
from typing import Any

import jax.numpy as jnp
import flax.linen as nn


class SceneClassificationDecoder(nn.Module):
    n_channels_in: int = 512
    n_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips=None, train: bool = False):
        cm_output, cm_context_features = x

        if cm_context_features:
            # global-average-pooling branch of the context module
            feat = cm_context_features[0]
            if feat.shape[-3:-1] != (1, 1):
                # larger eval inputs through appm: pool again (chained
                # average pooling == one global pooling)
                feat = jnp.mean(feat, axis=(-3, -2), keepdims=True)
        else:
            feat = jnp.mean(cm_output, axis=(-3, -2), keepdims=True)

        feat = feat.reshape(feat.shape[0], -1)
        out = nn.Dense(self.n_classes, dtype=self.dtype,
                       name='task_head')(feat)
        return out, ()
