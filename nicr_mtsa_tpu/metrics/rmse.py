"""Masked per-pixel RMSE (surface normals), reference
metric/rmse.py:12-62: channel-mean squared error per pixel,
mask-aware accumulation."""
import jax.numpy as jnp
import numpy as np

from .base import MetricBase


class RootMeanSquaredError(MetricBase):
    def empty_state(self):
        return {'sum_squared_error': jnp.zeros((), jnp.float32),
                'n_elements': jnp.zeros((), jnp.int32)}

    def update_state(self, state, preds, target, mask=None):
        """preds/target: (..., C); mask: (...,) bool of valid pixels."""
        se = jnp.mean(
            (preds.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
            axis=-1)
        if mask is not None:
            se = jnp.where(mask, se, 0.0)
            n = jnp.sum(mask.astype(jnp.int32))
        else:
            n = se.size
        return {'sum_squared_error': state['sum_squared_error'] + jnp.sum(se),
                'n_elements': state['n_elements'] + n}

    def compute_from_state(self, state):
        sse = float(np.asarray(state['sum_squared_error']))
        n = int(np.asarray(state['n_elements']))
        return np.float32(np.sqrt(sse / n) if n else 0.0)
