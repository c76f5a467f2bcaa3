"""Masked per-pixel RMSE (surface normals), reference
metric/rmse.py:12-62: the per-PIXEL root of the channel-mean squared
error is accumulated and then averaged over pixels (mean of per-pixel
RMS values -- NOT the root of the pooled mean squared error; the two
differ whenever errors vary across pixels, and the reference reports
the former)."""
import jax.numpy as jnp
import numpy as np

from .base import MetricBase


class RootMeanSquaredError(MetricBase):
    def empty_state(self):
        return {'sum_rmse': jnp.zeros((), jnp.float32),
                'n_elements': jnp.zeros((), jnp.int32)}

    def update_state(self, state, preds, target, mask=None):
        """preds/target: (..., C); mask: (...,) bool of valid pixels."""
        se = jnp.mean(
            (preds.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
            axis=-1)
        rmse = jnp.sqrt(se)
        if mask is not None:
            rmse = jnp.where(mask, rmse, 0.0)
            n = jnp.sum(mask.astype(jnp.int32))
        else:
            n = rmse.size
        return {'sum_rmse': state['sum_rmse'] + jnp.sum(rmse),
                'n_elements': state['n_elements'] + n}

    def compute_from_state(self, state):
        total = float(np.asarray(state['sum_rmse']))
        n = int(np.asarray(state['n_elements']))
        return np.float32(total / n if n else 0.0)
