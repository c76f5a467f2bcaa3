"""Mean absolute angular error (reference metric/mae.py:16-66)."""
import jax.numpy as jnp
import numpy as np

from .base import MetricBase


def abs_angle_error_rad(pred_angle, target_angle):
    """Smallest absolute difference between two angles, in [0, pi].
    Works on jax or numpy arrays."""
    two_pi = 2.0 * jnp.pi
    pred = pred_angle % two_pi
    target = target_angle % two_pi
    diff = pred - target
    err = (diff + jnp.pi) % two_pi - jnp.pi
    return jnp.abs(err)


class MeanAbsoluteAngularError(MetricBase):
    def empty_state(self):
        return {'sum_angular_error': jnp.zeros((), jnp.float32),
                'n_elements': jnp.zeros((), jnp.int32)}

    def update_state(self, state, pred_angles, target_angles, valid=None):
        """pred/target angles: any matching shape (rad); valid: bool
        mask of entries to count (replaces the reference's dict-key
        matching loop, mae.py:44-58)."""
        err = abs_angle_error_rad(jnp.asarray(pred_angles, jnp.float32),
                                  jnp.asarray(target_angles, jnp.float32))
        if valid is not None:
            err = jnp.where(valid, err, 0.0)
            n = jnp.sum(valid.astype(jnp.int32))
        else:
            n = err.size
        return {'sum_angular_error': state['sum_angular_error']
                + jnp.sum(err),
                'n_elements': state['n_elements'] + n}

    def compute_from_state(self, state):
        n = int(np.asarray(state['n_elements']))
        rad = (float(np.asarray(state['sum_angular_error'])) / n
               if n else float('nan'))
        return np.float32(rad), np.float32(np.rad2deg(rad))
