"""Orientation (biternion <-> angle) math.

Behavior mirrors reference utils/_orientation.py:11-57: a biternion is a
(cos, sin) pair in the last/channel dimension; `biternion2rad` computes
atan2(sin, cos) (range (-pi, pi]); degrees are wrapped to [0, 360).

Two flavors: `np_*` for host-side numpy preprocessing, and plain
versions on jax arrays (usable inside jit).
"""
import numpy as np

import jax.numpy as jnp


# --- jax versions (jittable) ------------------------------------------------

def rad2deg(rad):
    return jnp.rad2deg(rad) % 360


def deg2rad(deg):
    return jnp.deg2rad(deg)


def rad2biternion(rad):
    """angle (...,) -> biternion (..., 2) as (cos, sin)."""
    return jnp.stack([jnp.cos(rad), jnp.sin(rad)], axis=-1)


def biternion2rad(biternion):
    """biternion (..., 2) as (cos, sin) -> angle (...,) in (-pi, pi]."""
    return jnp.arctan2(biternion[..., 1], biternion[..., 0])


def deg2biternion(deg):
    return rad2biternion(deg2rad(deg))


def biternion2deg(biternion):
    return rad2deg(biternion2rad(biternion))


def unit_length(x, epsilon=1e-7, axis=-1):
    """Normalize vectors along `axis` to unit length (reference
    utils/_torch.py:60-63 / OrientationOutputNormalization)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / (norm + epsilon)


# --- numpy versions (host preprocessing) ------------------------------------

def np_rad2deg(rad):
    return np.rad2deg(rad) % 360


def np_rad2biternion(rad):
    """Match reference np_rad2biternion: returns array([cos, sin])."""
    return np.array([np.cos(rad), np.sin(rad)], dtype='float32')


def np_biternion2rad(biternion):
    biternion = np.asarray(biternion)
    return np.arctan2(biternion[..., 1], biternion[..., 0])
