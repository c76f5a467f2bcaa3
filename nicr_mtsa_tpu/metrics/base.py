"""Metric protocol: device-resident pytree states.

The reference relies on torchmetrics (`update()/compute()/reset()`
with `dist_reduce_fx='sum'` states, e.g. metric/miou.py:21-25). Here a
metric is a pair of pure functions over a pytree state:

- `empty_state()` -> state of zeros,
- `update(state, ...)` -> state  (jittable; composes into eval_step),
- `compute(state)` -> results    (host-side, at epoch end),

plus a stateful convenience wrapper with the torchmetrics spelling.
Cross-device reduction is a plain `jax.lax.psum` over the mesh's data
axis (`psum_state`, used inside shard_map/pjit eval steps) -- this
replaces both `dist_reduce_fx='sum'` and the reference's PQ
multiprocessing pool.
"""
from typing import Any

import jax
import jax.numpy as jnp


def psum_state(state: Any, axis_name: str = 'data') -> Any:
    """All-reduce a metric state across the mesh (sum semantics)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.psum(x, axis_name), state)


def add_states(a: Any, b: Any) -> Any:
    """Merge two metric states (sum semantics)."""
    return jax.tree_util.tree_map(jnp.add, a, b)


class MetricBase:
    """Stateful wrapper around the functional metric protocol."""

    def empty_state(self):
        raise NotImplementedError

    def update_state(self, state, *args, **kwargs):
        raise NotImplementedError

    def compute_from_state(self, state):
        raise NotImplementedError

    # --- torchmetrics-style stateful API ------------------------------------
    @property
    def state(self):
        if not hasattr(self, '_state') or self._state is None:
            self._state = self.empty_state()
        return self._state

    @state.setter
    def state(self, value):
        self._state = value

    def update(self, *args, **kwargs):
        self._state = self.update_state(self.state, *args, **kwargs)

    def merge_state(self, other_state):
        self._state = add_states(self.state, other_state)

    def compute(self, *args, **kwargs):
        return self.compute_from_state(self.state, *args, **kwargs)

    def reset(self):
        self._state = self.empty_state()
