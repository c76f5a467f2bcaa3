"""Task-helper base (contract of reference task_helper/base.py:25-210).

A task helper wires one task's losses and metrics around the shared
batch dict:

- `training_step(batch, batch_idx, predictions_post) -> (losses, logs)`
- `validation_step(...) -> (losses, logs)` (also updates metric states)
- `validation_epoch_end() -> (artifacts, examples, logs)`

Differences from the reference: loss element counts stay device scalars
(no `.item()` syncs inside the step); metric states live on device and
reduce via psum; visualization examples are produced host-side only
when `store_examples` is enabled.

The multiscale pairing convention: a decoder's side outputs carry no
scale annotation, so the downscale of each one is recovered by
comparing its spatial width against the main output's, and the matching
target comes from the batch's `_down_<k>` sub-dict at that factor.
"""
import abc
from functools import wraps
from time import perf_counter
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp

from ..data.preprocessing.multiscale_supervision import get_downscale
from ..data.preprocessing.resize import get_fullres
from ..types import BatchType

TOTAL_LOSS_SUFFIX = '_total_loss'


def get_total_loss_key(key: str) -> str:
    return f'{key}{TOTAL_LOSS_SUFFIX}'


def _spatial_width(output) -> int:
    """Width of a prediction; multi-head outputs (tuples) report their
    first head's. Channels-last layout, so width is axis -2."""
    head = output[0] if isinstance(output, (tuple, list)) else output
    return head.shape[-2]


def append_detached_losses_to_logs(disabled=False):
    """Mirror every loss into the log dict (jax arrays are immutable,
    so unlike the reference no detach/clone is needed)."""
    def decorator(step_fn):
        if disabled:
            return step_fn

        @wraps(step_fn)
        def wrapper(*args, **kwargs):
            losses, logs = step_fn(*args, **kwargs)
            logs.update(dict(losses))
            return losses, logs
        return wrapper
    return decorator


def append_profile_to_logs(key, disabled=False):
    """Record the step's host wall time under `key` in its log dict."""
    def decorator(step_fn):
        if disabled:
            return step_fn

        @wraps(step_fn)
        def wrapper(*args, **kwargs):
            tic = perf_counter()
            results = step_fn(*args, **kwargs)
            logs = results[-1]
            assert isinstance(logs, dict)
            logs[key] = perf_counter() - tic
            return results
        return wrapper
    return decorator


class TaskHelperBase(abc.ABC):
    def initialize(self) -> None:
        """Late loss/metric construction (the reference takes a device
        argument; jax metric states are placed by the surrounding
        jit/pjit here)."""

    # --- multiscale prediction/target pairing --------------------------
    def collect_predictions_for_loss(
        self,
        predictions_post: BatchType,
        predictions_post_key: str,
        side_outputs_key: Optional[str] = None,
    ):
        main = predictions_post[predictions_post_key]
        side = [] if side_outputs_key is None else [
            s for s in predictions_post[side_outputs_key] if s is not None]

        downscales = [_spatial_width(main) // _spatial_width(s)
                      for s in side]
        keys = ['main'] + [f'down_{k}' for k in downscales]
        return [main] + side, keys, downscales

    def collect_targets_for_loss(
        self,
        batch: BatchType,
        batch_key: str,
        downscales: Optional[List[int]] = None,
    ):
        targets = [batch[batch_key]]
        for factor in downscales or ():
            sub = get_downscale(batch, factor)
            if sub is not None:    # multiscale supervision may be off
                targets.append(sub[batch_key])
        return targets

    def collect_predictions_and_targets_for_loss(
        self,
        batch: BatchType,
        batch_key: str,
        predictions_post: BatchType,
        predictions_post_key: str,
        side_outputs_key: Optional[str] = None,
    ):
        preds, keys, downscales = self.collect_predictions_for_loss(
            predictions_post, predictions_post_key, side_outputs_key)
        targets = self.collect_targets_for_loss(batch, batch_key, downscales)
        return preds, targets, keys

    # --------------------------------------------------------------------
    def accumulate_losses(self, losses: Sequence, n_elements: Sequence):
        """sum(losses) / sum(n_elements); side outputs are naturally
        down-weighted by their smaller pixel counts. A zero element
        count returns the (then also zero) loss sum unscaled."""
        total_loss = sum(losses)
        total_n = sum(jnp.asarray(n) for n in n_elements)
        return jnp.where(total_n > 0,
                         total_loss / jnp.maximum(total_n, 1), total_loss)

    def mark_as_total(self, key: str) -> str:
        return get_total_loss_key(key)

    @staticmethod
    def get_fullres(batch: BatchType, key: str):
        return get_fullres(batch, key)

    # --------------------------------------------------------------------
    @abc.abstractmethod
    def training_step(self, batch, batch_idx, predictions_post
                      ) -> Tuple[Dict, Dict]:
        ...

    @abc.abstractmethod
    def validation_step(self, batch, batch_idx, predictions_post
                        ) -> Tuple[Dict, Dict]:
        ...

    @abc.abstractmethod
    def validation_epoch_end(self) -> Tuple[Dict, Dict, Dict]:
        ...
