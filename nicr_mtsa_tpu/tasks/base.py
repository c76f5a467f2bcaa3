"""Task-helper base (reference task_helper/base.py:25-210).

A task helper wires one task's losses and metrics around the shared
batch dict:

- `training_step(batch, batch_idx, predictions_post) -> (losses, logs)`
- `validation_step(...) -> (losses, logs)` (also updates metric states)
- `validation_epoch_end() -> (artifacts, examples, logs)`

Differences from the reference: loss element counts stay device
scalars (no `.item()` syncs inside the step); metric states live on
device and reduce via psum; visualization examples are produced
host-side only when `store_examples` is enabled.
"""
import abc
from functools import wraps
from time import perf_counter
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.preprocessing.multiscale_supervision import get_downscale
from ..data.preprocessing.resize import get_fullres
from ..types import BatchType


TOTAL_LOSS_SUFFIX = '_total_loss'


def get_total_loss_key(key: str) -> str:
    return f'{key}{TOTAL_LOSS_SUFFIX}'


def append_detached_losses_to_logs(disabled=False):
    def decorator(f):
        @wraps(f)
        def wrapper(*args, **kwargs):
            if disabled:
                return f(*args, **kwargs)
            losses, logs = f(*args, **kwargs)
            # jax arrays are immutable; no detach/clone needed
            logs.update(dict(losses))
            return losses, logs
        return wrapper
    return decorator


def append_profile_to_logs(key, disabled=False):
    def decorator(f):
        @wraps(f)
        def wrapper(*args, **kwargs):
            if disabled:
                return f(*args, **kwargs)
            start = perf_counter()
            results = f(*args, **kwargs)
            end = perf_counter()
            assert isinstance(results[-1], dict)
            results[-1][key] = end - start
            return results
        return wrapper
    return decorator


class TaskHelperBase(abc.ABC):
    def initialize(self) -> None:
        """Late loss/metric construction (reference takes a device
        argument; states are jax arrays placed by the surrounding
        jit/pjit here)."""

    # --- collection of multiscale predictions/targets -----------------------
    def collect_predictions_and_targets_for_loss(
        self,
        batch: BatchType,
        batch_key: str,
        predictions_post: BatchType,
        predictions_post_key: str,
        side_outputs_key: Optional[str] = None,
    ):
        input_tensors, keys, downscales = self.collect_predictions_for_loss(
            predictions_post, predictions_post_key, side_outputs_key)
        target_tensors = self.collect_targets_for_loss(
            batch, batch_key, downscales)
        return input_tensors, target_tensors, keys

    def collect_predictions_for_loss(
        self,
        predictions_post: BatchType,
        predictions_post_key: str,
        side_outputs_key: Optional[str] = None,
    ):
        prediction_tensors = [predictions_post[predictions_post_key]]
        keys = ['main']
        downscales: List[int] = []

        def _get_width(output):
            if isinstance(output, (tuple, list)):
                # multi-head side output (instance task)
                output = output[0]
            # channels-last: width is axis -2
            return output.shape[-2]

        if side_outputs_key is not None:
            width_main = _get_width(predictions_post[predictions_post_key])
            for side_output in predictions_post[side_outputs_key]:
                if side_output is None:
                    continue
                prediction_tensors.append(side_output)
                width_side = _get_width(side_output)
                downscales.append(width_main // width_side)
                keys.append(f'down_{downscales[-1]}')

        return prediction_tensors, keys, downscales

    def collect_targets_for_loss(
        self,
        batch: BatchType,
        batch_key: str,
        downscales: Optional[List[int]] = None,
    ):
        target_tensors = [batch[batch_key]]
        if downscales is not None:
            for downscale in downscales:
                batch_downscale = get_downscale(batch, downscale)
                if batch_downscale is None:
                    continue
                target_tensors.append(batch_downscale[batch_key])
        return target_tensors

    # ------------------------------------------------------------------------
    def accumulate_losses(self, losses: Sequence, n_elements: Sequence):
        """sum(losses) / sum(n_elements); side outputs are naturally
        down-weighted by their smaller pixel counts. Division by zero
        yields 0 (the sum is 0 then as well)."""
        total_loss = sum(losses)
        total_n = sum(jnp.asarray(n) for n in n_elements)
        return jnp.where(total_n > 0,
                         total_loss / jnp.maximum(total_n, 1), total_loss)

    def mark_as_total(self, key: str) -> str:
        return get_total_loss_key(key)

    @staticmethod
    def get_fullres(batch: BatchType, key: str):
        return get_fullres(batch, key)

    # ------------------------------------------------------------------------
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
