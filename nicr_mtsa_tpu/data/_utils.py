"""Batch utilities (reference data/_utils.py:12-60).

`move_batch_to_device` transfers numpy entries (recursively through
nested `_down_<k>` dicts and ragged lists) to jax device arrays via a
single `jax.device_put` call over the collected pytree -- one transfer
instead of one per leaf."""
from typing import Optional, Sequence

import numpy as np

import jax

from ..types import BatchType


def infer_batch_size(batch: BatchType, key: Optional[str] = None) -> int:
    if key is not None:
        return batch[key].shape[0]
    tensor = batch.get('rgb', batch.get('depth', None))
    return tensor.shape[0]


def _transferable(value) -> bool:
    return isinstance(value, np.ndarray) and value.dtype != object


def move_batch_to_device(
    batch: BatchType,
    device=None,
    keys_to_ignore: Optional[Sequence[str]] = None,
    keys_to_ignore_recursive: bool = True,
) -> BatchType:
    assert isinstance(batch, dict), "Not implemented"

    out = {}
    for key, value in batch.items():
        if keys_to_ignore is not None and key in keys_to_ignore:
            out[key] = value
        elif isinstance(value, dict) and not hasattr(value, '_collate_ignored'):
            to_ignore = keys_to_ignore if keys_to_ignore_recursive else None
            # nested multiscale dicts; CollateIgnoredDicts arrive as lists
            out[key] = move_batch_to_device(
                value, device=device, keys_to_ignore=to_ignore
            )
        elif isinstance(value, list):
            out[key] = [
                jax.device_put(item, device) if _transferable(item) else item
                for item in value
            ]
        elif _transferable(value):
            out[key] = jax.device_put(value, device)
        else:
            out[key] = value
    return out
