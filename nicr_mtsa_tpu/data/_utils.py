"""Batch utilities (reference data/_utils.py:12-60).

`move_batch_to_device` transfers numpy entries (recursively through
nested `_down_<k>` dicts and ragged lists) to jax device arrays via
`jax.device_put` per leaf; non-array entries (strings, slices,
provenance meta) pass through untouched."""
from typing import Optional, Sequence

import numpy as np

import jax

from ..types import BatchType


def infer_batch_size(batch: BatchType, key: Optional[str] = None) -> int:
    probe = batch[key] if key is not None \
        else batch.get('rgb', batch.get('depth', None))
    return probe.shape[0]


def _transferable(value) -> bool:
    return isinstance(value, np.ndarray) and value.dtype != object


def move_batch_to_device(
    batch: BatchType,
    device=None,
    keys_to_ignore: Optional[Sequence[str]] = None,
    keys_to_ignore_recursive: bool = True,
) -> BatchType:
    assert isinstance(batch, dict), "Not implemented"
    skip = frozenset(keys_to_ignore or ())

    def place(value):
        if _transferable(value):
            return jax.device_put(value, device)
        if isinstance(value, list):
            return [place(item) if _transferable(item) else item
                    for item in value]
        return value

    out = {}
    for key, value in batch.items():
        if key in skip:
            out[key] = value
        elif isinstance(value, dict) and not hasattr(value,
                                                     '_collate_ignored'):
            # nested multiscale dicts; CollateIgnoredDicts arrive as lists
            out[key] = move_batch_to_device(
                value, device=device,
                keys_to_ignore=(keys_to_ignore
                                if keys_to_ignore_recursive else None))
        else:
            out[key] = place(value)
    return out
