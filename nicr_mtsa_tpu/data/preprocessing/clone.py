"""Sample-entry cloning preprocessors.

Counterpart of reference ``data/preprocessing/clone.py``: snapshot
selected sample entries before later (destructive) preprocessing runs.
Two placement strategies exist — ``CloneEntries`` tucks the snapshot
into one nested sub-dict (skipped by later multiscale fan-out and by
collate), while ``FlatCloneEntries`` re-inserts each copy at top level
under a renamed key (this is what backs the ``*_fullres`` keys).
"""
from copy import deepcopy
from typing import Any, Dict, Iterable, Optional, Tuple

from ...types import SampleType
from .base import PreprocessingBase

DEFAULT_CLONE_KEY = '_no_preprocessing'


def clone_entries(
    sample: SampleType,
    keys_to_clone: Iterable[str],
    ignore_missing_keys: bool = False,
) -> SampleType:
    """Deep-copied subset of ``sample``.

    With ``ignore_missing_keys`` absent keys are silently dropped;
    otherwise they raise KeyError (by looking them up).
    """
    copies: SampleType = {}
    for key in keys_to_clone:
        if ignore_missing_keys and key not in sample:
            continue
        copies[key] = deepcopy(sample[key])
    return copies


class _CloneBase(PreprocessingBase):
    """Shared key selection; subclasses decide where copies land."""

    def __init__(self, keys_to_clone, ignore_missing_keys,
                 fixed_parameters) -> None:
        self._keys_to_clone = keys_to_clone
        self._ignore_missing_keys = ignore_missing_keys
        fixed_parameters = dict(
            fixed_parameters, ignore_missing_keys=ignore_missing_keys)
        super().__init__(fixed_parameters=fixed_parameters,
                         multiscale_processing=False)

    def _selected_keys(self, sample: SampleType) -> Tuple[str, ...]:
        if self._keys_to_clone is not None:
            return tuple(self._keys_to_clone)
        return tuple(sample.keys())


class CloneEntries(_CloneBase):
    """Store copies as one nested dict under ``clone_key``."""

    def __init__(
        self,
        keys_to_clone: Optional[Iterable[str]] = None,
        ignore_missing_keys: bool = False,
        clone_key: str = DEFAULT_CLONE_KEY,
    ) -> None:
        self._clone_key = clone_key
        super().__init__(keys_to_clone, ignore_missing_keys,
                         {'clone_key': clone_key})

    @property
    def clone_key(self):
        return self._clone_key

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        keys = self._selected_keys(sample)
        sample[self._clone_key] = clone_entries(
            sample, keys, self._ignore_missing_keys)
        return sample, {'cloned_keys': keys}


class FlatCloneEntries(_CloneBase):
    """Store each copy top-level under ``<prefix><key><suffix>``."""

    def __init__(
        self,
        keys_to_clone: Optional[Iterable[str]] = None,
        ignore_missing_keys: bool = False,
        key_prefix: Optional[str] = None,
        key_suffix: Optional[str] = None,
    ) -> None:
        if not (key_prefix or key_suffix):
            raise AssertionError(
                'FlatCloneEntries needs a prefix or suffix, otherwise the '
                'copies would overwrite their originals')
        self._rename = (key_prefix or '', key_suffix or '')
        super().__init__(keys_to_clone, ignore_missing_keys,
                         {'key_prefix': self._rename[0],
                          'key_suffix': self._rename[1]})

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        prefix, suffix = self._rename
        copies = clone_entries(sample, self._selected_keys(sample),
                               self._ignore_missing_keys)
        added = [f'{prefix}{key}{suffix}' for key in copies]
        sample.update(zip(added, copies.values()))
        return sample, {'added_keys': added}
