"""Sample-entry snapshotting.

Counterpart of reference ``data/preprocessing/clone.py``: snapshot
selected sample entries before later (destructive) preprocessing runs.
Two placement strategies exist — ``CloneEntries`` tucks the snapshot
into one nested sub-dict (skipped by later multiscale fan-out and by
collate), while ``FlatCloneEntries`` re-inserts each copy at top level
under a renamed key (this is what backs the ``*_fullres`` keys).
"""
from copy import deepcopy

from ...types import SampleType
from .base import PreprocessingBase

DEFAULT_CLONE_KEY = '_no_preprocessing'


def clone_entries(sample, keys_to_clone, ignore_missing_keys=False):
    """Deep-copied subset of ``sample`` (dict of fresh objects).

    Unknown keys raise KeyError unless ``ignore_missing_keys``, in
    which case they are silently dropped from the result.
    """
    wanted = list(keys_to_clone)
    if ignore_missing_keys:
        wanted = [k for k in wanted if k in sample]
    return {k: deepcopy(sample[k]) for k in wanted}


class CloneEntries(PreprocessingBase):
    """Snapshot entries into ONE nested dict at ``clone_key``."""

    def __init__(self, keys_to_clone=None, ignore_missing_keys=False,
                 clone_key=DEFAULT_CLONE_KEY):
        self._keys_to_clone = keys_to_clone
        self._ignore_missing_keys = ignore_missing_keys
        self._clone_key = clone_key
        super().__init__(
            fixed_parameters={'clone_key': clone_key,
                              'ignore_missing_keys': ignore_missing_keys},
            multiscale_processing=False)

    @property
    def clone_key(self):
        return self._clone_key

    def _preprocess(self, sample: SampleType, **kwargs):
        wanted = tuple(self._keys_to_clone or sample.keys())
        nested = clone_entries(sample, wanted, self._ignore_missing_keys)
        sample[self._clone_key] = nested
        return sample, {'cloned_keys': wanted}


class FlatCloneEntries(PreprocessingBase):
    """Snapshot entries back at TOP level as ``<prefix><key><suffix>``."""

    def __init__(self, keys_to_clone=None, ignore_missing_keys=False,
                 key_prefix=None, key_suffix=None):
        if not key_prefix and not key_suffix:
            raise AssertionError(
                'FlatCloneEntries needs a prefix or suffix, otherwise the '
                'copies would overwrite their originals')
        self._keys_to_clone = keys_to_clone
        self._ignore_missing_keys = ignore_missing_keys
        self._fmt = (key_prefix or '') + '{}' + (key_suffix or '')
        super().__init__(
            fixed_parameters={'key_prefix': key_prefix or '',
                              'key_suffix': key_suffix or '',
                              'ignore_missing_keys': ignore_missing_keys},
            multiscale_processing=False)

    def _preprocess(self, sample: SampleType, **kwargs):
        wanted = tuple(self._keys_to_clone or sample.keys())
        renamed = {
            self._fmt.format(k): v
            for k, v in clone_entries(
                sample, wanted, self._ignore_missing_keys).items()
        }
        sample.update(renamed)
        return sample, {'added_keys': list(renamed)}
