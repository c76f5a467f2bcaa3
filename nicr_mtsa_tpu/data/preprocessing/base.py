"""Preprocessor base: dispatch, multiscale fan-out, provenance meta.

Implements the contract of reference ``data/preprocessing/base.py``:

- ``__call__(sample)`` runs ``_preprocess`` on the sample, then (if
  ``multiscale_processing``) on every nested ``_down_<k>`` sub-sample
  with ``downscale=k``, and finally appends one provenance record
  (fixed + dynamic parameters) to the ``_applied_preprocessing`` list.
- The provenance list is load-bearing: inference postprocessing reads
  ``valid_region_slice_y/x`` from the Resize record to undo
  aspect-ratio padding before the fullres upsample.

Preprocessors run host-side on numpy arrays (per sample, typically in a
data-loading worker); the on-device inference preprocessing lives in
``ops/preproc.py`` as jittable functions.
"""
import abc
from typing import Any, Dict, Iterator, Optional, Tuple

from ...types import SampleType
from .._types import AppliedPreprocessingMeta, PreprocessingParameterDict

MULTI_DOWNSCALE_KEY_FMT = '_down_{}'
APPLIED_PREPROCESSING_KEY = '_applied_preprocessing'

_DOWNSCALE_PREFIX = MULTI_DOWNSCALE_KEY_FMT.format('')


def _downscale_of(key: str) -> Optional[int]:
    """Downscale factor k for a '_down_<k>' key, else None."""
    if not isinstance(key, str) or not key.startswith(_DOWNSCALE_PREFIX):
        return None
    tail = key[len(_DOWNSCALE_PREFIX):]
    return int(tail) if tail.isdigit() else None


def _iter_downscale_keys(sample: SampleType) -> Iterator[Tuple[str, int]]:
    for key in list(sample):
        k = _downscale_of(key)
        if k is not None:
            yield key, k


def get_applied_preprocessing_meta(
        sample: SampleType) -> AppliedPreprocessingMeta:
    """Provenance list of the sample, created on first access."""
    return sample.setdefault(APPLIED_PREPROCESSING_KEY,
                             AppliedPreprocessingMeta())


def add_to_applied_preprocessing_meta(
    sample: SampleType,
    **parameters: Any,
) -> SampleType:
    record = PreprocessingParameterDict(**parameters)
    get_applied_preprocessing_meta(sample).append(record)
    return sample


class PreprocessingBase(abc.ABC):
    """One preprocessing step over the mutable sample dict."""

    def __init__(
        self,
        fixed_parameters: Optional[Dict[str, Any]] = None,
        multiscale_processing: bool = False,
    ) -> None:
        self._multiscale_processing = multiscale_processing
        self._fixed_parameters = dict(
            type=type(self).__name__,
            multiscale_processing=multiscale_processing,
            **(fixed_parameters or {}),
        )

    @property
    def fixed_parameters(self) -> Dict[str, Any]:
        return self._fixed_parameters

    @abc.abstractmethod
    def _preprocess(
        self,
        sample: SampleType,
        **kwargs,
    ) -> Tuple[SampleType, Dict[str, Any]]:
        ...

    def __repr__(self) -> str:
        inner = ', '.join(f'{k}: {v}'
                          for k, v in self.fixed_parameters.items())
        return f'{type(self).__name__}({inner})'

    def __call__(self, sample: SampleType, **kwargs) -> SampleType:
        sample, dynamic = self._preprocess(sample, **kwargs)

        per_scale: Dict[str, Any] = {}
        if self._multiscale_processing:
            for key, factor in _iter_downscale_keys(sample):
                sample[key], per_scale[key] = self._preprocess(
                    sample[key], downscale=factor, **kwargs)

        return add_to_applied_preprocessing_meta(
            sample, **self.fixed_parameters, **dynamic, **per_scale)


class Compose:
    """Sequential composition of preprocessors (stand-in for
    torchvision.transforms.Compose used by the reference test-suite)."""

    def __init__(self, transforms) -> None:
        self.transforms = list(transforms)

    def __call__(self, sample: SampleType) -> SampleType:
        for t in self.transforms:
            sample = t(sample)
        return sample

    def __repr__(self) -> str:
        inner = ', '.join(repr(t) for t in self.transforms)
        return f"Compose([{inner}])"
