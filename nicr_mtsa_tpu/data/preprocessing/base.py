"""Preprocessor base: dispatch, multiscale fan-out, provenance meta.

Matches the contract of reference data/preprocessing/base.py:15-102:

- `__call__(sample)` runs `_preprocess` on the sample, then (if
  `multiscale_processing`) on every nested `_down_<k>` sub-sample with
  `downscale=k`, and finally appends fixed+dynamic parameters to the
  `_applied_preprocessing` provenance list.
- The provenance meta is load-bearing: inference postprocessing reads
  `valid_region_slice_y/x` from the Resize entry to undo aspect-ratio
  padding.

Preprocessors run host-side on numpy arrays (per sample, typically in
a data-loading worker); the on-device inference preprocessing lives in
`ops/preproc.py` as jittable functions.
"""
from typing import Any, Dict, Optional, Tuple

import abc
import re

from ...types import SampleType
from .._types import AppliedPreprocessingMeta
from .._types import PreprocessingParameterDict


MULTI_DOWNSCALE_KEY_FMT = '_down_{}'
APPLIED_PREPROCESSING_KEY = '_applied_preprocessing'


def get_applied_preprocessing_meta(sample: SampleType) -> AppliedPreprocessingMeta:
    if APPLIED_PREPROCESSING_KEY not in sample:
        sample[APPLIED_PREPROCESSING_KEY] = AppliedPreprocessingMeta()
    return sample[APPLIED_PREPROCESSING_KEY]


def add_to_applied_preprocessing_meta(
    sample: SampleType,
    **parameters: Any,
) -> SampleType:
    applied = get_applied_preprocessing_meta(sample)
    applied.append(PreprocessingParameterDict(**parameters))
    return sample


class PreprocessingBase(abc.ABC):
    def __init__(
        self,
        fixed_parameters: Optional[Dict[str, Any]] = None,
        multiscale_processing: bool = False,
    ) -> None:
        self._multiscale_processing = multiscale_processing
        self._fixed_parameters = {
            'type': self.__class__.__name__,
            'multiscale_processing': self._multiscale_processing,
        }
        if fixed_parameters is not None:
            self._fixed_parameters.update(fixed_parameters)

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
        parameter_str = ', '.join(
            f"{k}: {v}" for k, v in self.fixed_parameters.items()
        )
        return f"{self.__class__.__name__}({parameter_str})"

    def __call__(self, sample: SampleType, **kwargs) -> SampleType:
        sample, dynamic_parameters = self._preprocess(sample, **kwargs)

        multiscale_dynamic_parameters = {}
        if self._multiscale_processing:
            for key in list(sample):
                res = re.match(MULTI_DOWNSCALE_KEY_FMT.format('([0-9]+)'), key)
                if res is None:
                    continue
                sample[key], ds_params = self._preprocess(
                    sample[key], downscale=int(res.groups()[0]), **kwargs
                )
                multiscale_dynamic_parameters[key] = ds_params

        sample = add_to_applied_preprocessing_meta(
            sample,
            **self.fixed_parameters,
            **dynamic_parameters,
            **multiscale_dynamic_parameters,
        )
        return sample


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
