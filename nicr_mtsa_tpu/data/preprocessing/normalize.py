"""RGB / depth normalization (reference data/preprocessing/normalize.py)."""
from typing import Any, Dict, Tuple

import numpy as np

from ...types import SampleType
from .base import PreprocessingBase


def normalize(
    value: np.ndarray,
    mean: np.ndarray,
    std: np.ndarray,
    dtype: str = 'float32',
    inplace: bool = False,
) -> np.ndarray:
    if value.dtype != dtype:
        value = value.astype(dtype, copy=True)
    elif not inplace:
        value = value.copy()
    value -= mean[np.newaxis, np.newaxis, ...]
    value /= std[np.newaxis, np.newaxis, ...]
    return value


# ImageNet statistics scaled to [0, 255] inputs (normalize.py:44-47)
RGB_MEAN = np.array((0.485, 0.456, 0.406), dtype='float32') * 255
RGB_STD = np.array((0.229, 0.224, 0.225), dtype='float32') * 255


class NormalizeRGB(PreprocessingBase):
    def __init__(
        self,
        output_dtype: str = 'float32',
        multiscale_processing: bool = False,
    ) -> None:
        self._output_dtype = output_dtype
        self._rgb_mean = RGB_MEAN.astype(output_dtype)
        self._rgb_std = RGB_STD.astype(output_dtype)
        super().__init__(
            fixed_parameters={
                'rgb_mean': self._rgb_mean.tolist(),
                'rgb_std': self._rgb_std.tolist(),
                'output_dtype': self._output_dtype,
            },
            multiscale_processing=multiscale_processing,
        )

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        assert sample['rgb'].dtype == 'uint8'
        sample['rgb'] = normalize(sample['rgb'],
                                  mean=self._rgb_mean,
                                  std=self._rgb_std,
                                  dtype=self._output_dtype,
                                  inplace=False)
        return sample, {}


class NormalizeDepth(PreprocessingBase):
    def __init__(
        self,
        depth_mean: float,
        depth_std: float,
        raw_depth: bool = False,
        invalid_depth_value: float = 0.0,
        output_dtype: str = 'float32',
        multiscale_processing: bool = False,
    ) -> None:
        assert depth_std != 0.0
        self._raw_depth = raw_depth
        self._invalid_depth_value = invalid_depth_value
        self._output_dtype = output_dtype
        self._depth_mean = np.array(depth_mean, dtype=output_dtype)
        self._depth_std = np.array(depth_std, dtype=output_dtype)
        super().__init__(
            fixed_parameters={
                'depth_mean': self._depth_mean.tolist(),
                'depth_std': self._depth_std.tolist(),
                'raw_depth': self._raw_depth,
                'invalid_depth_value': self._invalid_depth_value,
                'output_dtype': self._output_dtype,
            },
            multiscale_processing=multiscale_processing,
        )

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        if self._raw_depth:
            invalid_mask = sample['depth'] == self._invalid_depth_value

        sample['depth'] = normalize(sample['depth'],
                                    mean=self._depth_mean,
                                    std=self._depth_std,
                                    dtype=self._output_dtype,
                                    inplace=False)

        if self._raw_depth:
            # the network should not learn from invalid values
            sample['depth'][invalid_mask] = self._invalid_depth_value
        return sample, {}


class ScaleDepth(PreprocessingBase):
    """Per-sample min/max depth rescale (reference scale.py:12-67)."""

    def __init__(
        self,
        new_min: float = 0.0,
        new_max: float = 1.0,
        raw_depth: bool = False,
        invalid_depth_value: float = 0.0,
        output_dtype: str = 'float32',
        multiscale_processing: bool = False,
    ) -> None:
        self._new_min = new_min
        self._new_max = new_max
        self._raw_depth = raw_depth
        self._invalid_depth_value = invalid_depth_value
        self._output_dtype = output_dtype
        super().__init__(
            fixed_parameters={
                'new_min': self._new_min,
                'new_max': self._new_max,
                'raw_depth': self._raw_depth,
                'invalid_depth_value': self._invalid_depth_value,
                'output_dtype': self._output_dtype,
            },
            multiscale_processing=multiscale_processing,
        )

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        depth = sample['depth']
        if depth.dtype != self._output_dtype:
            depth = depth.astype(self._output_dtype, copy=True)

        if self._raw_depth:
            invalid_mask = depth == self._invalid_depth_value

        cur_min, cur_max = depth.min(), depth.max()
        depth = (depth - cur_min) / (cur_max - cur_min)
        depth = depth * (self._new_max - self._new_min) + self._new_min

        if self._raw_depth:
            depth[invalid_mask] = self._invalid_depth_value

        sample['depth'] = depth
        return sample, {}
