"""Input-statistic normalization for RGB and depth.

Counterpart of reference ``data/preprocessing/normalize.py`` plus
``scale.py``. RGB uses the ImageNet channel statistics scaled to
[0, 255] inputs; depth uses dataset statistics or a per-sample min/max
rescale (``ScaleDepth``). Raw (sensor) depth carries holes encoded as a
sentinel value — those pixels are restored after normalization so the
network never trains on them.
"""
from typing import Any, Dict, Tuple

import numpy as np

from ...types import SampleType
from .base import PreprocessingBase

# torchvision ImageNet statistics, scaled for uint8 [0, 255] inputs
RGB_MEAN = np.float32(255) * np.array((0.485, 0.456, 0.406), 'float32')
RGB_STD = np.float32(255) * np.array((0.229, 0.224, 0.225), 'float32')


def normalize(value, mean, std, dtype: str = 'float32',
              inplace: bool = False):
    """(value - mean) / std with channel stats broadcast over H, W.

    A copy is made when converting dtype or when ``inplace`` is off;
    the arithmetic itself always runs in the output dtype.
    """
    needs_cast = value.dtype != dtype
    work = value.astype(dtype, copy=True) if needs_cast else (
        value if inplace else value.copy())
    work -= mean[np.newaxis, np.newaxis, ...]
    work /= std[np.newaxis, np.newaxis, ...]
    return work


class _DepthHolePreserving(PreprocessingBase):
    """Base for depth transforms that must keep sentinel holes intact."""

    def __init__(self, raw_depth: bool, invalid_depth_value: float,
                 output_dtype: str, fixed_parameters: Dict[str, Any],
                 multiscale_processing: bool) -> None:
        self._raw_depth = raw_depth
        self._invalid_depth_value = invalid_depth_value
        self._output_dtype = output_dtype
        fixed_parameters.update(
            raw_depth=raw_depth,
            invalid_depth_value=invalid_depth_value,
            output_dtype=output_dtype,
        )
        super().__init__(fixed_parameters=fixed_parameters,
                         multiscale_processing=multiscale_processing)

    def _transform_depth(self, depth: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        depth = sample['depth']
        holes = (depth == self._invalid_depth_value) if self._raw_depth \
            else None
        depth = self._transform_depth(depth)
        if holes is not None:
            depth[holes] = self._invalid_depth_value
        sample['depth'] = depth
        return sample, {}


class NormalizeRGB(PreprocessingBase):
    """ImageNet-statistics normalization of the uint8 RGB image."""

    def __init__(
        self,
        output_dtype: str = 'float32',
        multiscale_processing: bool = False,
    ) -> None:
        self._output_dtype = output_dtype
        self._rgb_mean = RGB_MEAN.astype(output_dtype)
        self._rgb_std = RGB_STD.astype(output_dtype)
        super().__init__(
            fixed_parameters=dict(
                rgb_mean=self._rgb_mean.tolist(),
                rgb_std=self._rgb_std.tolist(),
                output_dtype=output_dtype,
            ),
            multiscale_processing=multiscale_processing,
        )

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        rgb = sample['rgb']
        assert rgb.dtype == 'uint8'
        sample['rgb'] = normalize(rgb, self._rgb_mean, self._rgb_std,
                                  dtype=self._output_dtype)
        return sample, {}


class NormalizeDepth(_DepthHolePreserving):
    """Dataset mean/std normalization of the depth image."""

    def __init__(
        self,
        depth_mean: float,
        depth_std: float,
        raw_depth: bool = False,
        invalid_depth_value: float = 0.0,
        output_dtype: str = 'float32',
        multiscale_processing: bool = False,
    ) -> None:
        if depth_std == 0.0:
            raise AssertionError('depth_std must be non-zero')
        self._depth_mean = np.array(depth_mean, dtype=output_dtype)
        self._depth_std = np.array(depth_std, dtype=output_dtype)
        super().__init__(
            raw_depth, invalid_depth_value, output_dtype,
            dict(depth_mean=self._depth_mean.tolist(),
                 depth_std=self._depth_std.tolist()),
            multiscale_processing)

    def _transform_depth(self, depth: np.ndarray) -> np.ndarray:
        return normalize(depth, self._depth_mean, self._depth_std,
                         dtype=self._output_dtype)


class ScaleDepth(_DepthHolePreserving):
    """Per-sample min/max rescale of depth to [new_min, new_max]
    (counterpart of reference ``scale.py:12-67``)."""

    def __init__(
        self,
        new_min: float = 0.0,
        new_max: float = 1.0,
        raw_depth: bool = False,
        invalid_depth_value: float = 0.0,
        output_dtype: str = 'float32',
        multiscale_processing: bool = False,
    ) -> None:
        self._out_range = (new_min, new_max)
        super().__init__(
            raw_depth, invalid_depth_value, output_dtype,
            dict(new_min=new_min, new_max=new_max),
            multiscale_processing)

    def _transform_depth(self, depth: np.ndarray) -> np.ndarray:
        if depth.dtype != self._output_dtype:
            depth = depth.astype(self._output_dtype, copy=True)
        lo, hi = self._out_range
        unit = (depth - depth.min()) / (depth.max() - depth.min())
        return unit * (hi - lo) + lo
