"""Final per-sample conversion for device transfer.

TPU-native counterpart of the reference's ToTorchTensors
(data/preprocessing/torch.py:16-73): instead of HWC->CHW, arrays STAY
channels-last (NHWC is the TPU-native conv layout, so the reference's
NCHW/NHWC split disappears); depth gets a trailing channel axis
(HW -> HW1); uint16 -> int32 and uint32 -> int64 conversions keep
integer ids exactly representable on device."""
from typing import Any, Dict, Tuple

import numpy as np

from ...types import SampleType
from .base import PreprocessingBase
from .utils import _get_relevant_tensor_keys


class ToDeviceArrays(PreprocessingBase):
    def __init__(self, multiscale_processing: bool = True) -> None:
        super().__init__(multiscale_processing=multiscale_processing)

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        for key in _get_relevant_tensor_keys(sample):
            value = sample[key]

            if 2 == value.ndim:
                if 'depth' == key:
                    # single channel without channel axis: HW -> HW1
                    value = value[..., np.newaxis]
                # masks/segmentations stay 2d
            elif value.ndim not in (1, 3):
                raise ValueError(f"Cannot handle entry '{key}' with "
                                 f"shape '{value.shape}'")
            elif 1 == value.ndim and key not in (
                'dense_visual_embedding_lut', 'image_embedding',
                'panoptic_segment_table', 'panoptic_segment_table_fullres',
                'panoptic_gt_angle_table', 'panoptic_gt_angle_table_valid',
            ):
                raise ValueError(f"Cannot handle entry '{key}' with "
                                 f"shape '{value.shape}'")

            if value.dtype == np.uint16:
                value = value.astype('int32')
            if value.dtype == np.uint32:
                value = value.astype('int64')

            sample[key] = np.ascontiguousarray(value)

        return sample, {}
