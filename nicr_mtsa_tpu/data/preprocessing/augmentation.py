"""Augmentations: horizontal flip, random crop, HSV jitter.

Mirrors reference flip.py:14-55, crop.py:16-79, rgb.py:43-118. The HSV
conversion is a numpy re-implementation of OpenCV's uint8 HSV
convention (H in [0, 180) with 2-degree steps, S/V in [0, 255]) so no
cv2 dependency is needed at runtime.
"""
from typing import Any, Dict, Iterable, Optional, Tuple

import numpy as np

from ...types import SampleType
from .base import PreprocessingBase
from .resize import resize
from .utils import _get_input_shape
from .utils import _get_relevant_spatial_keys


class RandomHorizontalFlip(PreprocessingBase):
    def __init__(
        self,
        p: float,
        keys_to_ignore: Optional[Iterable[str]] = None,
    ) -> None:
        self._p = p
        self._keys_to_ignore = keys_to_ignore
        super().__init__(
            fixed_parameters={'p': self._p},
            multiscale_processing=False,
        )

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        # must run before the orientation target generator (flip.py:36-38)
        if 'orientations_present' in sample:
            raise RuntimeError("Do not apply `RandomHorizontalFlip` after "
                               "`OrientationTargetGenerator`.")

        do_flip = np.random.uniform() <= self._p
        if do_flip:
            for key in _get_relevant_spatial_keys(
                sample, keys_to_ignore=self._keys_to_ignore
            ):
                sample[key] = np.flip(sample[key], axis=1)

            if 'orientations' in sample:
                # mirror orientations at the y axis
                for id_ in sample['orientations']:
                    sample['orientations'][id_] = \
                        (2 * np.pi - sample['orientations'][id_]) % (2 * np.pi)

        return sample, {'was_flipped': do_flip}


class RandomCrop(PreprocessingBase):
    def __init__(
        self,
        crop_height: int,
        crop_width: int,
        keys_to_ignore: Optional[Iterable[str]] = None,
    ) -> None:
        self._crop_height = crop_height
        self._crop_width = crop_width
        self._keys_to_ignore = keys_to_ignore
        super().__init__(
            fixed_parameters={
                'crop_height': self._crop_height,
                'crop_width': self._crop_width,
                'keys_to_ignore': self._keys_to_ignore,
            },
            multiscale_processing=False,
        )

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        h, w = _get_input_shape(sample)

        # resize image first if it is too small
        scale = 1.0
        if h <= self._crop_height:
            scale = max(self._crop_height / h, scale)
        if w <= self._crop_width:
            scale = max(self._crop_width / w, scale)

        if scale > 1.0:
            h, w = int(h * scale + 0.5), int(w * scale + 0.5)
            sample = resize(sample, height=h, width=w,
                            keys_to_ignore=self._keys_to_ignore)

        y_start = np.random.randint(0, h - self._crop_height) \
            if (h - self._crop_height) > 0 else 0
        x_start = np.random.randint(0, w - self._crop_width) \
            if (w - self._crop_width) > 0 else 0
        slice_y = slice(y_start, y_start + self._crop_height)
        slice_x = slice(x_start, x_start + self._crop_width)

        for key in _get_relevant_spatial_keys(
            sample, keys_to_ignore=self._keys_to_ignore
        ):
            sample[key] = sample[key][slice_y, slice_x, ...]

        return sample, {'was_resized': scale != 1.0,
                        'resize_height': h,
                        'resize_width': w,
                        'crop_slice_y': slice_y,
                        'crop_slice_x': slice_x}


# --- uint8 HSV conversion (OpenCV convention, numpy implementation) ---------

def rgb_to_hsv_uint8(img_rgb: np.ndarray) -> np.ndarray:
    """uint8 RGB -> uint8 HSV with H in [0, 180), S/V in [0, 255]."""
    rgb = img_rgb.astype(np.int32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = np.maximum(np.maximum(r, g), b)
    mn = np.minimum(np.minimum(r, g), b)
    diff = v - mn

    # saturation: 255 * diff / v (0 where v == 0)
    s = np.where(v == 0, 0,
                 np.floor_divide(255 * diff + v // 2, np.maximum(v, 1)))

    # hue in [0, 360) degrees then halved to [0, 180)
    diff_safe = np.maximum(diff, 1).astype(np.float64)
    h = np.where(
        v == r, (60.0 * (g - b)) / diff_safe,
        np.where(v == g, 120.0 + (60.0 * (b - r)) / diff_safe,
                 240.0 + (60.0 * (r - g)) / diff_safe))
    h = np.where(diff == 0, 0.0, h)
    h = np.where(h < 0, h + 360.0, h)
    h = np.round(h / 2.0).astype(np.int32) % 180

    return np.stack([h, s, v], axis=-1).astype(np.uint8)


def hsv_to_rgb_uint8(img_hsv: np.ndarray) -> np.ndarray:
    """uint8 HSV (H in [0, 180)) -> uint8 RGB."""
    h = img_hsv[..., 0].astype(np.float64) * 2.0        # degrees
    s = img_hsv[..., 1].astype(np.float64) / 255.0
    v = img_hsv[..., 2].astype(np.float64) / 255.0

    c = v * s
    hp = h / 60.0
    x = c * (1.0 - np.abs(hp % 2.0 - 1.0))
    m = v - c

    hi = np.floor(hp).astype(np.int32) % 6
    z = np.zeros_like(c)
    r = np.choose(hi, [c, x, z, z, x, c])
    g = np.choose(hi, [x, c, c, x, z, z])
    b = np.choose(hi, [z, z, x, c, c, x])

    rgb = np.stack([r + m, g + m, b + m], axis=-1)
    return np.clip(np.round(rgb * 255.0), 0, 255).astype(np.uint8)


def adjust_hsv(
    img_rgb: np.ndarray,
    h_offset: int,
    s_offset: int,
    v_offset: int,
) -> np.ndarray:
    """Additive jitter in uint8 HSV space (reference rgb.py:28-40):
    hue wraps modulo 180, saturation/value are clipped to [0, 255]."""
    assert -180 <= h_offset <= 180
    assert -255 <= s_offset <= 255
    assert -255 <= v_offset <= 255

    from ...native import hsv_jitter_u8 as _native_hsv
    out = _native_hsv(img_rgb, h_offset, s_offset, v_offset)
    if out is not None:
        return out

    img_hsv = rgb_to_hsv_uint8(img_rgb)
    img_h = ((img_hsv[..., 0].astype('int') + h_offset) % 180).astype('uint8')
    img_s = np.clip(img_hsv[..., 1].astype('int') + s_offset,
                    0, 255).astype('uint8')
    img_v = np.clip(img_hsv[..., 2].astype('int') + v_offset,
                    0, 255).astype('uint8')
    return hsv_to_rgb_uint8(np.stack([img_h, img_s, img_v], axis=2))


class RandomHSVJitter(PreprocessingBase):
    def __init__(
        self,
        hue_jitter: float,
        saturation_jitter: float,
        value_jitter: float,
    ) -> None:
        self._hue_limits = [int(-hue_jitter * (360 / 2)),
                            int(hue_jitter * (360 / 2))]
        self._saturation_limits = [int(-saturation_jitter * 255),
                                   int(saturation_jitter * 255)]
        self._value_limits = [int(-value_jitter * 255),
                              int(value_jitter * 255)]
        super().__init__(
            fixed_parameters={
                'hue_limits': self._hue_limits,
                'saturation_limits': self._saturation_limits,
                'value_limits': self._value_limits,
            },
            multiscale_processing=False,
        )

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        if 'rgb' not in sample:
            return sample, {}

        img = sample['rgb']
        assert img.dtype == 'uint8'

        h_offset = np.random.randint(self._hue_limits[0], self._hue_limits[1])
        s_offset = np.random.randint(self._saturation_limits[0],
                                     self._saturation_limits[1])
        v_offset = np.random.randint(self._value_limits[0],
                                     self._value_limits[1])

        sample['rgb'] = adjust_hsv(img, h_offset, s_offset, v_offset)

        return sample, {'applied_hue_offset': h_offset,
                        'applied_saturation_offset': s_offset,
                        'applied_value_offset': v_offset}
