"""Resize / pad / valid-region preprocessing (host-side numpy).

Re-implements the semantics of reference data/preprocessing/resize.py
without OpenCV:

- nearest-neighbor resize is a pure index gather (`floor(i*src/dst)`,
  the cv2.INTER_NEAREST mapping), which is *exact for any dtype* --
  the reference's bool->uint8 and uint32-as-4xuint8 view workarounds
  (resize.py:123-139) become unnecessary.
- bilinear resize (rgb only) uses half-pixel-centered sampling with
  edge clamping, matching cv2.INTER_LINEAR up to its fixed-point
  rounding (verified within +-2/255 in tests).
- `Resize` records `valid_region_slice_y/x` in the provenance meta
  (resize.py:202-285); inference postprocessing uses those slices to
  crop away aspect-ratio padding before full-resolution upsampling.
"""
from typing import Any, Dict, Iterable, Optional, Tuple

import numpy as np

from ...types import SampleType
from .base import PreprocessingBase, get_applied_preprocessing_meta
from .clone import FlatCloneEntries
from .utils import _get_input_shape, _get_relevant_spatial_keys

FULLRES_SUFFIX = '_fullres'


def get_fullres_key(key: str) -> str:
    return key + FULLRES_SUFFIX


def get_fullres(sample: SampleType, key: str) -> Any:
    return sample.get(get_fullres_key(key), None)


def get_fullres_shape(sample: SampleType, key: str) -> Tuple[int, int]:
    for k in (key, 'rgb', 'depth'):
        img = get_fullres(sample, k)
        if img is not None:
            # batched arrays are NHWC/NHW; per-sample are HWC/HW -- in all
            # cases the spatial dims are the first two after stripping an
            # optional leading batch axis and optional trailing channels.
            shape = img.shape
            if img.ndim == 2:
                return tuple(shape)
            if img.ndim == 3:
                # ambiguous HWC vs NHW: channels are small (<=4)
                if shape[-1] <= 4:
                    return tuple(shape[:2])
                return tuple(shape[1:3])
            # ndim == 4: NHWC
            return tuple(shape[1:3])
    raise ValueError(f"Unable to get fullres shape for `{key}`.")


def get_valid_region_slices(sample: SampleType) -> Tuple[slice, slice]:
    meta = get_applied_preprocessing_meta(sample)
    # all samples in a batch share the original resolution -> first element
    entries = meta[0] if (len(meta) and isinstance(meta[0], list)) else meta
    for pre in entries:
        if pre.get('type', None) == 'Resize':
            return (pre['valid_region_slice_y'], pre['valid_region_slice_x'])
    raise ValueError("Unable to get valid region slices.")


def get_valid_region_slices_and_fullres_shape(
    sample: SampleType,
    key: str,
) -> Tuple[Tuple[slice, slice], Tuple[int, int]]:
    return get_valid_region_slices(sample), get_fullres_shape(sample, key)


class FullResCloner(FlatCloneEntries):
    """Backs up selected entries under `<key>_fullres` names before any
    resize touches them (the eval path compares predictions against
    these full-resolution ground truths)."""

    def __init__(self, keys_to_keep_fullres: Optional[Iterable[str]] = None,
                 ignore_missing_keys: bool = True) -> None:
        super().__init__(keys_to_clone=keys_to_keep_fullres,
                         key_suffix=FULLRES_SUFFIX, key_prefix='',
                         ignore_missing_keys=ignore_missing_keys)


# --- core numpy kernels -----------------------------------------------------

def _nearest_indices(n_src: int, n_dst: int) -> np.ndarray:
    # cv2.INTER_NEAREST mapping: sx = floor(dx * src/dst)
    idx = np.floor(np.arange(n_dst) * (n_src / n_dst)).astype(np.int64)
    return np.clip(idx, 0, n_src - 1)


def resize_image_nearest(value: np.ndarray, height: int,
                         width: int) -> np.ndarray:
    """Nearest resize via index gather; exact for any dtype. Uses the
    native multithreaded kernel (native/mtsa_preproc.cpp) when built,
    with this numpy path as the exact-equivalent fallback."""
    h, w = value.shape[:2]
    if (h, w) == (height, width):
        return value.copy()
    from ...native import nearest_resize as _native_nearest
    out = _native_nearest(value, height, width)
    if out is not None:
        return out
    yi = _nearest_indices(h, height)
    xi = _nearest_indices(w, width)
    return value[yi[:, None], xi[None, :], ...]


def resize_image_bilinear(value: np.ndarray, height: int,
                          width: int) -> np.ndarray:
    """Half-pixel-centered bilinear resize with edge clamping
    (cv2.INTER_LINEAR semantics)."""
    h, w = value.shape[:2]
    if (h, w) == (height, width):
        return value.copy()

    if value.dtype == np.uint8:
        from ...native import bilinear_resize_u8 as _native_bilinear
        out = _native_bilinear(value, height, width)
        if out is not None:
            return out

    in_dtype = value.dtype
    x = np.asarray(value, dtype=np.float32)

    def coords(n_src, n_dst):
        c = (np.arange(n_dst) + 0.5) * (n_src / n_dst) - 0.5
        c0 = np.floor(c).astype(np.int64)
        frac = (c - c0).astype(np.float32)
        c0c = np.clip(c0, 0, n_src - 1)
        c1c = np.clip(c0 + 1, 0, n_src - 1)
        return c0c, c1c, frac

    y0, y1, fy = coords(h, height)
    x0, x1, fx = coords(w, width)

    fy = fy.reshape(-1, 1, *([1] * (x.ndim - 2)))
    fx = fx.reshape(1, -1, *([1] * (x.ndim - 2)))

    top = x[y0][:, x0] * (1 - fx) + x[y0][:, x1] * fx
    bot = x[y1][:, x0] * (1 - fx) + x[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy

    if np.issubdtype(in_dtype, np.integer):
        info = np.iinfo(in_dtype)
        out = np.clip(np.round(out), info.min, info.max)
    return out.astype(in_dtype)


def _resizable_keys(sample: SampleType,
                    keys_to_ignore: Optional[Iterable[str]]) -> list:
    """Spatial keys minus explicit ignores and *_fullres backups."""
    skip = list(keys_to_ignore or [])
    skip += [k for k in sample if k.endswith(FULLRES_SUFFIX)]
    return _get_relevant_spatial_keys(sample, keys_to_ignore=skip)


def resize(sample: SampleType, height: int, width: int,
           keys_to_ignore: Optional[Iterable[str]] = None) -> SampleType:
    """Resize all spatial entries; bilinear for `rgb`, nearest otherwise
    (depth, masks, segmentations, ...) -- reference resize.py:95-161."""
    for key in _resizable_keys(sample, keys_to_ignore):
        kernel = resize_image_bilinear if key == 'rgb' \
            else resize_image_nearest
        sample[key] = kernel(sample[key], height, width)
    return sample


_PAD_MODES = {
    'zero': {'mode': 'constant', 'constant_values': 0},
    'reflect': {'mode': 'reflect'},
}


def pad(sample: SampleType, padding_top: int, padding_bottom: int,
        padding_left: int, padding_right: int, padding_mode: str = 'zero',
        keys_to_ignore: Optional[Iterable[str]] = None) -> SampleType:
    spatial = ((padding_top, padding_bottom), (padding_left, padding_right))
    np_kwargs = _PAD_MODES[padding_mode]
    for key in _resizable_keys(sample, keys_to_ignore):
        value = sample[key]
        assert value.ndim in (2, 3)    # channels last
        widths = spatial if value.ndim == 2 else (*spatial, (0, 0))
        sample[key] = np.pad(value, widths, **np_kwargs)
    return sample


class Resize(PreprocessingBase):
    """Resize every spatial entry to a fixed (height, width), optionally
    aspect-preserving with centered padding; records the valid-region
    slices in the provenance meta so inference postprocessing can crop
    away the padding before full-resolution upsampling."""

    def __init__(self, height: int, width: int,
                 keys_to_ignore: Optional[Iterable[str]] = None,
                 keep_aspect_ratio: bool = False,
                 padding_mode: str = 'zero') -> None:
        if padding_mode not in _PAD_MODES:
            raise ValueError(f"unknown padding_mode: '{padding_mode}'")
        self._target_hw = (height, width)
        self._keep_aspect_ratio = keep_aspect_ratio
        self._padding_mode = padding_mode
        self._keys_to_ignore = keys_to_ignore
        super().__init__(
            multiscale_processing=False,
            fixed_parameters=dict(keys_to_ignore=keys_to_ignore,
                                  keep_aspect_ratio=keep_aspect_ratio,
                                  padding_mode=padding_mode))

    def _fit(self, orig_h: int, orig_w: int):
        """Content size + centered (top, bottom, left, right) padding."""
        th, tw = self._target_hw
        if not self._keep_aspect_ratio:
            return (th, tw), (0, 0, 0, 0)
        scale = min(th / orig_h, tw / orig_w)
        fit_h, fit_w = int(round(scale * orig_h)), int(round(scale * orig_w))
        slack_h, slack_w = th - fit_h, tw - fit_w
        return (fit_h, fit_w), (slack_h // 2, slack_h - slack_h // 2,
                                slack_w // 2, slack_w - slack_w // 2)

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        orig_h, orig_w = _get_input_shape(sample)
        (fit_h, fit_w), (top, bottom, left, right) = self._fit(orig_h, orig_w)

        sample = resize(sample, height=fit_h, width=fit_w,
                        keys_to_ignore=self._keys_to_ignore)
        sample = pad(sample,
                     padding_top=top, padding_bottom=bottom,
                     padding_left=left, padding_right=right,
                     padding_mode=self._padding_mode,
                     keys_to_ignore=self._keys_to_ignore)

        dynamic = dict(old_height=orig_h, old_width=orig_w)
        dynamic['new_height'], dynamic['new_width'] = self._target_hw
        dynamic['valid_region_slice_y'] = slice(top, top + fit_h)
        dynamic['valid_region_slice_x'] = slice(left, left + fit_w)
        return sample, dynamic


class RandomResize(PreprocessingBase):
    """Augmentation: rescales the whole sample by a uniformly drawn
    factor in [min_scale, max_scale] (no padding, so the full output is
    the valid region)."""

    def __init__(self, min_scale: float, max_scale: float,
                 keys_to_ignore: Optional[Iterable[str]] = None) -> None:
        if not 0 <= min_scale <= max_scale:
            raise ValueError('Unexpected value for `min_scale`')
        self._scale_range = (min_scale, max_scale)
        self._keys_to_ignore = keys_to_ignore
        super().__init__(
            multiscale_processing=False,
            fixed_parameters=dict(min_scale=min_scale, max_scale=max_scale,
                                  keys_to_ignore=keys_to_ignore))

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        h, w = _get_input_shape(sample)

        lo, hi = self._scale_range
        scale = lo if lo == hi else np.random.uniform(lo, hi)
        height, width = int(round(scale * h)), int(round(scale * w))

        sample = resize(sample, height, width,
                        keys_to_ignore=self._keys_to_ignore)
        dynamic = dict(old_height=h, old_width=w,
                       new_height=height, new_width=width,
                       valid_region_slice_y=slice(0, height),
                       valid_region_slice_x=slice(0, width))
        return sample, dynamic
