"""Joint spatial-transform wrapper.

Equivalent of the reference's TorchTransformWrapper
(data/preprocessing/torch_transform_wrapper.py:20-142): all spatial
entries of the sample are concatenated channel-wise, ONE transform is
applied to the stack (so random spatial transforms stay consistent
across modalities and labels), and the result is split back. Final
five-crop / ten-crop transforms multiply the sample into a leading
crop axis.

The transform here is any callable on a numpy (H, W, C) stack --
e.g. a jittable jax function or a numpy augmentation. Interpolating
transforms are rejected by construction: the wrapper only permits
geometry-preserving or nearest-gather operations on the stacked
labels (the reference likewise rejects non-nearest Resize,
torch_transform_wrapper.py:52-60)."""
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from ...types import SampleType
from .base import PreprocessingBase
from .utils import _get_relevant_spatial_keys


def five_crop(stack: np.ndarray, crop_h: int, crop_w: int) -> np.ndarray:
    """(H, W, C) -> (5, crop_h, crop_w, C): four corners + center."""
    h, w = stack.shape[:2]
    assert crop_h <= h and crop_w <= w
    tl = stack[:crop_h, :crop_w]
    tr = stack[:crop_h, w - crop_w:]
    bl = stack[h - crop_h:, :crop_w]
    br = stack[h - crop_h:, w - crop_w:]
    cy, cx = (h - crop_h) // 2, (w - crop_w) // 2
    center = stack[cy:cy + crop_h, cx:cx + crop_w]
    return np.stack([tl, tr, bl, br, center])


def ten_crop(stack: np.ndarray, crop_h: int, crop_w: int) -> np.ndarray:
    """five_crop of the image and its horizontal flip -> (10, ...)."""
    return np.concatenate([
        five_crop(stack, crop_h, crop_w),
        five_crop(stack[:, ::-1], crop_h, crop_w),
    ])


class TransformWrapper(PreprocessingBase):
    def __init__(
        self,
        transform: Callable[[np.ndarray], np.ndarray],
        final_crop: Optional[Tuple[str, int, int]] = None,
        keys_to_ignore: Optional[Tuple[str, ...]] = None,
    ) -> None:
        """`transform` maps a float32 (H, W, C) stack to (H', W', C).
        `final_crop` = ('five'|'ten', crop_h, crop_w) appends a
        multi-crop that adds a leading crop axis to every entry."""
        self._transform = transform
        self._final_crop = final_crop
        self._keys_to_ignore = keys_to_ignore
        super().__init__(
            fixed_parameters={'final_crop': final_crop},
            multiscale_processing=False,
        )

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        keys = _get_relevant_spatial_keys(
            sample, keys_to_ignore=self._keys_to_ignore)

        # concat channel-wise, remembering per-key channel extents/dtypes
        parts: List[np.ndarray] = []
        layout = []
        for key in keys:
            value = sample[key]
            arr = value[..., None] if value.ndim == 2 else value
            layout.append((key, arr.shape[-1], value.dtype, value.ndim))
            parts.append(arr.astype(np.float32))
        stack = np.concatenate(parts, axis=-1)

        stack = self._transform(stack)
        stack = np.asarray(stack)

        if self._final_crop is not None:
            kind, ch, cw = self._final_crop
            stack = (five_crop(stack, ch, cw) if kind == 'five'
                     else ten_crop(stack, ch, cw))

        # split back, restoring dtypes exactly (labels must round-trip:
        # the permitted transforms never interpolate, so the float
        # detour is lossless for integers < 2^24)
        offset = 0
        for key, n_ch, dtype, ndim in layout:
            part = stack[..., offset:offset + n_ch]
            offset += n_ch
            if ndim == 2:
                part = part[..., 0]
            if np.issubdtype(dtype, np.integer) or dtype == bool:
                part = np.round(part).astype(dtype)
            else:
                part = part.astype(dtype)
            sample[key] = part

        return sample, {}
