"""Postprocessing base: train/inference dispatch + valid-region crop
and full-resolution resize.

Mirrors reference model/postprocessing/base.py:13-40 and
dense_base.py:14-58, with two TPU-first changes:

- postprocessors are standalone objects invoked by the task pipeline
  (not embedded in decoder modules); their inference cores are
  jittable (static crop slices come from host-side provenance meta),
- ragged per-instance python dicts become padded arrays + masks.

Arrays are channels-last: dense predictions are (B, H, W, C) or
(B, H, W)."""
from typing import Tuple

import jax.numpy as jnp

from ..data.preprocessing.resize import (
    get_valid_region_slices_and_fullres_shape,
)
from ..models.upsampling import resize_bilinear, resize_nearest


def crop_and_resize_to_fullres(
    prediction: jnp.ndarray,
    valid_region_slices: Tuple[slice, slice],
    shape: Tuple[int, int],
    mode: str = 'nearest',
) -> jnp.ndarray:
    """Crop away aspect-ratio padding (static slices from the Resize
    provenance meta) and resize to the original resolution. Integer
    dtypes use the exact nearest gather; floats may use bilinear."""
    slice_h, slice_w = valid_region_slices

    channels_last = prediction.ndim == 4
    if not channels_last:
        prediction = prediction[..., None]

    prediction = prediction[:, slice_h, slice_w, :]

    h, w = shape
    if (h, w) != tuple(prediction.shape[1:3]):
        if mode == 'nearest':
            prediction = resize_nearest(prediction, h, w)
        else:
            dtype = prediction.dtype
            out = resize_bilinear(prediction.astype(jnp.float32), h, w)
            prediction = (out.astype(dtype)
                          if jnp.issubdtype(dtype, jnp.integer)
                          else out)

    if not channels_last:
        prediction = prediction[..., 0]
    return prediction


class PostprocessingBase:
    def postprocess(self, data, batch, is_training: bool):
        if is_training:
            return self._postprocess_training(data, batch)
        return self._postprocess_inference(data, batch)

    def _postprocess_training(self, data, batch):
        raise NotImplementedError

    def _postprocess_inference(self, data, batch):
        raise NotImplementedError


class DensePostprocessingBase(PostprocessingBase):
    @staticmethod
    def _fullres_args(batch, key):
        return get_valid_region_slices_and_fullres_shape(batch, key)

    @staticmethod
    def _crop_to_valid_region_and_resize_prediction(
        prediction, valid_region_slices, shape, mode='nearest'
    ):
        return crop_and_resize_to_fullres(
            prediction, valid_region_slices, shape, mode)
