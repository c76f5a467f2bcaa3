"""Surface-normal postprocessing (reference
model/postprocessing/normal.py): full-resolution crop + nearest
resize."""
from ..data.preprocessing.resize import get_fullres_key
from .base import DensePostprocessingBase


class NormalPostprocessing(DensePostprocessingBase):
    def __init__(self, **kwargs) -> None:
        pass

    def _postprocess_training(self, data, batch):
        output, side_outputs = data
        return {'normal_output': output,
                'normal_side_outputs': side_outputs}

    def _postprocess_inference(self, data, batch):
        output, side_outputs = data
        r_dict = {'normal_output': output,
                  'normal_side_outputs': side_outputs}

        crop_slices, resize_shape = self._fullres_args(batch, 'normal')
        r_dict[get_fullres_key('normal_output')] = \
            self._crop_to_valid_region_and_resize_prediction(
                output, crop_slices, resize_shape, mode='nearest')
        return r_dict
