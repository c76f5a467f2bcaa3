"""Multiscale supervision: clone GT keys at 1/downscale resolution
into nested `_down_<k>` sub-samples (reference
multiscale_supervision.py:16-67)."""
from typing import Any, Dict, Tuple

from ...types import SampleType
from .base import MULTI_DOWNSCALE_KEY_FMT
from .base import PreprocessingBase
from .clone import clone_entries
from .resize import resize
from .utils import _get_input_shape
from .utils import _keys_available


def get_downscale(sample: SampleType, downscale: int) -> SampleType:
    return sample.get(MULTI_DOWNSCALE_KEY_FMT.format(downscale), None)


class MultiscaleSupervisionGenerator(PreprocessingBase):
    def __init__(
        self,
        downscales: Tuple[int, ...],
        keys: Tuple[str, ...],
    ) -> None:
        self._downscales = downscales
        self._keys = keys
        super().__init__(
            fixed_parameters={
                'downscales': self._downscales,
                'keys': self._keys,
            },
            multiscale_processing=False,  # it *creates* the multiscale entries
        )

    @property
    def downscales(self):
        return self._downscales

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        if not _keys_available(sample, self._keys):
            raise KeyError(f"At least one key of '{self._keys}' is missing in"
                           "`sample`.")

        h, w = _get_input_shape(sample)

        shape_dict = {}
        for downscale in self._downscales:
            cloned_sample = clone_entries(sample, keys_to_clone=self._keys)
            h_down, w_down = int(h / downscale), int(w / downscale)
            cloned_sample = resize(cloned_sample, height=h_down, width=w_down)
            shape_dict[downscale] = (h_down, w_down)
            sample[MULTI_DOWNSCALE_KEY_FMT.format(downscale)] = cloned_sample

        return sample, {'shapes': shape_dict}
