"""Nested downscaled GT copies for multiscale (deep) supervision.

Counterpart of reference ``multiscale_supervision.py``: for each
configured downscale ``k`` this stores a ``_down_<k>`` sub-sample holding
resized clones of the selected GT keys. Later preprocessors with
``multiscale_processing=True`` fan out over those sub-samples, so target
generators run once per supervision scale. Decoder side outputs at
1/k resolution train against these.
"""
from typing import Any, Dict, Tuple

from ...types import SampleType
from .base import MULTI_DOWNSCALE_KEY_FMT, PreprocessingBase
from .clone import clone_entries
from .resize import resize
from .utils import _get_input_shape, _keys_available


def get_downscale(sample: SampleType, downscale: int) -> SampleType:
    return sample.get(MULTI_DOWNSCALE_KEY_FMT.format(downscale), None)


class MultiscaleSupervisionGenerator(PreprocessingBase):
    """Create the ``_down_<k>`` sub-samples the fan-out machinery expects."""

    def __init__(
        self,
        downscales: Tuple[int, ...],
        keys: Tuple[str, ...],
    ) -> None:
        self._downscales = downscales
        self._keys = keys
        # multiscale_processing stays off: this preprocessor *creates*
        # the nested entries the fan-out would otherwise recurse into
        super().__init__(
            fixed_parameters={'downscales': downscales, 'keys': keys},
            multiscale_processing=False,
        )

    @property
    def downscales(self):
        return self._downscales

    def _make_downscaled(self, sample: SampleType, height: int,
                         width: int) -> SampleType:
        copies = clone_entries(sample, keys_to_clone=self._keys)
        return resize(copies, height=height, width=width)

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        missing = [k for k in self._keys if not _keys_available(sample, (k,))]
        if missing:
            raise KeyError(
                f'multiscale supervision requires {self._keys}; '
                f'sample is missing {missing}')

        full_h, full_w = _get_input_shape(sample)
        shapes = {
            k: (int(full_h / k), int(full_w / k)) for k in self._downscales
        }
        for k, (h, w) in shapes.items():
            sample[MULTI_DOWNSCALE_KEY_FMT.format(k)] = \
                self._make_downscaled(sample, h, w)
        return sample, {'shapes': shapes}
