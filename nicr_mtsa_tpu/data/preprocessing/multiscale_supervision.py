"""Nested downscaled GT copies for multiscale (deep) supervision.

Counterpart of reference ``multiscale_supervision.py``: for each
configured downscale ``k`` this stores a ``_down_<k>`` sub-sample holding
resized clones of the selected GT keys. Later preprocessors with
``multiscale_processing=True`` fan out over those sub-samples, so target
generators run once per supervision scale. Decoder side outputs at
1/k resolution train against these.
"""
from .base import MULTI_DOWNSCALE_KEY_FMT, PreprocessingBase
from .clone import clone_entries
from .resize import resize
from .utils import _get_input_shape, _keys_available


def get_downscale(sample, downscale):
    return sample.get(MULTI_DOWNSCALE_KEY_FMT.format(downscale), None)


class MultiscaleSupervisionGenerator(PreprocessingBase):
    """Create the ``_down_<k>`` sub-samples the fan-out machinery expects."""

    def __init__(self, downscales, keys):
        self._downscales = tuple(downscales)
        self._keys = tuple(keys)
        # multiscale_processing stays off: this preprocessor *creates*
        # the nested entries the fan-out would otherwise recurse into
        super().__init__(
            fixed_parameters={'downscales': self._downscales,
                              'keys': self._keys},
            multiscale_processing=False)

    @property
    def downscales(self):
        return self._downscales

    def _preprocess(self, sample, **kwargs):
        missing = [k for k in self._keys if not _keys_available(sample, (k,))]
        if missing:
            raise KeyError(
                f'multiscale supervision requires {self._keys}; '
                f'sample is missing {missing}')

        full = _get_input_shape(sample)
        provenance = {}
        for factor in self._downscales:
            target = tuple(int(edge / factor) for edge in full)
            sub = resize(clone_entries(sample, keys_to_clone=self._keys),
                         height=target[0], width=target[1])
            sample[MULTI_DOWNSCALE_KEY_FMT.format(factor)] = sub
            provenance[factor] = target
        return sample, {'shapes': provenance}
