"""Semantic class remapping (reference data/preprocessing/semantic.py)."""
from typing import Any, Dict, Tuple

import numpy as np

from ...types import SampleType
from .base import PreprocessingBase
from .utils import _keys_available


class SemanticClassMapper(PreprocessingBase):
    def __init__(
        self,
        classes_to_map: Tuple[int, ...],
        new_label: int = 0,
        multiscale_processing: bool = True,
        disable_stats: bool = False,
    ) -> None:
        self._semantic_classes_to_map = np.array(classes_to_map)
        self._new_label = new_label
        self._disable_stats = disable_stats
        super().__init__(
            fixed_parameters={
                'semantic_classes_to_map': self._semantic_classes_to_map,
                'new_label': self._new_label,
                'disable_stats': self._disable_stats,
            },
            multiscale_processing=multiscale_processing,
        )

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        if not _keys_available(sample, ('semantic',)):
            return sample, {}

        mask = np.isin(sample['semantic'], self._semantic_classes_to_map)

        if not self._disable_stats:
            classes, cnts = np.unique(sample['semantic'][mask],
                                      return_counts=True)
            dynamic_parameters = {'mapped_pixels': dict(zip(classes, cnts))}
        else:
            dynamic_parameters = {}

        sample['semantic'][mask] = self._new_label
        return sample, dynamic_parameters
