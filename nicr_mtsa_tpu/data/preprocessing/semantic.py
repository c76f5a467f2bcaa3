"""Semantic label remapping.

Counterpart of reference ``data/preprocessing/semantic.py``: rewrites a
configured set of semantic class ids to a single replacement label (the
typical use is folding dataset-specific "ignore" classes into void), and
records how many pixels of each mapped class were touched so provenance
keeps the information the overwrite destroys.
"""
from typing import Any, Dict, Tuple

import numpy as np

from ...types import SampleType
from .base import PreprocessingBase
from .utils import _keys_available


class SemanticClassMapper(PreprocessingBase):
    """Map the given class ids to ``new_label`` in ``sample['semantic']``."""

    def __init__(
        self,
        classes_to_map: Tuple[int, ...],
        new_label: int = 0,
        multiscale_processing: bool = True,
        disable_stats: bool = False,
    ) -> None:
        self._source_classes = np.asarray(classes_to_map)
        self._target_label = new_label
        self._with_stats = not disable_stats
        provenance = dict(semantic_classes_to_map=self._source_classes,
                          new_label=new_label, disable_stats=disable_stats)
        super().__init__(fixed_parameters=provenance,
                         multiscale_processing=multiscale_processing)

    def _count_mapped(self, semantic: np.ndarray) -> Dict[int, int]:
        """Per-class pixel counts, only for classes actually present."""
        stats = {}
        for class_id in self._source_classes:
            n = int(np.count_nonzero(semantic == class_id))
            if n:
                stats[class_id] = n
        return stats

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        if not _keys_available(sample, ('semantic',)):
            return sample, {}

        semantic = sample['semantic']
        dynamic: Dict[str, Any] = {}
        if self._with_stats:
            dynamic['mapped_pixels'] = self._count_mapped(semantic)

        hit = np.isin(semantic, self._source_classes)
        semantic[hit] = self._target_label
        return sample, dynamic
