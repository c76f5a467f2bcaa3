"""Dense visual embedding (DVE) targets as LUT + index image.

Counterpart of reference ``data/preprocessing/dense_visual_embedding.py``
(the DVEFormer target path). Each panoptic segment carries one
embedding vector; storing those densely per pixel would be huge, so the
sample instead gets a compact ``(n_segments, dim)`` LUT plus an int32
index image whose entries point one-past into the LUT (0 means
void/background — no segment embedding there). Before packing, every
segment embedding is re-centered by ``diff_factor`` times the global
image embedding (suppresses scene-level context, per the paper) and
L2-normalized.
"""
from typing import Any, Dict, Tuple

import numpy as np

from ...types import SampleType
from .base import PreprocessingBase
from .utils import _keys_available


def _localize(embedding: np.ndarray, image_embedding: np.ndarray,
              diff_factor: float) -> np.ndarray:
    shifted = embedding - diff_factor * image_embedding
    return shifted / np.linalg.norm(shifted, axis=-1, keepdims=True)


def _index_image(panoptic: np.ndarray, segment_ids: np.ndarray) -> np.ndarray:
    """Dense int32 image of 1-based LUT positions (0 where no segment).

    Vectorized sparse-id -> dense-slot mapping: one sorted search over
    the pixel map instead of the reference's per-key mask loop.
    """
    if not len(segment_ids):
        return np.zeros(panoptic.shape, dtype=np.int32)
    order = np.argsort(segment_ids)
    table = segment_ids[order]
    pixels = panoptic.astype(np.int64).ravel()
    slot = np.clip(np.searchsorted(table, pixels), 0, len(table) - 1)
    hit = table[slot] == pixels
    dense = np.where(hit, order[slot] + 1, 0).astype(np.int32)
    return dense.reshape(panoptic.shape)


class DenseVisualEmbeddingTargetGenerator(PreprocessingBase):
    """Pack per-segment embeddings into (LUT, index-image) targets."""

    def __init__(
        self,
        diff_factor: float = 0.65,
        multiscale_processing: bool = True,
    ) -> None:
        super().__init__(multiscale_processing=multiscale_processing)
        self.diff_factor = diff_factor

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        # both keys only exist on annotated training samples
        for needed in ('image_embedding', 'panoptic_embedding'):
            if not _keys_available(sample, (needed,)):
                return sample, {}

        per_segment = sample['panoptic_embedding']
        localized = {
            seg_id: _localize(vec, sample['image_embedding'],
                              self.diff_factor)
            for seg_id, vec in per_segment.items()
        }

        lut = np.array(list(localized.values()), dtype=np.float32)
        ids = np.fromiter((int(i) for i in localized),
                          dtype=np.int64, count=len(localized))

        sample['dense_visual_embedding_lut'] = lut
        sample['dense_visual_embedding_indices'] = _index_image(
            sample['panoptic'], ids)
        return sample, {}
