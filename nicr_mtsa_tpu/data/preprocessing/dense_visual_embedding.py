"""Dense visual embedding (DVE) target generation (reference
data/preprocessing/dense_visual_embedding.py:14-91).

Subtracts `diff_factor * image_embedding` from each per-segment
panoptic embedding, L2-normalizes, and stores a compact LUT plus a
dense index image (0 = void/background)."""
from typing import Any, Dict, Tuple

import numpy as np

from ...types import SampleType
from .base import PreprocessingBase
from .utils import _keys_available


class DenseVisualEmbeddingTargetGenerator(PreprocessingBase):
    def __init__(
        self,
        diff_factor: float = 0.65,
        multiscale_processing: bool = True,
    ) -> None:
        super().__init__(multiscale_processing=multiscale_processing)
        self.diff_factor = diff_factor

    @staticmethod
    def _process_scale(
        panoptic_embedding_targets: Dict[int, np.ndarray],
        panoptic_target: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray]:
        embeddings = np.array(
            list(panoptic_embedding_targets.values()), dtype=np.float32
        )

        keys = np.array(
            [int(key) for key in panoptic_embedding_targets.keys()],
            dtype=np.int64,
        )
        # map sparse panoptic ids to dense LUT indices (+1 reserves 0 for
        # background/void) -- vectorized via sorted search instead of the
        # reference's per-key mask loop
        indices = np.zeros(panoptic_target.shape, dtype=np.int32)
        if len(keys):
            order = np.argsort(keys)
            sorted_keys = keys[order]
            flat = panoptic_target.astype(np.int64).ravel()
            pos = np.searchsorted(sorted_keys, flat)
            pos_clipped = np.clip(pos, 0, len(sorted_keys) - 1)
            match = sorted_keys[pos_clipped] == flat
            lut_idx = np.where(match, order[pos_clipped] + 1, 0)
            indices = lut_idx.astype(np.int32).reshape(panoptic_target.shape)

        return embeddings, indices

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        if not _keys_available(sample, ('image_embedding',)):
            return sample, {}
        if not _keys_available(sample, ('panoptic_embedding',)):
            return sample, {}

        image_embedding = sample['image_embedding']
        panoptic_embeddings_target = sample['panoptic_embedding']

        # reduce global scene context to focus on local features
        panoptic_embeddings_target = {
            k: v - self.diff_factor * image_embedding
            for k, v in panoptic_embeddings_target.items()
        }
        panoptic_embeddings_target = {
            k: v / np.linalg.norm(v, axis=-1, keepdims=True)
            for k, v in panoptic_embeddings_target.items()
        }

        embedding_lut, embedding_indices = self._process_scale(
            panoptic_embeddings_target, sample['panoptic']
        )

        sample['dense_visual_embedding_lut'] = embedding_lut
        sample['dense_visual_embedding_indices'] = embedding_indices
        return sample, {}
