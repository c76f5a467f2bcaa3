"""Dense-visual-embedding postprocessing (reference
model/postprocessing/dense_visual_embedding.py:19-167): L2-normalize
the embedding map; cosine-similarity semantic retrieval against text
and/or visual-mean class embeddings (a (HW, D) x (D, C) MXU matmul
instead of the reference's 1x1 conv); softmax/argmax + fullres."""
from typing import Optional

import jax
import jax.numpy as jnp

from ..data.preprocessing.resize import get_fullres_key
from ..ops.pallas.semantic_reduce import semantic_score_idx
from .base import DensePostprocessingBase
from .semantic import _fullres_score_idx


class DenseVisualEmbeddingPostprocessing(DensePostprocessingBase):
    def __init__(
        self,
        with_text_embeddings_per_class: bool = False,
        text_embeddings_per_class=None,
        with_mean_visual_embedding_per_class: bool = False,
        mean_visual_embedding_per_class=None,
        **kwargs,
    ) -> None:
        self.with_semantic_text_embeddings = with_text_embeddings_per_class
        self._semantic_text_embeddings = None
        if with_text_embeddings_per_class:
            assert text_embeddings_per_class is not None
            self._semantic_text_embeddings = jnp.asarray(
                text_embeddings_per_class)        # (C, D)

        self.with_mean_visual_embedding_per_class = \
            with_mean_visual_embedding_per_class
        self._mean_visual_embedding_per_class = None
        if with_mean_visual_embedding_per_class:
            assert mean_visual_embedding_per_class is not None
            self._mean_visual_embedding_per_class = jnp.asarray(
                mean_visual_embedding_per_class)  # (C, D)

    def _postprocess_training(self, data, batch):
        output, side_outputs = data
        return {'dense_visual_embedding_output': output,
                'dense_visual_embedding_side_outputs': side_outputs}

    def _add_semantic_results(self, output, weight, inv_norm,
                              crop_slices, resize_shape, r_dict, prefix):
        # cosine similarity = dot product of normalized embeddings.
        # The per-pixel normalization is applied to the (B, H, W, C)
        # LOGITS, not the (B, H, W, D) map: (x / ||x||) . e_c ==
        # (x . e_c) / ||x||, and the normalized f32 embedding map
        # would be 20 GB at eval B32 (measured compile-time OOM).
        logits = jnp.einsum('bhwd,cd->bhwc', output, weight,
                            preferred_element_type=jnp.float32)
        logits = logits * inv_norm[..., None]
        pred = jax.nn.softmax(logits, axis=-1)
        r_dict.update({
            f'{prefix}_output': logits,
            f'{prefix}_softmax_scores': pred,
            f'{prefix}_score': jnp.max(pred, axis=-1),
            f'{prefix}_idx': jnp.argmax(pred, axis=-1).astype(jnp.int32),
        })

        logits_fullres = self._crop_to_valid_region_and_resize_prediction(
            logits, crop_slices, resize_shape, mode='bilinear')
        pred_fullres = jax.nn.softmax(logits_fullres, axis=-1)
        # score/idx via the fused crop+resize+reduce kernel when
        # supported (argmax bit-identical to reducing logits_fullres;
        # in metric-only eval the dense fullres logits/softmax keys
        # above are DCE'd and this is the only fullres work left)
        score_fr, idx_fr = _fullres_score_idx(
            logits, crop_slices, resize_shape, semantic_score_idx)
        r_dict.update({
            get_fullres_key(f'{prefix}_output'): logits_fullres,
            get_fullres_key(f'{prefix}_softmax_scores'): pred_fullres,
            get_fullres_key(f'{prefix}_score'): score_fr,
            get_fullres_key(f'{prefix}_idx'): idx_fr,
        })
        return r_dict

    def _postprocess_inference(self, data, batch):
        output, side_outputs = data
        r_dict = {'dense_visual_embedding_output': output,
                  'dense_visual_embedding_side_outputs': side_outputs}

        norm = jnp.linalg.norm(output.astype(jnp.float32), axis=-1)
        inv_norm = 1.0 / jnp.maximum(norm, 1e-12)       # (B, H, W) f32

        crop_slices, resize_shape = self._fullres_args(batch, 'semantic')

        if self.with_semantic_text_embeddings:
            r_dict = self._add_semantic_results(
                output, self._semantic_text_embeddings, inv_norm,
                crop_slices, resize_shape, r_dict,
                'dense_visual_embedding_text_based_semantic')
        if self.with_mean_visual_embedding_per_class:
            r_dict = self._add_semantic_results(
                output, self._mean_visual_embedding_per_class, inv_norm,
                crop_slices, resize_shape, r_dict,
                'dense_visual_embedding_visual_mean_based_semantic')
        return r_dict
