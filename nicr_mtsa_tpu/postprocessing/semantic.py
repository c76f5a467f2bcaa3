"""Semantic postprocessing (reference
model/postprocessing/semantic.py:17-82): softmax scores + argmax, plus
full-resolution variants computed from bilinearly-resized logits.

When the model defers its final prediction upsampling
(`defer_semantic_prediction_upsampling`), score/idx come from the
fused upsample+reduce kernel (ops/pallas/semantic_finisher.py) and the
full-resolution logits tensor is only materialized for consumers that
actually read it (XLA DCEs it in the serving pipeline)."""
import jax
import jax.numpy as jnp

from ..data.preprocessing.resize import get_fullres_key
from ..models.upsampling import (
    DEFERRED_TYPES, DeferredBilinear2, DeferredUpsampling2,
    apply_deferred_upsampling, apply_deferred_upsampling_exact,
    resize_bilinear, resized_channel_reduce,
)
from ..ops.pallas.resize_reduce import (
    crop_resize_argmax_score, resize_reduce_supported,
)
from ..ops.pallas.semantic_finisher import finish_deferred_semantic
from ..ops.pallas.semantic_finisher4x import (
    finish_deferred_bilinear2, finish_deferred_semantic2,
)
from ..ops.pallas.semantic_reduce import semantic_score_idx
from .base import DensePostprocessingBase


def _fullres_score_idx(output, crop_slices, resize_shape, score_idx):
    """Fullres (score, idx) from working-res logits: the fused Pallas
    crop+resize+reduce kernel when the backend/shapes allow (argmax
    bit-identical, ~150 ms/step and four ~800 MB phase temporaries
    cheaper at the B128 eval shape -- PERF.md), else the blocked
    XLA phase decomposition."""
    if resize_reduce_supported(output.shape, crop_slices,
                               *resize_shape):
        idx_fr, score_fr = crop_resize_argmax_score(
            output, crop_slices, *resize_shape)
        return score_fr, idx_fr
    cropped = output[:, crop_slices[0], crop_slices[1], :]
    return resized_channel_reduce(cropped, *resize_shape, score_idx)


class SemanticPostprocessing(DensePostprocessingBase):
    def __init__(self, **kwargs) -> None:
        pass

    def _postprocess_training(self, data, batch):
        output, side_outputs = data
        if isinstance(output, DEFERRED_TYPES):
            output = apply_deferred_upsampling(output)
        return {'semantic_output': output,
                'semantic_side_outputs': side_outputs}

    def _postprocess_inference(self, data, batch):
        output, side_outputs = data    # (B, H, W, C)

        deferred = None
        if isinstance(output, DEFERRED_TYPES):
            deferred = output
            # lazily-applied twin with the finisher kernels' EXACT
            # rounding semantics (DCE'd unless a consumer reads the
            # dense logits/softmax keys): guarantees
            # argmax(semantic_softmax_scores) ==
            # semantic_segmentation_idx within one output dict even on
            # bf16 tie pixels, where the XLA conv twin's fused bias
            # add keeps excess precision and could flip the argmax
            output = apply_deferred_upsampling_exact(deferred)

        r_dict = {'semantic_output': output,
                  'semantic_side_outputs': side_outputs}

        if deferred is not None:
            if isinstance(deferred, DeferredBilinear2):
                idx, score = finish_deferred_bilinear2(deferred)
            elif isinstance(deferred, DeferredUpsampling2):
                idx, score = finish_deferred_semantic2(deferred)
            else:
                idx, score = finish_deferred_semantic(deferred)
            r_dict.update({
                'semantic_softmax_scores':
                    jax.nn.softmax(output, axis=-1),
                'semantic_segmentation_score': score,
                'semantic_segmentation_idx': idx,
            })
            crop_slices, resize_shape = self._fullres_args(
                batch, 'semantic')
            (sh, sw), (h, w) = output.shape[1:3], resize_shape
            identity = (
                crop_slices[0].indices(sh) == (0, sh, 1)
                and crop_slices[1].indices(sw) == (0, sw, 1)
                and (h, w) == (sh, sw))
            if identity:
                score_fr, idx_fr = score, idx
                output_fullres = output
            else:
                cropped = output[:, crop_slices[0], crop_slices[1], :]
                # logits/softmax fullres keys: DCE'd unless consumed
                output_fullres = resize_bilinear(
                    cropped.astype(jnp.float32), *resize_shape)
                # score/idx WITHOUT materializing the fullres logits
                # (bit-identical to reducing output_fullres)
                score_fr, idx_fr = _fullres_score_idx(
                    output, crop_slices, resize_shape,
                    semantic_score_idx)
            r_dict.update({
                get_fullres_key('semantic_output'): output_fullres,
                get_fullres_key('semantic_softmax_scores'):
                    jax.nn.softmax(output_fullres, axis=-1),
                get_fullres_key('semantic_segmentation_score'): score_fr,
                get_fullres_key('semantic_segmentation_idx'): idx_fr,
            })
            return r_dict

        # score/idx derive from the LOGITS: argmax is softmax-invariant
        # and max-softmax = exp(max_logit - logsumexp), so the dense
        # (B, H, W, C) softmax array is only materialized when a
        # downstream consumer actually reads 'semantic_softmax_scores'
        # (XLA dead-code-eliminates it otherwise -- it cost ~11 ms per
        # batch-32 step at 480x640x40)
        score_idx = semantic_score_idx

        score, idx = score_idx(output)
        r_dict.update({
            'semantic_softmax_scores': jax.nn.softmax(output, axis=-1),
            'semantic_segmentation_score': score,
            'semantic_segmentation_idx': idx,
        })

        crop_slices, resize_shape = self._fullres_args(batch, 'semantic')
        cropped = output[:, crop_slices[0], crop_slices[1], :]
        if tuple(resize_shape) == cropped.shape[1:3]:
            # nothing to resize: keep the cropped tensor's dtype (the
            # reference's dense_base.py 'nothing to do' branch returns
            # the input unchanged; an unconditional f32 upcast doubled
            # HBM for bf16 consumers)
            output_fullres = cropped
            score_fr, idx_fr = score_idx(cropped.astype(jnp.float32))
        else:
            # dense fullres logits/softmax keys: DCE'd unless consumed
            output_fullres = resize_bilinear(
                cropped.astype(jnp.float32), *resize_shape)
            # score/idx WITHOUT materializing the (B, H_full, W_full,
            # C) logits tensor (it was 6.25 GB at eval B128 and the
            # eval OOM driver -- PERF.md); bit-identical to reducing
            # output_fullres
            score_fr, idx_fr = _fullres_score_idx(
                output, crop_slices, resize_shape, score_idx)
        r_dict.update({
            get_fullres_key('semantic_output'): output_fullres,
            get_fullres_key('semantic_softmax_scores'):
                jax.nn.softmax(output_fullres, axis=-1),
            get_fullres_key('semantic_segmentation_score'): score_fr,
            get_fullres_key('semantic_segmentation_idx'): idx_fr,
        })
        return r_dict
