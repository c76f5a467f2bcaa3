"""Dense-visual-embedding task helper (reference
task_helper/dense_visual_embedding.py:33-339).

The reference reconstructs dense targets from ragged per-sample
LUTs + index maps with a python batch loop and boolean gathers. The
TPU build pads the LUTs once per batch (host) to (B, L, D), gathers
target embeddings per pixel with `take_along_axis`, and masks void
(index 0) pixels in the summed loss -- fully static shapes.

Validation: mIoU of the text-based and visual-mean-based semantic
retrievals against the full-resolution GT semantic."""
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.preprocessing.resize import get_fullres_key
from ..losses import CosineEmbeddingLoss, L1Loss, MSELoss
from ..metrics import MeanIntersectionOverUnion, confusion_matrix
from .base import (
    TaskHelperBase, append_detached_losses_to_logs, append_profile_to_logs,
)


KNOWN_DENSE_VISUAL_EMBEDDING_LOSS_FUNCTIONS = ('cos_emb', 'mse', 'l1')


def pad_embedding_luts(luts: List[np.ndarray], embedding_dim: int):
    """Ragged per-sample LUTs -> (B, L_max+1, D); row 0 is the void
    placeholder so the dense index map can gather directly."""
    max_len = max((lut.shape[0] if lut.ndim == 2 else 0) for lut in luts)
    B = len(luts)
    padded = np.zeros((B, max_len + 1, embedding_dim), np.float32)
    for b, lut in enumerate(luts):
        if lut.ndim == 2 and lut.shape[0]:
            padded[b, 1:1 + lut.shape[0]] = lut
    return padded


class DenseVisualEmbeddingTaskHelper(TaskHelperBase):
    def __init__(
        self,
        n_classes: int,
        loss_name: str = 'cos_emb',
        disable_multiscale_supervision: bool = False,
        examples_cmap=None,
        store_examples: bool = False,
    ) -> None:
        self._loss_name = loss_name.lower()
        assert self._loss_name in KNOWN_DENSE_VISUAL_EMBEDDING_LOSS_FUNCTIONS
        self._disable_multiscale_supervision = disable_multiscale_supervision
        self._n_classes = n_classes
        self._examples: Dict[str, Any] = {}
        self._examples_cmap = examples_cmap
        self._store_examples = store_examples
        self.initialize()

    def initialize(self) -> None:
        if self._loss_name == 'mse':
            self._loss = MSELoss(reduction='none')
        elif self._loss_name == 'l1':
            self._loss = L1Loss(reduction='none')
        else:
            self._loss = CosineEmbeddingLoss(reduction='none')

        self._text_metric_iou = MeanIntersectionOverUnion(self._n_classes)
        self._text_metric_iou.reset()
        self._visual_mean_metric_iou = MeanIntersectionOverUnion(
            self._n_classes)
        self._visual_mean_metric_iou.reset()

    def _resize_indices_to(self, indices, h, w):
        """Match the index map to a (possibly downscaled) prediction
        via exact nearest gather."""
        if indices.shape[1:3] == (h, w):
            return indices
        from ..models.upsampling import resize_nearest
        return resize_nearest(indices[..., None], h, w)[..., 0]

    @staticmethod
    def _cos_emb_via_lut(p, lut, oh):
        """`1 - cos(p, lut[idx])` per pixel without the dense target.

        numerator: s = p @ lut^T is (B, P, L+1); selecting its idx
        column (elementwise with the one-hot, VPU reduce) equals
        p . lut[idx]. The target norm is a per-row LUT-norm selection
        -- pinned to HIGHEST precision because it routes VALUES
        through a matmul (CLAUDE.md selection-matrix lesson)."""
        x = p.astype(jnp.float32)
        lut32 = lut.astype(jnp.float32)
        s = jnp.einsum('bpd,bld->bpl', x, lut32,
                       preferred_element_type=jnp.float32)
        num = jnp.sum(oh * s, axis=-1)                      # (B, P)
        lut_norm = jnp.linalg.norm(lut32, axis=-1)          # (B, L+1)
        t_norm = jnp.einsum('bpl,bl->bp', oh, lut_norm,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        x_norm = jnp.linalg.norm(x, axis=-1)                # (B, P)
        cos = num / jnp.maximum(x_norm * t_norm, 1e-8)
        return 1.0 - cos

    def compute_losses(self, batch, predictions_post) -> Dict:
        no_ms = self._disable_multiscale_supervision
        preds, keys, downscales = self.collect_predictions_for_loss(
            predictions_post, 'dense_visual_embedding_output',
            None if no_ms else 'dense_visual_embedding_side_outputs')

        embedding_dim = preds[0].shape[-1]
        luts = batch['dense_visual_embedding_lut']
        if isinstance(luts, list):
            # ragged host-side LUTs: pad once (outside jit)
            lut = jnp.asarray(pad_embedding_luts(
                [np.asarray(l) for l in luts], embedding_dim))
        else:
            # already padded (possibly a traced array inside jit)
            lut = jnp.asarray(luts)                     # (B, L+1, D)

        indices_scales = self.collect_targets_for_loss(
            batch, 'dense_visual_embedding_indices', downscales)
        # multiscale may be missing for this key: fall back to resizing
        while len(indices_scales) < len(preds):
            indices_scales.append(indices_scales[0])

        loss_outputs = []
        for pred, idx in zip(preds, indices_scales):
            h, w = pred.shape[1:3]
            idx = self._resize_indices_to(jnp.asarray(idx), h, w)
            valid = idx != 0
            B = pred.shape[0]
            flat_idx = idx.reshape(B, -1)
            # one-hot MXU selection instead of a per-pixel LUT gather
            # (scalar-core serialization, PERF.md lesson 1); the f32
            # one-hot row has a single 1.0 so the selection is exact
            oh = jax.nn.one_hot(flat_idx, lut.shape[1], dtype=jnp.float32)
            p = pred.reshape(B, -1, embedding_dim)
            if self._loss_name == 'cos_emb':
                # cos(x, lut[idx]) through the (B, P, L+1) score
                # matrix: the dense (B, P, D) target NEVER exists (at
                # the eval shape B64 x 480x640 x D512 it would be
                # 40 GB -- measured HBM OOM)
                per_elem = self._cos_emb_via_lut(p, lut, oh)
            else:
                target = jnp.einsum(
                    'bpl,bld->bpd', oh, lut.astype(jnp.float32),
                    preferred_element_type=jnp.float32)  # (B, P, D)
                (per_elem, _), = self._loss([p], [target])
                if per_elem.ndim == 3:                   # l1/mse: (B,P,D)
                    per_elem = jnp.mean(per_elem, axis=-1)
            per_elem = jnp.where(valid.reshape(B, -1), per_elem, 0.0)
            n = jnp.sum(valid.astype(jnp.int32))
            loss_outputs.append((jnp.sum(per_elem), jnp.maximum(n, 1)))

        loss_dict = {
            f'dense_visual_embedding_loss_{key}': loss / n
            for key, (loss, n) in zip(keys, loss_outputs)
        }
        loss_dict[self.mark_as_total('dense_visual_embedding')] = \
            self.accumulate_losses(
                losses=[l for l, _ in loss_outputs],
                n_elements=[n for _, n in loss_outputs])
        return loss_dict

    @append_profile_to_logs('dense_visual_embedding_step_time')
    @append_detached_losses_to_logs()
    def training_step(self, batch, batch_idx, predictions_post):
        return self.compute_losses(batch, predictions_post), {}

    # --- functional metric-state API (fused eval step) ----------------------
    # Retrieval mIoU (text-based and visual-mean-based semantic, ref
    # task_helper/dense_visual_embedding.py:33-339) as confusion-
    # matrix states updated inside the fused eval jit.
    def empty_metric_states(self):
        return {'text_cm': self._text_metric_iou.empty_state(),
                'visual_mean_cm':
                    self._visual_mean_metric_iou.empty_state()}

    def _retrieval_cm(self, batch, predictions_post, key):
        if key not in predictions_post:
            return None
        target = jnp.asarray(self.get_fullres(batch, 'semantic'))
        preds = predictions_post[key]
        valid = target != 0
        t = jnp.where(valid, target.astype(jnp.int32) - 1, 0)
        p = jnp.where(valid, preds.astype(jnp.int32), 0)
        cm = confusion_matrix(p, t, self._n_classes)
        return cm.at[0, 0].add(-jnp.sum(~valid).astype(cm.dtype))

    def update_metric_states(self, state, batch, predictions_post):
        if state is None:
            state = self.empty_metric_states()
        new = dict(state)
        for state_key, pred_key in (
                ('text_cm', 'dense_visual_embedding_text_based'
                            '_semantic_idx'),
                ('visual_mean_cm', 'dense_visual_embedding'
                                   '_visual_mean_based_semantic_idx')):
            cm = self._retrieval_cm(batch, predictions_post,
                                    get_fullres_key(pred_key))
            if cm is not None:
                new[state_key] = state[state_key] + cm
        return new

    def load_metric_states(self, state):
        """Adopt fused-eval states so validation_epoch_end reports
        them."""
        self._text_metric_iou.state = state['text_cm']
        self._visual_mean_metric_iou.state = state['visual_mean_cm']

    def _update_retrieval_miou(self, metric, batch, predictions_post, key):
        if key not in predictions_post:
            return
        target = jnp.asarray(self.get_fullres(batch, 'semantic'))
        preds = predictions_post[key]
        valid = target != 0
        t = jnp.where(valid, target.astype(jnp.int32) - 1, 0)
        p = jnp.where(valid, preds.astype(jnp.int32), 0)
        cm = confusion_matrix(p, t, self._n_classes)
        cm = cm.at[0, 0].add(-jnp.sum(~valid).astype(cm.dtype))
        metric.state = metric.state + cm

    @append_profile_to_logs('dense_visual_embedding_step_time')
    @append_detached_losses_to_logs()
    def validation_step(self, batch, batch_idx, predictions_post):
        loss_dict = self.compute_losses(batch, predictions_post)

        self._update_retrieval_miou(
            self._text_metric_iou, batch, predictions_post,
            get_fullres_key('dense_visual_embedding_text_based_semantic_idx'))
        self._update_retrieval_miou(
            self._visual_mean_metric_iou, batch, predictions_post,
            get_fullres_key(
                'dense_visual_embedding_visual_mean_based_semantic_idx'))

        if self._store_examples and batch_idx == 0:
            from ..visualization import visualize_semantic_pil
            key = 'dense_visual_embedding_text_based_semantic_idx'
            if key in predictions_post:
                self._examples['dve_text_semantic_example_batch_0_0'] = \
                    visualize_semantic_pil(
                        np.asarray(predictions_post[key][0]),
                        colors=self._examples_cmap)

        return loss_dict, {}

    @append_profile_to_logs('dense_visual_embedding_epoch_end_time')
    def validation_epoch_end(self):
        logs, artifacts = {}, {}
        if int(np.asarray(self._text_metric_iou.state).sum()):
            logs['dense_visual_embedding_text_miou'] = \
                self._text_metric_iou.compute()
        if int(np.asarray(self._visual_mean_metric_iou.state).sum()):
            logs['dense_visual_embedding_visual_mean_miou'] = \
                self._visual_mean_metric_iou.compute()
        self._text_metric_iou.reset()
        self._visual_mean_metric_iou.reset()
        return artifacts, self._examples, logs
