"""Semantic decoders (dense + MLP), reference
model/decoder/semantic.py:26-140."""
from math import log2

import flax.linen as nn

from .base import DenseDecoderBase, MLPDecoderBase
from .heads import TaskHead


class SemanticDecoder(DenseDecoderBase):
    n_classes: int = 40
    # serving-path fusion hook: emit the final prediction upsampling
    # as DeferredUpsampling (see ops/pallas/semantic_finisher.py), or
    # 'all' to emit BOTH as DeferredUpsampling2 (semantic_finisher4x)
    defer_prediction_upsampling: object = False    # False | True | 'all'

    def apply_task_head(self, x, train: bool):
        return TaskHead(
            n_channels_out=self.n_classes,
            upsampling=self.prediction_upsampling,
            n_upsamplings=int(log2(self.downsamplings[-1])),
            defer_last_upsampling=self.defer_prediction_upsampling,
            dtype=self.dtype, name='task_head',
        )(x, train)

    def apply_side_head(self, i, x, train: bool):
        return TaskHead(n_channels_out=self.n_classes, n_upsamplings=0,
                        dtype=self.dtype, name=f'side_head{i}')(x, train)


class SemanticMLPDecoder(MLPDecoderBase):
    n_classes: int = 40
    n_upsamplings: int = None
    defer_prediction_upsampling: object = False    # False | True | 'all'

    def apply_task_head(self, x, train: bool):
        n_up = self.n_upsamplings
        if n_up is None:
            n_up = self.downsampling_in_heads // 2
        return TaskHead(
            n_channels_out=self.n_classes,
            upsampling=self.prediction_upsampling,
            n_upsamplings=n_up,
            defer_last_upsampling=self.defer_prediction_upsampling,
            dtype=self.dtype, name='task_head',
        )(x, train)
