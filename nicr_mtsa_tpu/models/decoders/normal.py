"""Surface-normal decoders (dense + MLP): 3-channel head with
unit-length output normalization, reference
model/decoder/normal.py:26-134."""
from math import log2

from .base import DenseDecoderBase, MLPDecoderBase
from .heads import TaskHead


class NormalDecoder(DenseDecoderBase):
    def apply_task_head(self, x, train: bool):
        return TaskHead(
            n_channels_out=3,
            upsampling=self.prediction_upsampling,
            n_upsamplings=int(log2(self.downsamplings[-1])),
            post='unit-length',
            dtype=self.dtype, name='task_head',
        )(x, train)

    def apply_side_head(self, i, x, train: bool):
        return TaskHead(n_channels_out=3, n_upsamplings=0,
                        post='unit-length',
                        dtype=self.dtype, name=f'side_head{i}')(x, train)


class NormalMLPDecoder(MLPDecoderBase):
    def apply_task_head(self, x, train: bool):
        return TaskHead(
            n_channels_out=3,
            upsampling=self.prediction_upsampling,
            n_upsamplings=self.downsampling_in_heads // 2,
            post='unit-length',
            dtype=self.dtype, name='task_head',
        )(x, train)
