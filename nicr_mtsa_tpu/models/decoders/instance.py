"""Instance decoders (dense + MLP) with center/offset(/orientation)
heads, reference model/decoder/instance.py:125-250."""
from math import log2

from .base import DenseDecoderBase, MLPDecoderBase
from .heads import InstanceHead


class InstanceDecoder(DenseDecoderBase):
    n_channels_per_task: int = 32
    with_orientation: bool = False
    sigmoid_for_center: bool = True
    tanh_for_offset: bool = True

    def apply_task_head(self, x, train: bool):
        return InstanceHead(
            n_channels_per_task=self.n_channels_per_task,
            with_orientation=self.with_orientation,
            sigmoid_for_center=self.sigmoid_for_center,
            tanh_for_offset=self.tanh_for_offset,
            norm=self.norm, act=self.act,
            upsampling=self.prediction_upsampling,
            n_upsamplings=int(log2(self.downsamplings[-1])),
            dtype=self.dtype, name='task_head',
        )(x, train)

    def apply_side_head(self, i, x, train: bool):
        return InstanceHead(
            n_channels_per_task=self.n_channels_per_task,
            with_orientation=self.with_orientation,
            sigmoid_for_center=self.sigmoid_for_center,
            tanh_for_offset=self.tanh_for_offset,
            norm=self.norm, act=self.act, n_upsamplings=0,
            dtype=self.dtype, name=f'side_head{i}',
        )(x, train)


class InstanceMLPDecoder(MLPDecoderBase):
    n_channels_per_task: int = 32
    with_orientation: bool = False
    sigmoid_for_center: bool = True
    tanh_for_offset: bool = True

    def apply_task_head(self, x, train: bool):
        return InstanceHead(
            n_channels_per_task=self.n_channels_per_task,
            with_orientation=self.with_orientation,
            sigmoid_for_center=self.sigmoid_for_center,
            tanh_for_offset=self.tanh_for_offset,
            norm=self.norm, act=self.act,
            upsampling=self.prediction_upsampling,
            n_upsamplings=self.downsampling_in_heads // 2,
            dtype=self.dtype, name='task_head',
        )(x, train)
