"""Dense-visual-embedding decoders (dense + MLP): emit an
`embedding_dim`-channel map, reference
model/decoder/embedding.py:25-149."""
from math import log2

from .base import DenseDecoderBase, MLPDecoderBase
from .heads import TaskHead


class EmbeddingDecoder(DenseDecoderBase):
    embedding_dim: int = 512

    def apply_task_head(self, x, train: bool):
        return TaskHead(
            n_channels_out=self.embedding_dim,
            upsampling=self.prediction_upsampling,
            n_upsamplings=int(log2(self.downsamplings[-1])),
            dtype=self.dtype, name='task_head',
        )(x, train)

    def apply_side_head(self, i, x, train: bool):
        return TaskHead(n_channels_out=self.embedding_dim, n_upsamplings=0,
                        dtype=self.dtype, name=f'side_head{i}')(x, train)


class EmbeddingMLPDecoder(MLPDecoderBase):
    embedding_dim: int = 512

    def apply_task_head(self, x, train: bool):
        return TaskHead(
            n_channels_out=self.embedding_dim,
            upsampling=self.prediction_upsampling,
            n_upsamplings=self.downsampling_in_heads // 2,
            dtype=self.dtype, name='task_head',
        )(x, train)
