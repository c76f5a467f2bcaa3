"""Encoder-decoder (skip) fusion.

Reference model/encoder_decoder_fusion.py:23-203: per-skip fusion of
encoder features into the decoder ladder, 'add'/'select' operation x
modality selection, optional 1x1 ConvNormAct channel adapter. The
'swin[-ln]-*' variants add a LayerNorm on the encoder features; the
reference's NHWC->NCHW permute disappears (everything is NHWC)."""
from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from .common import ConvNormAct, Norm


KNOWN_ENCODER_DECODER_FUSIONS = (
    'add', 'add-rgb', 'add-depth',
    'select', 'select-rgb', 'select-depth',
    'swin-ln-add', 'swin-ln-add-rgb', 'swin-ln-add-depth',
    'swin-ln-select', 'swin-ln-select-rgb', 'swin-ln-select-depth',
    'swin-add', 'swin-add-rgb', 'swin-add-depth',
    'swin-select', 'swin-select-rgb', 'swin-select-depth',
    'none',
)


def parse_encoder_decoder_fusion(name: Optional[str] = None) -> dict:
    if name is None:
        name = 'add-rgb'
    name = name.lower()
    if name not in KNOWN_ENCODER_DECODER_FUSIONS:
        raise ValueError(f"Unknown encoder decoder fusion: '{name}'")

    if name == 'none':
        return {'operation': 'none', 'modality': None,
                'apply_layer_norm': False}

    op = 'add' if 'add' in name else 'select'
    if name.endswith('rgb'):
        modality = 'rgb'
    elif name.endswith('depth'):
        modality = 'depth'
    else:
        modality = None    # single-modality skips: resolved lazily
    return {
        'operation': op,
        'modality': modality,
        'apply_layer_norm': 'swin-ln' in name,
    }


class EncoderDecoderFusion(nn.Module):
    n_channels_encoder: int
    n_channels_decoder: int
    operation: str = 'add'                  # 'add' | 'select' | 'none'
    modality: Optional[str] = None          # 'rgb' | 'depth' | None (lazy)
    apply_layer_norm: bool = False
    norm: str = 'batchnorm'
    act: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_enc: dict, x_dec, train: bool = False):
        if self.operation == 'none':
            return x_dec

        modality = self.modality
        if modality is None:
            assert len(x_enc) == 1
            modality = list(x_enc.keys())[0]
        x = x_enc[modality]

        if self.apply_layer_norm:
            x = Norm('layernorm', dtype=self.dtype, name='ln')(x, train)

        if self.n_channels_encoder != self.n_channels_decoder:
            x = ConvNormAct(self.n_channels_decoder, 1, norm=self.norm,
                            act=self.act, dtype=self.dtype,
                            name='adapter')(x, train)

        if self.operation == 'add':
            return x + x_dec
        return x    # 'select': ignore decoder features
