"""Residual blocks: BasicBlock (ResNet v1), Bottleneck (ResNet v1.5),
NonBottleneck1D (ERFNet factorized 3x1/1x3 + channel dropout).

Reference: model/block.py:31-246. NHWC flax modules; `use_downsample`
adds the 1x1 conv+norm projection on the identity path. The last norm
of each block supports zero-gamma initialization (zero-residual init,
reference initialization.py)."""
from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from .common import conv, get_activation, Norm, ConvNormAct


KNOWN_BLOCKS = ('basicblock', 'bottleneck', 'nonbottleneck1d')


def get_block_name(name: Optional[str] = None) -> str:
    if name is None:
        name = 'nonbottleneck1d'
    name = name.lower()
    if name not in KNOWN_BLOCKS:
        raise ValueError(f"Unknown block: '{name}'")
    return name


def block_expansion(name: str) -> int:
    return 4 if get_block_name(name) == 'bottleneck' else 1


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False
    dilation: int = 1
    norm: str = 'batchnorm'
    act: str = 'relu'
    zero_init_residual: bool = False
    dtype: Any = jnp.float32

    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.act)
        identity = x

        out = conv(self.planes, 3, self.stride, dtype=self.dtype,
                   name='conv1')(x)
        out = Norm(self.norm, dtype=self.dtype, name='norm1')(out, train)
        out = act(out)
        out = conv(self.planes, 3, dtype=self.dtype, name='conv2')(out)
        out = Norm(self.norm, zero_init_scale=self.zero_init_residual,
                   dtype=self.dtype, name='norm2')(out, train)

        if self.use_downsample:
            identity = ConvNormAct(
                self.planes, 1, stride=self.stride, norm=self.norm,
                act=None, dtype=self.dtype, name='downsample')(x, train)

        return act(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    norm: str = 'batchnorm'
    act: str = 'relu'
    zero_init_residual: bool = False
    dtype: Any = jnp.float32

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.act)
        identity = x
        width = int(self.planes * (self.base_width / 64.0)) * self.groups

        out = conv(width, 1, dtype=self.dtype, name='conv1')(x)
        out = Norm(self.norm, dtype=self.dtype, name='norm1')(out, train)
        out = act(out)
        # ResNet v1.5: stride in the 3x3 conv
        out = conv(width, 3, self.stride, self.dilation, self.groups,
                   dtype=self.dtype, name='conv2')(out)
        out = Norm(self.norm, dtype=self.dtype, name='norm2')(out, train)
        out = act(out)
        out = conv(self.planes * self.expansion, 1, dtype=self.dtype,
                   name='conv3')(out)
        out = Norm(self.norm, zero_init_scale=self.zero_init_residual,
                   dtype=self.dtype, name='norm3')(out, train)

        if self.use_downsample:
            identity = ConvNormAct(
                self.planes * self.expansion, 1, stride=self.stride,
                norm=self.norm, act=None, dtype=self.dtype,
                name='downsample')(x, train)

        return act(out + identity)


class NonBottleneck1D(nn.Module):
    """ERFNet block: two factorized 3x1/1x3 conv pairs; channel-wise
    dropout before the residual add (reference block.py:150-218)."""
    planes: int
    stride: int = 1
    use_downsample: bool = False
    dilation: int = 1
    norm: str = 'batchnorm'
    act: str = 'relu'
    dropout_p: float = 0.2
    zero_init_residual: bool = False    # unused; API parity
    dtype: Any = jnp.float32

    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.act)

        out = nn.Conv(self.planes, (3, 1), strides=(self.stride, 1),
                      padding=((1, 1), (0, 0)), use_bias=True,
                      dtype=self.dtype, name='conv1_1')(x)
        out = act(out)
        out = nn.Conv(self.planes, (1, 3), strides=(1, self.stride),
                      padding=((0, 0), (1, 1)), use_bias=False,
                      dtype=self.dtype, name='conv1_2')(out)
        out = Norm(self.norm, dtype=self.dtype, name='norm1')(out, train)
        out = act(out)

        out = nn.Conv(self.planes, (3, 1),
                      padding=((self.dilation, self.dilation), (0, 0)),
                      kernel_dilation=(self.dilation, 1), use_bias=True,
                      dtype=self.dtype, name='conv2_1')(out)
        out = act(out)
        out = nn.Conv(self.planes, (1, 3),
                      padding=((0, 0), (self.dilation, self.dilation)),
                      kernel_dilation=(1, self.dilation), use_bias=False,
                      dtype=self.dtype, name='conv2_2')(out)
        out = Norm(self.norm, dtype=self.dtype, name='norm2')(out, train)

        if self.dropout_p > 0:
            # channel-wise dropout (torch Dropout2d): broadcast over H, W
            out = nn.Dropout(self.dropout_p, broadcast_dims=(1, 2),
                             deterministic=not train)(out)

        if self.use_downsample:
            identity = ConvNormAct(
                self.planes, 1, stride=self.stride, norm=self.norm,
                act=None, dtype=self.dtype, name='downsample')(x, train)
        else:
            identity = x

        return act(out + identity)


def make_block(block_type: str, remat: bool = False, **kwargs):
    block_type = get_block_name(block_type)
    cls = {'basicblock': BasicBlock,
           'bottleneck': Bottleneck,
           'nonbottleneck1d': NonBottleneck1D}[block_type]
    if block_type != 'nonbottleneck1d':
        kwargs.pop('dropout_p', None)
    if block_type != 'bottleneck':
        kwargs.pop('groups', None)
        kwargs.pop('base_width', None)
    if remat:
        # gradient-checkpoint the block: activations inside recompute
        # in the backward pass. `train` (arg 2 of __call__) stays a
        # trace-time constant; the parameter tree is unchanged, so
        # checkpoints interchange with the non-remat model.
        cls = nn.remat(cls, static_argnums=(2,))
    return cls(**kwargs)
