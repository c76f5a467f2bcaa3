"""ResNet backbone (v1 / v1.5) with pluggable residual block, optional
dilation (`-d16`), and optional per-stage Squeeze-and-Excitation.

Reference model/backbone/resnet.py:33-293. Five stages:
  0: stem conv7x7/s2 + norm + act                    (ds 2,  64ch)
  1: maxpool3x3/s2 + layer1                          (ds 4)
  2: layer2                                          (ds 8)
  3: layer3                                          (ds 16)
  4: layer4                                          (ds 32, or 16 with
     `replace_stride_with_dilation=( , , True)`)

Stages are individually callable via `forward_stage(idx, x, train)` so
the fused RGB-D encoder can interleave per-stage fusion (reference
encoder.py:233-246). NHWC layout; torchvision weight porting lives in
utils/torch_port.py."""
from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..blocks import block_expansion, get_block_name, make_block
from ..common import conv, get_activation, Norm, SqueezeAndExcitation
from .base import Backbone


class ResNetBackbone(Backbone):
    block: str = 'basicblock'
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    replace_stride_with_dilation: Tuple[bool, bool, bool] = \
        (False, False, False)
    norm: str = 'batchnorm'
    act: str = 'relu'
    n_input_channels: int = 3
    se: bool = False                     # per-stage SE (ResNetSEBackbone)
    zero_init_residual: bool = False
    groups: int = 1
    width_per_group: int = 64
    dropout_p: float = 0.2               # NonBottleneck1D channel dropout
    remat: bool = False                  # gradient-checkpoint each block
    dtype: Any = jnp.float32

    @property
    def stages_n_channels(self) -> List[int]:
        e = block_expansion(self.block)
        return [64, 64 * e, 128 * e, 256 * e, 512 * e]

    @property
    def stages_downsampling(self) -> List[int]:
        d = self.replace_stride_with_dilation
        return [
            2,
            4,
            4 * 2 ** (1 - sum(d[:1])),
            4 * 2 ** (2 - sum(d[:2])),
            4 * 2 ** (3 - sum(d)),
        ]

    def setup(self):
        get_block_name(self.block)    # validate early
        e = block_expansion(self.block)

        self.conv1 = conv(64, 7, 2, dtype=self.dtype, name='conv1')
        self.norm1 = Norm(self.norm, dtype=self.dtype, name='norm1')

        # plan layers 1-4 (torchvision _make_layer semantics incl. the
        # dilation bookkeeping for -d16 backbones)
        dilation = 1
        in_ch = 64
        layer_blocks = []
        for i, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            stride = 1 if i == 0 else 2
            dilate = (False if i == 0
                      else self.replace_stride_with_dilation[i - 1])
            dilation_in = dilation
            if dilate:
                dilation *= stride
                stride = 1

            blocks = [make_block(
                self.block, remat=self.remat, planes=planes, stride=stride,
                use_downsample=(stride != 1 or in_ch != planes * e),
                dilation=dilation_in, norm=self.norm, act=self.act,
                zero_init_residual=self.zero_init_residual,
                dropout_p=self.dropout_p, groups=self.groups,
                base_width=self.width_per_group, dtype=self.dtype,
                name=f'layer{i + 1}_block0',
            )]
            for b in range(1, n_blocks):
                blocks.append(make_block(
                    self.block, remat=self.remat, planes=planes, stride=1,
                    use_downsample=False, dilation=dilation,
                    norm=self.norm, act=self.act,
                    zero_init_residual=self.zero_init_residual,
                    dropout_p=self.dropout_p, groups=self.groups,
                    base_width=self.width_per_group, dtype=self.dtype,
                    name=f'layer{i + 1}_block{b}',
                ))
            layer_blocks.append(tuple(blocks))
            in_ch = planes * e
        self.layer_blocks = tuple(layer_blocks)

        if self.se:
            self.se_modules = tuple(
                SqueezeAndExcitation(n, act=self.act, dtype=self.dtype,
                                     name=f'se_stage{i}')
                for i, n in enumerate(self.stages_n_channels)
            )

    def forward_stage(self, idx: int, x, train: bool = False):
        if idx == 0:
            x = self.conv1(x)
            x = self.norm1(x, train)
            x = get_activation(self.act)(x)
        else:
            if idx == 1:
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)))
            for block in self.layer_blocks[idx - 1]:
                x = block(x, train)
        if self.se:
            x = self.se_modules[idx](x)
        return x

    def __call__(self, x, train: bool = False):
        outs = []
        for i in range(self.n_stages):
            x = self.forward_stage(i, x, train)
            outs.append(x)
        return outs


def get_resnet_backbone(
    name: str,
    block: Optional[str] = None,
    normalization: str = 'batchnorm',
    activation: str = 'relu',
    **kwargs: Any,
) -> ResNetBackbone:
    """Build a ResNet backbone from a registry name like
    'resnet34' / 'resnet50' / 'resnet18se' / 'resnet34-d16'
    (reference resnet.py:232-293)."""
    name = name.lower()
    base = name.replace('-d16', '')
    if 'resnet18' in base:
        layers = (2, 2, 2, 2)
    elif 'resnet34' in base or 'resnet50' in base:
        layers = (3, 4, 6, 3)
    elif 'resnet101' in base:
        layers = (3, 4, 23, 3)
    else:
        raise ValueError(f"Unknown ResNet: '{name}'")

    if 'resnet50' in base or 'resnet101' in base:
        block_name = 'bottleneck'
    else:
        block_name = get_block_name(block)

    dilation = (False, False, '-d16' in name)

    return ResNetBackbone(
        block=block_name,
        layers=layers,
        replace_stride_with_dilation=dilation,
        norm=normalization,
        act=activation,
        se=base.endswith('se'),
        **kwargs,
    )
