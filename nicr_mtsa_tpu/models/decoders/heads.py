"""Task heads.

- `TaskHead`: 3x3 conv (1x1 for side outputs) -> n_upsamplings x 2x
  prediction upsampling -> optional post-op (reference
  model/decoder/dense_utils.py:10-36).
- `InstanceHead`: shared 3x3 ConvNormAct whose output is split into
  center (1ch, sigmoid), offset (2ch, tanh) and optional orientation
  (2ch, unit-normalized) convs; the concatenated raw maps are jointly
  upsampled before the activations (reference
  model/decoder/instance.py:27-122)."""
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...utils._orientation import unit_length
from ..common import conv, ConvNormAct
from ..upsampling import Upsampling


class TaskHead(nn.Module):
    n_channels_out: int
    upsampling: str = 'bilinear'
    n_upsamplings: int = 0
    post: Optional[str] = None    # None | 'unit-length'
    dtype: Any = jnp.float32
    # return the LAST prediction upsampling as DeferredUpsampling so
    # postprocessing can fuse it with its reduction (serving path;
    # parameter tree is unchanged, so checkpoints interchange).
    # 'all' defers BOTH upsamplings of a 2-ladder head as a
    # DeferredUpsampling2 (fused 4x finisher) -- still param-identical.
    defer_last_upsampling: Any = False      # False | True | 'all'

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..upsampling import DeferredBilinear2, DeferredUpsampling2

        is_main_output = self.n_upsamplings != 0
        x = conv(self.n_channels_out, 3 if is_main_output else 1,
                 use_bias=True, dtype=self.dtype, name='conv')(x)

        defer_all = self.defer_last_upsampling == 'all'
        if defer_all:
            assert self.n_upsamplings == 2, self.n_upsamplings
            assert self.post is None, \
                'cannot defer upsampling under a post-op'
            if self.upsampling == 'bilinear':
                # parameter-free ladder: nothing to capture but x
                return DeferredBilinear2(x=x)
            assert self.upsampling == 'learned-3x3-zeropad', \
                self.upsampling
            # declare both modules (identical parameter tree) but
            # capture their weights instead of applying the convs
            d1 = Upsampling(mode=self.upsampling,
                            n_channels=self.n_channels_out,
                            dtype=self.dtype, defer=True,
                            name='upsample_0')(x)
            d2 = Upsampling(mode=self.upsampling,
                            n_channels=self.n_channels_out,
                            dtype=self.dtype, defer=True,
                            name='upsample_1')(d1.x)
            return DeferredUpsampling2(
                x=d1.x, kernel1=d1.kernel, bias1=d1.bias,
                kernel2=d2.kernel, bias2=d2.bias)

        for i in range(self.n_upsamplings):
            defer = (self.defer_last_upsampling is True
                     and i == self.n_upsamplings - 1)
            if defer:
                assert self.post is None, \
                    'cannot defer upsampling under a post-op'
                assert self.upsampling == 'learned-3x3-zeropad', \
                    self.upsampling
            x = Upsampling(mode=self.upsampling,
                           n_channels=self.n_channels_out,
                           dtype=self.dtype, defer=defer,
                           name=f'upsample_{i}')(x)
        if self.post == 'unit-length':
            x = unit_length(x)
        return x


class InstanceHead(nn.Module):
    n_channels_per_task: int = 32    # panoptic-deeplab default
    with_orientation: bool = False
    sigmoid_for_center: bool = True
    tanh_for_offset: bool = True
    norm: str = 'batchnorm'
    act: str = 'relu'
    upsampling: str = 'bilinear'
    n_upsamplings: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        n_tasks = 3 if self.with_orientation else 2
        npt = self.n_channels_per_task

        x = ConvNormAct(n_tasks * npt, 3, norm=self.norm, act=self.act,
                        dtype=self.dtype, name='shared_conv')(x, train)

        is_main_output = self.n_upsamplings != 0
        k = 3 if is_main_output else 1

        outs = [
            conv(1, k, use_bias=True, dtype=self.dtype,
                 name='conv_center')(x[..., 0:npt]),
            conv(2, k, use_bias=True, dtype=self.dtype,
                 name='conv_offset')(x[..., npt:2 * npt]),
        ]
        if n_tasks == 3:
            outs.append(
                conv(2, k, use_bias=True, dtype=self.dtype,
                     name='conv_orientation')(x[..., 2 * npt:3 * npt]))

        # joint upsampling of the concatenated raw maps
        cat = jnp.concatenate(outs, axis=-1)
        for i in range(self.n_upsamplings):
            cat = Upsampling(mode=self.upsampling,
                             n_channels=cat.shape[-1],
                             dtype=self.dtype, name=f'upsample_{i}')(cat)

        center = cat[..., 0:1]
        offset = cat[..., 1:3]
        if self.sigmoid_for_center:
            center = jax.nn.sigmoid(center)
        if self.tanh_for_offset:
            offset = jnp.tanh(offset)
        result = [center, offset]
        if n_tasks == 3:
            result.append(unit_length(cat[..., 3:5]))
        return tuple(result)
