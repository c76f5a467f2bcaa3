"""Context modules: PSPNet pyramid pooling (PPM), adaptive PPM, and a
no-op 1x1 adapter.

Reference model/context_module/{__init__,ppm,appm,none}.py. All return
`(features, context_branch_tuple)`; branch[0] with bin 1 is the global
pooled feature the scene decoder consumes. Adaptive average pooling
with fixed output bins is implemented as reshape-mean when the input
divides evenly (the common case on TPU: static shapes), falling back
to torch-style index windows otherwise."""
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .common import ConvNormAct
from .upsampling import resize_bilinear, resize_nearest


KNOWN_CONTEXT_MODULES = ('none', 'ppm', 'ppm-1-2-4-8', 'appm', 'appm-1-2-4-8')


def adaptive_avg_pool2d(x, output_size: Tuple[int, int]):
    """torch.nn.AdaptiveAvgPool2d semantics for NHWC inputs: window i
    spans [floor(i*H/h), ceil((i+1)*H/h))."""
    h_out, w_out = output_size
    h_in, w_in = x.shape[-3], x.shape[-2]

    if h_in % h_out == 0 and w_in % w_out == 0:
        # fast path: plain reshape-mean (static shapes on TPU)
        b = x.shape[:-3]
        x = x.reshape(*b, h_out, h_in // h_out, w_out, w_in // w_out,
                      x.shape[-1])
        return x.mean(axis=(-4, -2))

    # general path: cumulative-sum based windowed means
    def pool_axis(arr, n_out, axis):
        n_in = arr.shape[axis]
        starts = (jnp.arange(n_out) * n_in) // n_out
        ends = -(-(jnp.arange(1, n_out + 1) * n_in) // n_out)   # ceil
        csum = jnp.cumsum(arr, axis=axis)
        csum = jnp.concatenate(
            [jnp.zeros_like(jnp.take(csum, jnp.array([0]), axis=axis)),
             csum], axis=axis)
        hi = jnp.take(csum, ends, axis=axis)
        lo = jnp.take(csum, starts, axis=axis)
        return (hi - lo) / (ends - starts).reshape(
            [-1 if d == (axis % arr.ndim) else 1 for d in range(arr.ndim)])

    x = pool_axis(x, h_out, -3)
    x = pool_axis(x, w_out, -2)
    return x


class PyramidPoolingModule(nn.Module):
    """PPM with fixed output bins (reference ppm.py:23-78)."""
    n_channels_in: int
    n_channels_out: int
    bins: Tuple[int, ...] = (1, 2, 3, 6)
    norm: str = 'batchnorm'
    act: str = 'relu'
    upsampling: str = 'bilinear'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        n_red = self.n_channels_in // len(self.bins)

        out = [x]
        features_context = []
        for i, bin_ in enumerate(self.bins):
            y = adaptive_avg_pool2d(x, (bin_, bin_))
            y = ConvNormAct(n_red, 1, norm=self.norm, act=self.act,
                            dtype=self.dtype, name=f'branch{i}')(y, train)
            features_context.append(y)
            if self.upsampling == 'nearest':
                out.append(resize_nearest(y, h, w))
            else:
                out.append(resize_bilinear(y, h, w))

        out = jnp.concatenate(out, axis=-1)
        out = ConvNormAct(self.n_channels_out, 1, norm=self.norm,
                          act=self.act, dtype=self.dtype,
                          name='final_conv')(out, train)
        return out, tuple(features_context)


class AdaptivePyramidPoolingModule(nn.Module):
    """APPM: bins scale with input/train-size ratio so evaluation at a
    different resolution pools comparable regions (reference
    appm.py:20-85)."""
    n_channels_in: int
    n_channels_out: int
    input_size: Tuple[int, int] = (20, 27)
    bins: Tuple[int, ...] = (1, 2, 3, 6)
    norm: str = 'batchnorm'
    act: str = 'relu'
    upsampling: str = 'bilinear'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        h_inp, w_inp = self.input_size
        bin_multiplier_h = int((h / h_inp) + 0.5)
        bin_multiplier_w = int((w / w_inp) + 0.5)
        n_red = self.n_channels_in // len(self.bins)

        out = [x]
        features_context = []
        for i, bin_ in enumerate(self.bins):
            h_pool = max(bin_ * bin_multiplier_h, 1)
            w_pool = max(bin_ * bin_multiplier_w, 1)
            y = adaptive_avg_pool2d(x, (h_pool, w_pool))
            y = ConvNormAct(n_red, 1, norm=self.norm, act=self.act,
                            dtype=self.dtype, name=f'branch{i}')(y, train)
            features_context.append(y)
            if self.upsampling == 'nearest':
                out.append(resize_nearest(y, h, w))
            else:
                out.append(resize_bilinear(y, h, w))

        out = jnp.concatenate(out, axis=-1)
        out = ConvNormAct(self.n_channels_out, 1, norm=self.norm,
                          act=self.act, dtype=self.dtype,
                          name='final_conv')(out, train)
        return out, tuple(features_context)


class NoContextModule(nn.Module):
    """1x1 channel adapter without spatial context (reference
    none.py:18-43)."""
    n_channels_in: int
    n_channels_out: int
    norm: str = 'batchnorm'
    act: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.n_channels_in != self.n_channels_out:
            x = ConvNormAct(self.n_channels_out, 1, norm=self.norm,
                            act=self.act, dtype=self.dtype,
                            name='conv')(x, train)
        return x, ()


def get_context_module(
    name: Optional[str],
    n_channels_in: int,
    n_channels_out: int,
    input_size: Tuple[int, int],
    normalization: str = 'batchnorm',
    activation: str = 'relu',
    upsampling: str = 'bilinear',
    dtype: Any = jnp.float32,
):
    """Factory (reference context_module/__init__.py:46-89)."""
    if name is None:
        name = 'ppm'
    name = name.lower()
    if name not in KNOWN_CONTEXT_MODULES:
        raise ValueError(f"Unknown context module: '{name}'")

    if name == 'none':
        return NoContextModule(
            n_channels_in=n_channels_in, n_channels_out=n_channels_out,
            norm=normalization, act=activation, dtype=dtype)

    bins = (1, 2, 4, 8) if name.endswith('1-2-4-8') else (1, 2, 3, 6)
    # reference uses bins (1, 2, 3, 6); the '-1-2-4-8' suffix selects
    # power-of-two bins (friendlier to the reshape-mean fast path)
    if name.startswith('appm'):
        return AdaptivePyramidPoolingModule(
            n_channels_in=n_channels_in, n_channels_out=n_channels_out,
            input_size=tuple(input_size), bins=bins, norm=normalization,
            act=activation, upsampling=upsampling, dtype=dtype)
    return PyramidPoolingModule(
        n_channels_in=n_channels_in, n_channels_out=n_channels_out,
        bins=bins, norm=normalization, act=activation,
        upsampling=upsampling, dtype=dtype)
