"""Shared model building blocks: norm/act registries, conv helpers,
ConvNormAct, SqueezeAndExcitation.

Mirrors reference model/normalization.py:19-36, activation.py:18-36,
utils.py:17-112, initialization.py:29-81 -- re-designed for NHWC flax
modules with a threaded compute `dtype` (bf16 on TPU; params stay
f32). He fan-out initialization matches torch's
`kaiming_normal_(mode='fan_out', nonlinearity='relu')` default used by
the reference's he_initialization."""
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


KNOWN_NORMALIZATIONS = ('bn', 'batchnorm', 'ln', 'layernorm')
KNOWN_ACTIVATIONS = ('relu', 'silu', 'swish')

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
he_fan_out_init = nn.initializers.variance_scaling(
    2.0, 'fan_out', 'normal')


def get_normalization_name(name: Optional[str] = None) -> str:
    if name is None:
        name = 'batchnorm'
    name = name.lower()
    if name not in KNOWN_NORMALIZATIONS:
        raise ValueError(f"Unknown normalization: '{name}'")
    return 'batchnorm' if name in ('bn', 'batchnorm') else 'layernorm'


def get_activation(name: Optional[str] = None) -> Callable:
    if name is None:
        name = 'relu'
    name = name.lower()
    if name not in KNOWN_ACTIVATIONS:
        raise ValueError(f"Unknown activation: '{name}'")
    return jax.nn.relu if name == 'relu' else jax.nn.silu


class FusedLayerNorm(nn.Module):
    """Drop-in nn.LayerNorm with a single-pass Pallas kernel on the
    inference path (ops/pallas/layernorm.py). The parameter tree
    ('scale'/'bias', f32, ones/zeros init) is identical to
    nn.LayerNorm, so checkpoints interchange.

    backend: 'auto' (Pallas on TPU inference, XLA otherwise), 'xla',
    'pallas', or 'pallas-interpret' (CPU tests). Training always takes
    the XLA path -- the kernel defines no VJP.

    epsilon defaults to torch nn.LayerNorm's 1e-5 (not flax's 1e-6):
    every LayerNorm in this framework mirrors a torch one in the
    reference, and the eps mismatch compounds to ~1e-3 disagreement
    over a Swin stage in weight-port parity tests."""
    epsilon: float = 1e-5
    backend: str = 'auto'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (C,),
                           jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (C,),
                          jnp.float32)
        backend = self.backend
        if backend == 'auto':
            backend = ('pallas' if not train
                       and jax.default_backend() == 'tpu' else 'xla')
        if not train and backend in ('pallas', 'pallas-interpret'):
            from ..ops.pallas.layernorm import fused_layer_norm
            return fused_layer_norm(
                x, scale, bias, eps=self.epsilon,
                interpret=backend == 'pallas-interpret',
                out_dtype=self.dtype)
        # XLA path: identical math to the kernel (f32 stats + affine,
        # clamped fast variance, single cast at the end)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean,
            0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class Norm(nn.Module):
    """Normalization over the channel (last) axis; `train` switches
    BatchNorm between batch statistics and running averages."""
    kind: str = 'batchnorm'
    zero_init_scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kind = get_normalization_name(self.kind)
        scale_init = (nn.initializers.zeros if self.zero_init_scale
                      else nn.initializers.ones)
        if kind == 'batchnorm':
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, scale_init=scale_init,
            )(x)
        return nn.LayerNorm(dtype=self.dtype, scale_init=scale_init)(x)


def conv(
    features: int,
    kernel_size: int = 3,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    use_bias: bool = False,
    dtype: Any = jnp.float32,
    padding: Optional[Any] = None,
    name: Optional[str] = None,
) -> nn.Conv:
    """NHWC conv with torch-style symmetric padding and he fan-out init."""
    if padding is None:
        pad = kernel_size // 2 + dilation - 1
        padding = ((pad, pad), (pad, pad))
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=padding,
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=he_fan_out_init,
        name=name,
    )


class _SplitPointwiseConv(nn.Module):
    """1x1 conv over the CONCAT of `parts`, computed as per-part
    kernel-slice matmuls summed in f32 -- the concatenated tensor never
    materializes in HBM (at the MLP decoders' fullres fuse this is a
    ~1.2 GB round trip per decoder at serving batch). Parameter tree,
    shapes, and init are identical to `conv(features, 1, name='conv')`
    applied to the concat, so checkpoints interchange; only the f32
    accumulation order differs from the single wide matmul."""
    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts):
        n_in = sum(p.shape[-1] for p in parts)
        kernel = self.param('kernel', he_fan_out_init,
                            (1, 1, n_in, self.features), jnp.float32)
        acc = None
        off = 0
        for p in parts:
            c = p.shape[-1]
            w = kernel[0, 0, off:off + c].astype(self.dtype)
            t = jnp.einsum('bhwc,cd->bhwd', p.astype(self.dtype), w,
                           preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
            off += c
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,), jnp.float32)
            acc = acc + bias
        return acc.astype(self.dtype)


class ConvNormAct(nn.Module):
    """conv -> norm -> act (reference model/utils.py ConvNormAct);
    norm/act may be disabled by passing `norm=None` / `act=None`.

    `x` may be a tuple/list of tensors (kernel_size 1 only): the conv
    then runs as per-part kernel slices summed instead of conv(concat)
    -- same parameters, no concatenated intermediate."""
    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    norm: Optional[str] = 'batchnorm'
    act: Optional[str] = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (tuple, list)):
            assert self.kernel_size == 1 and self.stride == 1, \
                'split input only for pointwise convs'
            x = _SplitPointwiseConv(
                self.features, use_bias=self.norm is None,
                dtype=self.dtype, name='conv')(x)
        else:
            x = conv(self.features, self.kernel_size, self.stride,
                     self.dilation, use_bias=self.norm is None,
                     dtype=self.dtype, name='conv')(x)
        if self.norm is not None:
            x = Norm(self.norm, dtype=self.dtype, name='norm')(x, train)
        if self.act is not None:
            x = get_activation(self.act)(x)
        return x


class SqueezeAndExcitation(nn.Module):
    """Channel attention via GAP -> 1x1 reduce -> act -> 1x1 expand ->
    sigmoid (reference model/utils.py:71-95). The GAP + pointwise convs
    are pure matmuls -- ideal for the MXU; the reference's TensorRT
    two-stage-pool workaround is unnecessary under XLA."""
    n_channels: int
    reduction: int = 16
    act: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_red = self.n_channels // self.reduction
        assert n_red > 0
        w = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = conv(n_red, 1, use_bias=True, dtype=self.dtype, name='fc1')(w)
        w = get_activation(self.act)(w)
        w = conv(self.n_channels, 1, use_bias=True, dtype=self.dtype,
                 name='fc2')(w)
        w = jax.nn.sigmoid(w)
        return x * w
