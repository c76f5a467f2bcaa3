"""Single-pass fused LayerNorm kernel.

XLA lowers the Swin path's LayerNorms into multi-pass reduce+convert
fusions (profiled at ~6 ms each for (64, 60, 80, 256) bf16 inputs on an
EMSAFormer B64 serving step -- ~20x the bandwidth bound). This kernel
reads each row block once into VMEM, computes f32 mean / fast-variance
per row, normalizes and applies the affine, and writes once: two
passes of HBM traffic total.

Semantics match flax.linen.LayerNorm with use_fast_variance=True
(f32 statistics with the negative-variance clamp, eps inside the
rsqrt, affine in f32, output cast to `out_dtype`). Inference-path only
-- no VJP is defined; training keeps the XLA implementation
(models/common.py FusedLayerNorm gates on `train`).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    # fast variance E[x^2] - E[x]^2, clamped at 0 like flax: f32
    # cancellation on large-magnitude near-constant rows can push it
    # below -eps and rsqrt(negative) is NaN
    var = jnp.maximum(
        jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) \
        + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=('eps', 'block_rows', 'interpret',
                                   'out_dtype'))
def fused_layer_norm(x, scale, bias, eps: float = 1e-5,
                     block_rows: int = 512, interpret: bool = False,
                     out_dtype=None):
    """LayerNorm over the last axis of `x` (any leading shape).

    scale/bias: (C,) affine parameters (f32 masters fine). eps
    defaults to torch nn.LayerNorm's 1e-5 (every LN here mirrors a
    torch one in the reference); FusedLayerNorm passes its own.
    out_dtype defaults to x.dtype.
    """
    orig_shape = x.shape
    C = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    xr = x.reshape(rows, C)
    out_dtype = out_dtype or x.dtype

    # bound the block's VMEM footprint: in+out double-buffered plus
    # the f32 temporaries is roughly 6 copies of the block; keep the
    # f32 block at <= ~1 MB so wide-C LNs (4C patch-merge inputs up to
    # 4096) compile within scoped VMEM
    rb = min(block_rows, rows, max(8, ((1 << 18) // C) // 8 * 8))
    grid = (pl.cdiv(rows, rb),)
    out = pl.pallas_call(
        partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), out_dtype),
        interpret=interpret,
    )(xr, scale.reshape(1, C), bias.reshape(1, C))
    return out.reshape(orig_shape)
