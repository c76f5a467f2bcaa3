"""Fused semantic score/argmax reduction over class logits.

The (B, H, W, C) full-resolution logits tensor is ~1 GB at the bench
shape (128, 480, 640, 40) in bf16; deriving `argmax`, `max-softmax
score`, and (implicitly) `logsumexp` with separate XLA reduces costs
one full HBM read per reduce (~4 reads, ~16 ms/step on v5e). This
kernel computes all three in ONE pass:

    idx   = first argmax over C           (torch.max tie-break)
    score = softmax(logits)[idx] = 1 / sum_c exp(logit_c - max)

matching postprocessing/semantic.py's logit-space formulation
(reference model/postprocessing/semantic.py:17-82 computes an explicit
softmax; argmax is softmax-invariant).

Block layout: grid over (B, H / BH); each step loads a
(1, BH, W, C) logits tile into VMEM (C rides the lane axis; C == the
array dim so any C works) and writes (1, BH, W) score/idx tiles.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(logits_ref, score_ref, idx_ref, *, n_classes: int):
    x = logits_ref[...].astype(jnp.float32)          # (1, BH, W, C)
    m = jnp.max(x, axis=-1)                          # (1, BH, W)
    # first index attaining the max (torch.max tie-break)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 3)
    hit = x >= m[..., None]
    idx_ref[...] = jnp.min(
        jnp.where(hit, iota, n_classes), axis=-1).astype(jnp.int32)
    # max-softmax score: exp(m - lse) == 1 / sum(exp(x - m))
    s = jnp.sum(jnp.exp(x - m[..., None]), axis=-1)
    score_ref[...] = 1.0 / s


@functools.partial(jax.jit, static_argnames=('block_h', 'interpret'))
def semantic_score_idx_pallas(logits: jnp.ndarray, block_h: int = 16,
                              interpret: bool = False):
    """logits (B, H, W, C) -> (score f32 (B, H, W), idx int32 (B, H, W)).

    Requires H % block_h == 0 and W % 128 == 0 (output tile lanes);
    callers fall back to the XLA path otherwise."""
    B, H, W, C = logits.shape
    assert H % block_h == 0 and W % 128 == 0, (H, W)

    grid = (B, H // block_h)
    in_spec = pl.BlockSpec((1, block_h, W, C), lambda b, h: (b, h, 0, 0))
    out_spec = pl.BlockSpec((1, block_h, W), lambda b, h: (b, h, 0))

    score, idx = pl.pallas_call(
        functools.partial(_kernel, n_classes=C),
        grid=grid,
        in_specs=[in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        ],
        interpret=interpret,
    )(logits)
    return score, idx


def semantic_score_idx(logits: jnp.ndarray, backend: str = 'auto'):
    """(max-softmax score, argmax) over the class axis of (B, H, W, C)
    logits.

    `auto` resolves to the XLA formulation: inside the fused inference
    program XLA assigns the conv-produced logits a batch-minor layout
    ({0,3,2,1}) and a pallas_call forces row-major inputs, so the
    kernel's saved re-reads are eaten by a ~1 GB layout copy (measured
    601 -> 264 frames/s at the bench shape -- see PERF.md). The fused
    kernel stays available via backend='pallas' for contexts where the
    logits are already row-major (standalone it is ~4x faster than the
    separate reduces)."""
    if backend == 'auto':
        backend = 'xla'

    if backend == 'pallas':
        # block_h=8 keeps the lane-padded f32 intermediates (C pads to
        # 128 lanes) inside the 16 MB scoped-VMEM budget at W=640
        return semantic_score_idx_pallas(logits, block_h=8)

    from ..lookup import max_and_argmax
    m, idx = max_and_argmax(logits, axis=-1)
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    return jnp.exp(m.astype(jnp.float32) - lse), idx
