"""Fused semantic head finisher: learned-3x3-zeropad x2 upsampling +
argmax/max-softmax-score reduction in ONE Pallas pass.

The reference pipeline upsamples the semantic logits to full
resolution with a learned depthwise conv (model/upsampling.py:63-69 in
the reference; models/upsampling.py here) and then derives
argmax/score from the (B, 2H, 2W, C) tensor. At the bench shape
(256, 480, 640, 40) that chain costs ~24 ms for the depthwise conv
(VPU-bound: 16-tap kernel with 12 structural zeros) plus ~28 ms for
three XLA reduces re-reading the 6.3 GB logits tensor, which also sets
the HBM peak-memory ceiling.

This kernel exploits two structures:

1. **Phase decomposition.** The fused zeropad upsampling conv
   (4x4 kernel `kt`, lhs_dilation 2, padding 2) splits into 4 output
   phases, each a 2x2-tap depthwise conv of the half-res input:

       out[2i+py, 2j+px, c]
         = sum_{a,b in {0,1}} kt[2a+py, 2b+px, c] * xp[i+a+py, j+b+px, c]
           + bias[c]

   (xp = input zero-padded by 1). Only the 4 real taps are computed.

2. **Batch-minor layout.** Inside the fused inference program XLA
   assigns conv outputs a batch-minor layout ({0,3,2,1}, physical
   (H, W, C, B)). The caller transposes to logical (H, W, C, B) --
   a BITCAST, verified in the compiled HLO -- so the kernel's
   row-major requirement costs no relayout copy (the failure mode
   that sank the naive fullres reduce kernel, PERF.md lesson 6), and
   the batch rides the 128-wide lane axis.

The upsampled logits never touch HBM: per (Ht, Wt) tile the phase
logits live in VMEM/registers and only idx (int32) and score (f32)
at 2H x 2W are written back -- ~3.5 GB of traffic instead of ~32 GB.

Tie-breaking and score formula match ops/pallas/semantic_reduce.py:
idx = FIRST argmax over C; score = 1 / sum_c exp(logit_c - max)
(= max-softmax). Phase logits are rounded to the conv dtype (bf16)
before the reduction to match the conv-path numerics.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interleave_sublanes(a, b):
    """(Wt, Bt), (Wt, Bt) -> (2Wt, Bt): out[2j] = a[j], out[2j+1] = b[j]."""
    return jnp.stack([a, b], axis=1).reshape(2 * a.shape[0], a.shape[1])


def _make_kernel(Ht: int, Wt: int, C: int, out_dtype):
    def _kernel(kt_ref, bias_ref, x_hbm, idx_ref, score_ref, x_vmem, sem):
        # manual halo DMA: block needs (Ht+2, Wt+2) of the padded input
        ib = pl.program_id(0)
        ih = pl.program_id(1)
        iw = pl.program_id(2)
        Bt = x_vmem.shape[-1]
        copy = pltpu.make_async_copy(
            x_hbm.at[pl.ds(ih * Ht, Ht + 2), pl.ds(iw * Wt, Wt + 2),
                     slice(None), pl.ds(ib * Bt, Bt)],
            x_vmem, sem)
        copy.start()
        copy.wait()

        bias = bias_ref[0].astype(jnp.float32)        # (C, 1)

        def phase(i, py, px):
            # (Wt, C, Bt) phase logits, f32 accumulation like the conv
            l = None
            for a in (0, 1):
                row = x_vmem[i + a + py]              # (Wt+2, C, Bt)
                for b in (0, 1):
                    w = kt_ref[2 * a + py, 2 * b + px].astype(jnp.float32)
                    term = w * row[b + px:b + px + Wt].astype(jnp.float32)
                    l = term if l is None else l + term
            # match the conv path's double rounding: the conv output is
            # rounded to the conv dtype BEFORE the bias add
            # (models/upsampling.py); reductions then run on the
            # rounded values upcast to f32 (exact; the target has no
            # packed-bf16 vector compare)
            l = (l.astype(out_dtype).astype(jnp.float32)
                 + bias).astype(out_dtype).astype(jnp.float32)
            m = jnp.broadcast_to(
                jnp.max(l, axis=1, keepdims=True), l.shape)  # (Wt, C, Bt)
            # first argmax, mask-free (Mosaic cannot relayout a 3D i1
            # mask against the lane-replicated iota): non-max lanes get
            # a +C penalty, so min(iota + C*penalty) = first max index.
            # All in f32 (exact for C < 2^24): int32 min-reduces over
            # the class axis miscompile on the multi-device CPU backend
            # for some C (float reduces are fine -- see tests).
            iota = jax.lax.broadcasted_iota(
                jnp.int32, l.shape, 1).astype(jnp.float32)
            pen = (l < m).astype(jnp.float32)
            idx = jnp.min(iota + C * pen, axis=1)
            s = jnp.sum(jnp.exp(l - m), axis=1)
            return idx.astype(jnp.int32), 1.0 / s

        def row(i, _):
            for py in (0, 1):
                i00, s00 = phase(i, py, 0)
                i01, s01 = phase(i, py, 1)
                idx_ref[2 * i + py] = _interleave_sublanes(i00, i01)
                score_ref[2 * i + py] = _interleave_sublanes(s00, s01)
            return 0

        jax.lax.fori_loop(0, Ht, row, 0)

    return _kernel


@functools.partial(
    jax.jit,
    static_argnames=('block_h', 'block_w', 'block_b', 'interpret'))
def _finisher_call(xt, kt, bias, block_h, block_w, block_b, interpret):
    Hp, Wp, C, B = xt.shape          # already padded: Hp = H + 2
    H, W = Hp - 2, Wp - 2
    Ht, Wt, Bt = block_h, block_w, block_b

    grid = (B // Bt, H // Ht, W // Wt)
    out_spec = pl.BlockSpec(
        (2 * Ht, 2 * Wt, Bt), lambda ib, ih, iw: (ih, iw, ib),
        memory_space=pltpu.VMEM)

    idx_t, score_t = pl.pallas_call(
        _make_kernel(Ht, Wt, C, xt.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, 4, C, 1), lambda ib, ih, iw: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda ib, ih, iw: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((2 * H, 2 * W, B), jnp.int32),
            jax.ShapeDtypeStruct((2 * H, 2 * W, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Ht + 2, Wt + 2, C, Bt), xt.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(kt[..., None], bias[None, :, None], xt)
    return idx_t, score_t


def fused_upsample_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """3x3 depthwise kernel (3, 3, 1, C) -> the fused 4x4 zeropad-x2
    kernel (4, 4, C); exact-add construction shared with
    models/upsampling.py."""
    from ...models.upsampling import fused_zeropad_2x_kernel
    return fused_zeropad_2x_kernel(kernel)[:, :, 0, :]


def upsample2x_argmax_score(
    x: jnp.ndarray,            # (B, H, W, C) logits (bf16/f32)
    kernel: jnp.ndarray,       # (3, 3, 1, C) f32 depthwise weights
    bias: jnp.ndarray,         # (C,) f32
    *,
    block_h: int = 8,
    block_w: int = 32,
    interpret: bool = False,
):
    """(first-argmax idx int32, max-softmax score f32), both
    (B, 2H, 2W), of the learned-3x3-zeropad x2 upsampled logits --
    without materializing the (B, 2H, 2W, C) tensor.

    Requires B % 128 == 0 (or == 8 in interpret mode), H % block_h == 0,
    W % block_w == 0; callers fall back to the conv + XLA-reduce path
    otherwise (see postprocessing/semantic.py).
    """
    B, H, W, C = x.shape
    block_b = 128 if B % 128 == 0 else 8
    assert B % block_b == 0 and H % block_h == 0 and W % block_w == 0, \
        (x.shape, block_h, block_w, block_b)

    kt = fused_upsample_kernel(kernel).astype(x.dtype)    # conv casts too
    bias = bias.astype(x.dtype)

    xt = jnp.transpose(x, (1, 2, 3, 0))       # bitcast under batch-minor
    xt = jnp.pad(xt, ((1, 1), (1, 1), (0, 0), (0, 0)))

    idx_t, score_t = _finisher_call(
        xt, kt, bias, block_h, block_w, block_b, interpret)

    # bitcast back to the batch-major logical view consumers use
    return (jnp.transpose(idx_t, (2, 0, 1)),
            jnp.transpose(score_t, (2, 0, 1)))


def upsample2x_argmax_score_reference(x, kernel, bias, dtype=None):
    """XLA twin (depthwise conv + reduces) used for exactness tests and
    as the fallback path; mirrors models/upsampling.py Upsampling
    (learned-3x3-zeropad) followed by semantic_score_idx."""
    from ...models.upsampling import learned_zeropad_2x
    from .semantic_reduce import semantic_score_idx
    y = learned_zeropad_2x(x, kernel, bias, dtype or x.dtype)
    score, idx = semantic_score_idx(y)
    return idx, score


def finish_deferred_semantic(deferred, *, interpret: bool = False):
    """(idx int32, score f32), both (B, 2H, 2W), for a semantic head's
    DeferredUpsampling output. Dispatches to the fused Pallas kernel
    when the backend and shapes allow; otherwise (CPU tests, odd
    shapes) falls back to `apply_deferred_upsampling_exact` + reduce --
    the kernel's exact phase math in plain XLA elementwise ops (NOT the
    conv twin: oneDNN CPU / default-precision TPU convs are
    reduced-precision and would break within-dict consistency with the
    on-demand dense keys, tests/test_deferred_consistency.py)."""
    from ...models.upsampling import apply_deferred_upsampling_exact
    from .semantic_reduce import semantic_score_idx
    x, kernel, bias = deferred.x, deferred.kernel, deferred.bias
    B, H, W, C = x.shape
    if bias is None:
        bias = jnp.zeros((C,), jnp.float32)
    use_pallas = interpret or (
        jax.default_backend() == 'tpu'
        and B % 128 == 0 and H % 8 == 0 and W % 32 == 0
        and C % 8 == 0)    # sublane-aligned class axis (DMA tiling)
    if use_pallas:
        return upsample2x_argmax_score(x, kernel, bias,
                                       interpret=interpret)
    score, idx = semantic_score_idx(
        apply_deferred_upsampling_exact(deferred).astype(jnp.float32))
    return idx, score
