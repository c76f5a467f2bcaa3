"""Double-deferred semantic finisher: TWO learned-3x3-zeropad x2
upsamplings + argmax/max-softmax-score in ONE Pallas pass
(quarter-res logits -> fullres predictions).

The semantic head applies log2(downsampling) = 2 prediction
upsamplings (reference model/decoder/semantic.py:26-140 via
dense_utils.py:10-36). `ops/pallas/semantic_finisher.py` already fuses
the LAST one with the argmax/score reduction; this kernel folds the
FIRST one in as well, so the (B, 2H, 2W, C) intermediate logits tensor
(1.57 GB bf16 at the B256 serving shape) never round-trips HBM either:

    quarter-res x --(stage 1: 2x zeropad conv, VMEM)--> intermediate
                  --(stage 2: 2x zeropad conv, VMEM)--> fullres phases
                  --(argmax + score, VMEM)--> idx/score written to HBM

Stage squashing into ONE stride-4 conv is NOT exact with trained
biases (the stage-1 bias propagates position-dependently through the
zero-padded borders of stage 2 -- PERF.md), so the kernel evaluates the
two stages sequentially per tile, reproducing the conv chain's exact
numerics: f32 tap accumulation, rounding to the conv dtype before each
bias add, and zero-padding applied AFTER the stage-1 bias.

Layout/tiling follows semantic_finisher.py: inputs enter batch-minor
as (H, W, C, B) (a bitcast of the conv output), batch rides the 128
lanes, and the input tile's 1-px halo arrives via a manual async copy.
The intermediate tile (2Ht+2, 2Wt+2, C, Bt) lives in VMEM scratch; its
"+2" ring is exactly the stage-2 halo, with the global zero-pad ring
masked in at image borders.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .semantic_finisher import _interleave_sublanes


def _interleave_rows3(a, b):
    """(N, C, Bt) x2 -> (2N, C, Bt) with out[2t] = a[t], out[2t+1] = b[t].

    Leading (untiled) axis only -- compiles to register interleaving,
    no relayout."""
    return jnp.stack([a, b], axis=1).reshape(2 * a.shape[0], *a.shape[1:])


def _make_kernel(Ht: int, Wt: int, C: int, out_dtype, edge: bool = False):
    """edge=False: zero-pad borders (learned-3x3-zeropad chain).
    edge=True: replication borders (bilinear chain) -- the caller
    edge-pads the input, so the halo rows/cols already hold the edge
    values and every border mask is skipped; because each bilinear
    phase's taps sum to 1, phases over duplicated rows reproduce the
    clamped resize exactly (models/upsampling.py DeferredBilinear2)."""
    def _kernel(k1_ref, b1_ref, k2_ref, b2_ref, x_hbm,
                idx_ref, score_ref, x_vmem, inter_vmem, sem):
        ib = pl.program_id(0)
        ih = pl.program_id(1)
        iw = pl.program_id(2)
        n_h = pl.num_programs(1)
        n_w = pl.num_programs(2)
        Bt = x_vmem.shape[-1]
        copy = pltpu.make_async_copy(
            x_hbm.at[pl.ds(ih * Ht, Ht + 2), pl.ds(iw * Wt, Wt + 2),
                     slice(None), pl.ds(ib * Bt, Bt)],
            x_vmem, sem)
        copy.start()
        copy.wait()

        b1 = b1_ref[0].astype(jnp.float32)        # (C, 1)
        b2 = b2_ref[0].astype(jnp.float32)

        # ---- stage 1: intermediate rows m = 2*T - 1 + q ------------
        # (T = ih*Ht). The q = 0 / q = 2Ht+1 rows are the stage-2 halo;
        # at image borders they are the global zero-pad ring instead.
        def strip1(li, py, px):
            # (Wt+1, C, Bt) f32 phase strip: both px phases read the
            # SAME input columns (the strips cover offset output
            # columns), only the tap weights differ.
            acc = None
            for a in (0, 1):
                row = x_vmem[li + a]              # (Wt+2, C, Bt)
                for b in (0, 1):
                    w = k1_ref[2 * a + py, 2 * b + px].astype(jnp.float32)
                    t = w * row[b:b + Wt + 1].astype(jnp.float32)
                    acc = t if acc is None else acc + t
            return acc

        top = (ih > 0).astype(jnp.float32)
        bot = (ih < n_h - 1).astype(jnp.float32)
        for q in range(2 * Ht + 2):
            m_rel = q - 1                         # row rel. to 2*T
            py = m_rel & 1                        # -1 & 1 == 1
            li = ((m_rel - py) >> 1) + py         # x_vmem base row
            s_odd = strip1(li, py, 1)             # out cols 2j+1 ...
            s_even = strip1(li, py, 0)
            # local col 0 is global col 2*S-1 (odd phase first)
            row = _interleave_rows3(s_odd, s_even)    # (2Wt+2, C, Bt)
            # conv-chain numerics: round accumulation to the conv
            # dtype, add the (rounded) bias, round again
            row = (row.astype(out_dtype).astype(jnp.float32) + b1)
            if not edge:
                if q == 0:
                    row = row * top
                elif q == 2 * Ht + 1:
                    row = row * bot
            inter_vmem[q] = row.astype(out_dtype)

        if not edge:
            # stage-2 global zero-pad ring on the column edges (AFTER
            # the stage-1 bias, like jnp.pad of the biased conv output)
            left = (iw > 0).astype(out_dtype)
            right = (iw < n_w - 1).astype(out_dtype)
            inter_vmem[:, 0:1] = inter_vmem[:, 0:1] * left
            inter_vmem[:, 2 * Wt + 1:2 * Wt + 2] = (
                inter_vmem[:, 2 * Wt + 1:2 * Wt + 2] * right)

        # ---- stage 2 + reduction: identical structure to
        # semantic_finisher.py but reading the VMEM intermediate ------
        def phase2(u, qy, qx):
            acc = None
            for c in (0, 1):
                row = inter_vmem[u + c + qy]      # (2Wt+2, C, Bt)
                for d in (0, 1):
                    w = k2_ref[2 * c + qy, 2 * d + qx].astype(jnp.float32)
                    t = w * row[d + qx:d + qx + 2 * Wt].astype(jnp.float32)
                    acc = t if acc is None else acc + t
            l = (acc.astype(out_dtype).astype(jnp.float32)
                 + b2).astype(out_dtype).astype(jnp.float32)
            m = jnp.broadcast_to(
                jnp.max(l, axis=1, keepdims=True), l.shape)
            # first argmax via arithmetic penalty (no 3D i1 masks --
            # see semantic_finisher.py)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, l.shape, 1).astype(jnp.float32)
            pen = (l < m).astype(jnp.float32)
            idx = jnp.min(iota + C * pen, axis=1)
            s = jnp.sum(jnp.exp(l - m), axis=1)
            return idx.astype(jnp.int32), 1.0 / s

        def row2(u, _):
            for qy in (0, 1):
                i0, s0 = phase2(u, qy, 0)
                i1, s1 = phase2(u, qy, 1)
                idx_ref[2 * u + qy] = _interleave_sublanes(i0, i1)
                score_ref[2 * u + qy] = _interleave_sublanes(s0, s1)
            return 0

        jax.lax.fori_loop(0, 2 * Ht, row2, 0)

    return _kernel


@functools.partial(
    jax.jit,
    static_argnames=('block_h', 'block_w', 'block_b', 'interpret',
                     'edge'))
def _finisher4x_call(xt, k1t, b1, k2t, b2,
                     block_h, block_w, block_b, interpret, edge=False):
    Hp, Wp, C, B = xt.shape          # already padded: Hp = H + 2
    H, W = Hp - 2, Wp - 2
    Ht, Wt, Bt = block_h, block_w, block_b

    grid = (B // Bt, H // Ht, W // Wt)
    out_spec = pl.BlockSpec(
        (4 * Ht, 4 * Wt, Bt), lambda ib, ih, iw: (ih, iw, ib),
        memory_space=pltpu.VMEM)

    kspec = pl.BlockSpec((4, 4, C, 1), lambda ib, ih, iw: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, C, 1), lambda ib, ih, iw: (0, 0, 0),
                         memory_space=pltpu.VMEM)

    idx_t, score_t = pl.pallas_call(
        _make_kernel(Ht, Wt, C, xt.dtype, edge),
        grid=grid,
        in_specs=[
            kspec, bspec, kspec, bspec,
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((4 * H, 4 * W, B), jnp.int32),
            jax.ShapeDtypeStruct((4 * H, 4 * W, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Ht + 2, Wt + 2, C, Bt), xt.dtype),
            pltpu.VMEM((2 * Ht + 2, 2 * Wt + 2, C, Bt), xt.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(k1t[..., None], b1[None, :, None],
      k2t[..., None], b2[None, :, None], xt)
    return idx_t, score_t


def upsample4x_argmax_score(
    x: jnp.ndarray,            # (B, H, W, C) quarter-res logits
    kernel1: jnp.ndarray,      # (3, 3, 1, C) f32 stage-1 depthwise
    bias1,                     # (C,) f32 or None
    kernel2: jnp.ndarray,      # (3, 3, 1, C) f32 stage-2 depthwise
    bias2,                     # (C,) f32 or None
    *,
    block_h: int = 4,
    block_w: int = 16,
    interpret: bool = False,
):
    """(first-argmax idx int32, max-softmax score f32), both
    (B, 4H, 4W), of x upsampled by TWO learned-3x3-zeropad x2 stages --
    with neither the 2x nor the 4x logits tensor ever in HBM.

    Requires B % 128 == 0 (or == 8 in interpret mode),
    H % block_h == 0, W % block_w == 0; callers fall back to the
    conv + 2x-finisher path otherwise."""
    from .semantic_finisher import fused_upsample_kernel

    B, H, W, C = x.shape
    block_b = 128 if B % 128 == 0 else 8
    assert B % block_b == 0 and H % block_h == 0 and W % block_w == 0, \
        (x.shape, block_h, block_w, block_b)

    if bias1 is None:
        bias1 = jnp.zeros((C,), jnp.float32)
    if bias2 is None:
        bias2 = jnp.zeros((C,), jnp.float32)
    k1t = fused_upsample_kernel(kernel1).astype(x.dtype)
    k2t = fused_upsample_kernel(kernel2).astype(x.dtype)
    b1 = bias1.astype(x.dtype)
    b2 = bias2.astype(x.dtype)

    xt = jnp.transpose(x, (1, 2, 3, 0))       # bitcast under batch-minor
    xt = jnp.pad(xt, ((1, 1), (1, 1), (0, 0), (0, 0)))

    idx_t, score_t = _finisher4x_call(
        xt, k1t, b1, k2t, b2, block_h, block_w, block_b, interpret)

    return (jnp.transpose(idx_t, (2, 0, 1)),
            jnp.transpose(score_t, (2, 0, 1)))


def finish_deferred_semantic2(deferred, *, interpret: bool = False):
    """(idx int32, score f32), both (B, 4H, 4W), for a semantic head's
    DeferredUpsampling2 output. Dispatches to the fused 4x Pallas
    kernel when the backend and shapes allow; otherwise (CPU tests,
    odd shapes) falls back to `apply_deferred_upsampling_exact` +
    reduce -- the kernel's exact phase math in plain XLA elementwise
    ops (NOT the conv twin: reduced-precision convs would break
    within-dict consistency with the on-demand dense keys)."""
    from ...models.upsampling import apply_deferred_upsampling_exact
    from .semantic_reduce import semantic_score_idx
    x = deferred.x
    B, H, W, C = x.shape
    b1 = deferred.bias1
    b2 = deferred.bias2
    if b1 is None:
        b1 = jnp.zeros((C,), jnp.float32)
    if b2 is None:
        b2 = jnp.zeros((C,), jnp.float32)
    use_pallas = interpret or (
        jax.default_backend() == 'tpu'
        and B % 128 == 0 and H % 4 == 0 and W % 16 == 0
        and C % 8 == 0)    # sublane-aligned class axis (DMA tiling)
    if use_pallas:
        return upsample4x_argmax_score(
            x, deferred.kernel1, b1, deferred.kernel2, b2,
            interpret=interpret)
    score, idx = semantic_score_idx(
        apply_deferred_upsampling_exact(deferred).astype(jnp.float32))
    return idx, score


def upsample4x_argmax_score_reference(x, kernel1, bias1, kernel2, bias2,
                                      dtype=None):
    """XLA twin (two depthwise convs + reduces) for exactness tests and
    as the fallback path."""
    from ...models.upsampling import learned_zeropad_2x
    from .semantic_reduce import semantic_score_idx
    dt = dtype or x.dtype
    y = learned_zeropad_2x(x, kernel1, bias1, dt)
    y = learned_zeropad_2x(y, kernel2, bias2, dt)
    score, idx = semantic_score_idx(y)
    return idx, score


def upsample4x_bilinear_argmax_score(
    x: jnp.ndarray,            # (B, H, W, C) quarter-res logits
    *,
    block_h: int = 4,
    block_w: int = 16,
    interpret: bool = False,
):
    """(first-argmax idx int32, max-softmax score f32), both
    (B, 4H, 4W), of x upsampled by TWO half-pixel bilinear x2 stages
    (the MLP-decoder prediction ladder) -- fullres logits never in HBM.

    Bilinear x2 with clamped edges == nearest-x2 + replication-padded
    depthwise 3x3 with the fixed bilinear kernel, so this reuses the
    4x finisher with edge-padded input and no border masks
    (models/upsampling.py DeferredBilinear2). Same alignment
    constraints as upsample4x_argmax_score."""
    import numpy as np
    from ...models.upsampling import _BILINEAR_KERNEL
    from .semantic_finisher import fused_upsample_kernel

    B, H, W, C = x.shape
    block_b = 128 if B % 128 == 0 else 8
    assert B % block_b == 0 and H % block_h == 0 and W % block_w == 0, \
        (x.shape, block_h, block_w, block_b)

    kernel = jnp.broadcast_to(
        jnp.asarray(np.asarray(_BILINEAR_KERNEL))[:, :, None, None],
        (3, 3, 1, C)).astype(jnp.float32)
    kt = fused_upsample_kernel(kernel).astype(x.dtype)
    zb = jnp.zeros((C,), x.dtype)

    xt = jnp.transpose(x, (1, 2, 3, 0))       # bitcast under batch-minor
    xt = jnp.pad(xt, ((1, 1), (1, 1), (0, 0), (0, 0)), mode='edge')

    idx_t, score_t = _finisher4x_call(
        xt, kt, zb, kt, zb, block_h, block_w, block_b, interpret,
        edge=True)
    return (jnp.transpose(idx_t, (2, 0, 1)),
            jnp.transpose(score_t, (2, 0, 1)))


def finish_deferred_bilinear2(deferred, *, interpret: bool = False):
    """(idx int32, score f32), both (B, 4H, 4W), for a semantic head's
    DeferredBilinear2 output. Fused Pallas kernel when the backend and
    shapes allow; otherwise the kernel-exact phase twin
    (`apply_deferred_upsampling_exact`) + reduce, keeping idx
    consistent with the on-demand dense keys."""
    from ...models.upsampling import apply_deferred_upsampling_exact
    from .semantic_reduce import semantic_score_idx
    x = deferred.x
    B, H, W, C = x.shape
    use_pallas = interpret or (
        jax.default_backend() == 'tpu'
        and B % 128 == 0 and H % 4 == 0 and W % 16 == 0
        and C % 8 == 0)    # sublane-aligned class axis (DMA tiling)
    if use_pallas:
        return upsample4x_bilinear_argmax_score(x, interpret=interpret)
    score, idx = semantic_score_idx(
        apply_deferred_upsampling_exact(deferred).astype(jnp.float32))
    return idx, score


def upsample4x_bilinear_reference(x):
    """XLA twin (two half-pixel bilinear resizes + reduces)."""
    from ...models.upsampling import resize_bilinear
    from .semantic_reduce import semantic_score_idx
    B, H, W, C = x.shape
    y = resize_bilinear(x, 2 * H, 2 * W)
    y = resize_bilinear(y, 4 * H, 4 * W)
    score, idx = semantic_score_idx(y)
    return idx, score
