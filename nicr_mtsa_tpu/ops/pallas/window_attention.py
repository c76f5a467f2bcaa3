"""Fused Swin window attention: per-window QK^T + bias + shift-mask +
softmax + PV in ONE Pallas pass -- the (Bw, h, N, N) attention logits
never touch HBM.

The XLA path (models/backbones/swin.py WindowAttention) materializes
the logits tensor four times over (write, softmax read+write, PV read);
at EMSAFormer serving shapes (B64, 480x640, stage 1: 19200 windows x
4 heads x 64 x 64) that is ~2.5 GB of HBM traffic per block in bf16 --
the measured EMSAFormer bottleneck (PERF.md). Reference semantics:
model/backbone/swin.py:196-207 (torchvision shifted_window_attention).

Kernel design (TPU-first):

- **Window pairing.** Two 64-token windows stack into one (128, d)
  query/key block so every MXU op has a full 128-wide output
  (a single 64-token window would run the MXU at quarter width). The
  cross-window logit blocks are killed with a -1e9 additive mask; the
  2x FLOP overspend buys 4x MXU utilization.
- **Key-major logits.** Per head, the kernel computes
  L^T[m, n] = sum_d k2[m, d] q2[n, d] via `dot_general` so the softmax
  reduction over keys m runs along SUBLANES while queries n ride the
  128 lanes -- no transposes anywhere in the kernel.
- **Shift masks as 4 patterns.** Shifted-window masks are nonzero only
  for windows in the last window-row / window-column, so there are at
  most 4 distinct (N, N) patterns (interior, last-col, last-row,
  corner). The kernel holds the 16 possible pattern-PAIR matrices
  (4 x 4, each (2N, 2N) incl. the cross-window -1e9 blocks) in VMEM
  and selects per pair with pure scalar index arithmetic -- streaming
  per-window (nW, N, N) masks from HBM would cost as much traffic as
  the logits the kernel eliminates.
- **Relative-position bias** is pre-expanded outside to a
  block-diagonal (h, 2N, 2N) constant (one per layer) and added in
  f32 together with the pattern mask.

Numerics: logits and softmax are f32 end-to-end (the MXU accumulates
bf16 products exactly into f32); probabilities are rounded to the
input dtype for the PV matmul like the XLA path. Exact-equality tests
run the f32 path; bf16 agrees with the XLA path to ~1e-2 on outputs
(the XLA path rounds logits to bf16 before softmax, this kernel does
not -- the kernel is the *more* precise of the two).
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_NEG = -1e9


def _pattern_id_fn(nW: int, nWw: int, nWh: int):
    def pattern_id(g):
        # window g's shift-mask pattern from its position in the
        # image window grid: 2*last_row + last_col
        loc = jax.lax.rem(g, nW)
        r = loc // nWw
        c = jax.lax.rem(loc, nWw)
        last_r = (r == nWh - 1).astype(jnp.int32)
        last_c = (c == nWw - 1).astype(jnp.int32)
        return 2 * last_r + last_c
    return pattern_id


def _make_fwd_kernel(T: int, N: int, C: int, h: int, n_patterns: int,
                     nW: int, nWw: int, nWh: int, out_dtype):
    d = C // h
    N2 = 2 * N
    pattern_id = _pattern_id_fn(nW, nWw, nWh)

    def kernel(q_ref, k_ref, v_ref, bias_ref, pmask_ref, o_ref, l_ref):
        t = pl.program_id(0)

        def pair(p, _):
            q2 = q_ref[pl.ds(2 * p, 2)].reshape(N2, C)
            k2 = k_ref[pl.ds(2 * p, 2)].reshape(N2, C)
            v2 = v_ref[pl.ds(2 * p, 2)].reshape(N2, C)

            if n_patterns == 1:
                pm = pmask_ref[0]
            else:
                g0 = t * T + 2 * p
                pid = pattern_id(g0) * 4 + pattern_id(g0 + 1)
                pm = pmask_ref[pid]

            pieces = []
            for j in range(h):
                sl = slice(j * d, (j + 1) * d)
                # L^T (keys m on sublanes, queries n on lanes), f32
                lt = jax.lax.dot_general(
                    k2[:, sl], q2[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                lt = lt + bias_ref[j] + pm
                mx = jnp.max(lt, axis=0, keepdims=True)
                e = jnp.exp(lt - mx)
                s = jnp.sum(e, axis=0, keepdims=True)
                prob = (e / s).astype(q2.dtype)
                # logsumexp residual for the flash backward; (1, 2N)
                # keepdims store (Mosaic dislikes 1D vector stores).
                # lse is laid out (pairs, h, 2N): the blocked pair axis
                # must be the LEADING dim -- Mosaic requires the last
                # two block dims to be (8, 128)-aligned or full-size,
                # and T//2 can be 2 or 4
                l_ref[pl.ds(p, 1), j] = mx + jnp.log(s)
                # out (n, d) = sum_m prob[m, n] v2[m, d]
                pieces.append(jax.lax.dot_general(
                    prob, v2[:, sl], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            o = jnp.concatenate(pieces, axis=1).astype(out_dtype)
            o_ref[pl.ds(2 * p, 2)] = o.reshape(2, N, C)
            return 0

        jax.lax.fori_loop(0, T // 2, pair, 0)

    return kernel


def _make_fwd_kernel_qkv(T: int, N: int, C: int, h: int,
                         n_patterns: int, nW: int, nWw: int, nWh: int,
                         out_dtype, v2: bool, scale_const: float):
    """Forward-only kernel over the FUSED (T, N, 3C) qkv tensor: the
    q/k/v column slicing and (for v2) the per-head L2 normalization +
    logit scale run in VMEM, so the qkv GEMM feeds the kernel directly
    -- no sliced/normalized q/k/v tensors (and none of their layout
    copies) ever exist in HBM. Serving only: no VJP."""
    d = C // h
    N2 = 2 * N
    pattern_id = _pattern_id_fn(nW, nWw, nWh)

    def kernel(qkv_ref, bias_ref, pmask_ref, scale_ref, o_ref):
        t = pl.program_id(0)

        def pair(p, _):
            blk = qkv_ref[pl.ds(2 * p, 2)].reshape(N2, 3 * C)

            if n_patterns == 1:
                pm = pmask_ref[0]
            else:
                g0 = t * T + 2 * p
                pid = pattern_id(g0) * 4 + pattern_id(g0 + 1)
                pm = pmask_ref[pid]

            pieces = []
            for j in range(h):
                qs = blk[:, j * d:(j + 1) * d]
                ks = blk[:, C + j * d:C + (j + 1) * d]
                vs = blk[:, 2 * C + j * d:2 * C + (j + 1) * d]
                if v2:
                    # cosine attention: normalize q/k per head in f32,
                    # learned per-head logit scale on the logits
                    qf = qs.astype(jnp.float32)
                    kf = ks.astype(jnp.float32)
                    qn = jnp.sqrt(jnp.sum(qf * qf, axis=1,
                                          keepdims=True))
                    kn = jnp.sqrt(jnp.sum(kf * kf, axis=1,
                                          keepdims=True))
                    qf = (qf / jnp.maximum(qn, 1e-6)).astype(qs.dtype)
                    kf = (kf / jnp.maximum(kn, 1e-6)).astype(ks.dtype)
                    lt = jax.lax.dot_general(
                        kf, qf, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    lt = lt * scale_ref[0, j]
                else:
                    lt = jax.lax.dot_general(
                        ks, qs, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    lt = lt * scale_const
                lt = lt + bias_ref[j] + pm
                mx = jnp.max(lt, axis=0, keepdims=True)
                e = jnp.exp(lt - mx)
                s = jnp.sum(e, axis=0, keepdims=True)
                prob = (e / s).astype(blk.dtype)
                pieces.append(jax.lax.dot_general(
                    prob, vs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            o = jnp.concatenate(pieces, axis=1).astype(out_dtype)
            o_ref[pl.ds(2 * p, 2)] = o.reshape(2, N, C)
            return 0

        jax.lax.fori_loop(0, T // 2, pair, 0)

    return kernel


def _make_fwd_kernel_block(T: int, N: int, C: int, h: int,
                           n_patterns: int, nW: int, nWw: int, nWh: int,
                           out_dtype, v2: bool, scale_const: float):
    """Whole attention sub-block over the WINDOWED LN output x:
    qkv GEMM + (v2) per-head cosine normalization + logit scale +
    QK^T + bias + shift-mask + softmax + PV + output projection, all
    per window pair in VMEM. The only large-tensor boundaries left
    are the window partition in and the row-major output -- every
    q/k/v/qkv/proj-side relayout copy XLA inserted around the
    narrower kernels disappears (PERF.md EMSAFormer roofline: those
    copies measured 116 ms x192 at B128 vs 73.8 ms of attention).
    Serving only: no VJP."""
    d = C // h
    N2 = 2 * N
    pattern_id = _pattern_id_fn(nW, nWw, nWh)

    def kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
               bias_ref, pmask_ref, scale_ref, o_ref):
        t = pl.program_id(0)

        def pair(p, _):
            x2 = x_ref[pl.ds(2 * p, 2)].reshape(N2, C)
            # qkv GEMM: f32 MXU accumulation, rounded to the compute
            # dtype before the bias add (XLA's jnp.dot + bias order)
            blk = jax.lax.dot_general(
                x2, wqkv_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            blk = blk.astype(x2.dtype) + bqkv_ref[...]

            if n_patterns == 1:
                pm = pmask_ref[0]
            else:
                g0 = t * T + 2 * p
                pid = pattern_id(g0) * 4 + pattern_id(g0 + 1)
                pm = pmask_ref[pid]

            pieces = []
            for j in range(h):
                qs = blk[:, j * d:(j + 1) * d]
                ks = blk[:, C + j * d:C + (j + 1) * d]
                vs = blk[:, 2 * C + j * d:2 * C + (j + 1) * d]
                if v2:
                    qf = qs.astype(jnp.float32)
                    kf = ks.astype(jnp.float32)
                    qn = jnp.sqrt(jnp.sum(qf * qf, axis=1,
                                          keepdims=True))
                    kn = jnp.sqrt(jnp.sum(kf * kf, axis=1,
                                          keepdims=True))
                    qf = (qf / jnp.maximum(qn, 1e-6)).astype(qs.dtype)
                    kf = (kf / jnp.maximum(kn, 1e-6)).astype(ks.dtype)
                    lt = jax.lax.dot_general(
                        kf, qf, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    lt = lt * scale_ref[0, j]
                else:
                    lt = jax.lax.dot_general(
                        ks, qs, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    lt = lt * scale_const
                lt = lt + bias_ref[j] + pm
                mx = jnp.max(lt, axis=0, keepdims=True)
                e = jnp.exp(lt - mx)
                s = jnp.sum(e, axis=0, keepdims=True)
                prob = (e / s).astype(blk.dtype)
                pieces.append(jax.lax.dot_general(
                    prob, vs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            attn = jnp.concatenate(pieces, axis=1).astype(x2.dtype)
            # output projection in VMEM (weights resident)
            o = jax.lax.dot_general(
                attn, wproj_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = o.astype(out_dtype) + bproj_ref[...]
            o_ref[pl.ds(2 * p, 2)] = o.reshape(2, N, C)
            return 0

        jax.lax.fori_loop(0, T // 2, pair, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=('n_heads', 'grid_hw', 'tile_windows', 'v2',
                     'scale_const', 'interpret'))
def _fwd_call_block(x, wqkv, bqkv, wproj, bproj, bias_pair,
                    pattern_pairs, scale_vec, n_heads, grid_hw,
                    tile_windows, v2, scale_const, interpret):
    Bw, N, C = x.shape
    nWh, nWw = grid_hw
    T = tile_windows
    h = n_heads

    io = pl.BlockSpec((T, N, C), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    n_patterns = 1 if pattern_pairs.shape[0] == 1 else 4
    return pl.pallas_call(
        _make_fwd_kernel_block(T, N, C, h, n_patterns,
                               nWh * nWw, nWw, nWh, x.dtype, v2,
                               scale_const),
        grid=(Bw // T,),
        in_specs=[io, const(wqkv.shape), const(bqkv.shape),
                  const(wproj.shape), const(bproj.shape),
                  const(bias_pair.shape), const(pattern_pairs.shape),
                  const(scale_vec.shape)],
        out_specs=io,
        out_shape=jax.ShapeDtypeStruct((Bw, N, C), x.dtype),
        interpret=interpret,
    )(x, wqkv, bqkv, wproj, bproj, bias_pair, pattern_pairs, scale_vec)


def fused_window_attention_block(
    x: jnp.ndarray,            # (Bw, N, C) windowed LN output
    wqkv: jnp.ndarray,         # (C, 3C)
    bqkv: jnp.ndarray,         # (3C,) (v2 k-third already zeroed)
    wproj: jnp.ndarray,        # (C, C)
    bproj: jnp.ndarray,        # (C,)
    bias: jnp.ndarray,         # (h, N, N) additive, query-major
    n_heads: int,
    grid_hw: Tuple[int, int],
    shift_masks: Optional[np.ndarray] = None,
    v2_scale: Optional[jnp.ndarray] = None,   # (h,) f32 logit scale
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Serving-only whole-sub-block kernel (see _make_fwd_kernel_block).
    Returns (Bw, N, C) = proj(attention(qkv(x))), row-major. Numerics:
    qkv/proj GEMMs accumulate f32 on the MXU and round to the compute
    dtype at the same points as the XLA path; v2 normalization runs
    f32 in-kernel (the XLA path normalizes in the compute dtype), so
    bf16 outputs differ within rounding noise; f32 agrees to ~1e-6."""
    Bw, N, C = x.shape
    Np = PADDED_TOKENS
    T = pick_tile_windows(Bw, C)
    assert T and N <= Np, (Bw, N, C)

    n_valid = N if N < Np else None
    if N < Np:
        x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, Np - N), (0, Np - N)))

    d = C // n_heads
    v2 = v2_scale is not None
    scale_vec = (v2_scale.astype(jnp.float32).reshape(1, n_heads)
                 if v2 else jnp.zeros((1, n_heads), jnp.float32))
    bias_pair = build_bias_pair(bias)
    patterns = jnp.asarray(
        build_pattern_pairs(Np, shift_masks, grid_hw, n_valid=n_valid))
    out = _fwd_call_block(
        x, wqkv.astype(x.dtype), bqkv.astype(x.dtype).reshape(1, -1),
        wproj.astype(x.dtype), bproj.astype(x.dtype).reshape(1, -1),
        bias_pair, patterns, scale_vec, n_heads, tuple(grid_hw), T,
        v2, float(d) ** -0.5, interpret)
    return out[:, :N] if N < Np else out


def supports_fused_window_attention_block(Bw: int, N: int, C: int,
                                          n_heads: int) -> bool:
    """Adds a VMEM-residency bound for the weights on top of the base
    shape gate: wqkv (C, 3C) + wproj (C, C) + the (16, 2N, 2N) f32
    pattern table must fit comfortably (stage C=1024 weights alone are
    8 MB bf16 -- left on the narrower kernels)."""
    if not supports_fused_window_attention(Bw, N, C, n_heads):
        return False
    # C=1024: weights 8.4 MB + (h=32) bias pair 2.1 MB + pattern
    # table + tiles ~ 12.5 MB -- fits VMEM with the T<=4 tile cap
    weight_bytes = (C * 3 * C + C * C) * 2
    return weight_bytes <= 9 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=('n_heads', 'grid_hw', 'tile_windows', 'v2',
                     'scale_const', 'interpret'))
def _fwd_call_qkv(qkv, bias_pair, pattern_pairs, scale_vec, n_heads,
                  grid_hw, tile_windows, v2, scale_const, interpret):
    Bw, N, C3 = qkv.shape
    C = C3 // 3
    nWh, nWw = grid_hw
    T = tile_windows
    h = n_heads

    io3 = pl.BlockSpec((T, N, C3), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    io = pl.BlockSpec((T, N, C), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    n_patterns = 1 if pattern_pairs.shape[0] == 1 else 4
    return pl.pallas_call(
        _make_fwd_kernel_qkv(T, N, C, h, n_patterns,
                             nWh * nWw, nWw, nWh, qkv.dtype, v2,
                             scale_const),
        grid=(Bw // T,),
        in_specs=[io3, const(bias_pair.shape),
                  const(pattern_pairs.shape),
                  const(scale_vec.shape)],
        out_specs=io,
        out_shape=jax.ShapeDtypeStruct((Bw, N, C), qkv.dtype),
        interpret=interpret,
    )(qkv, bias_pair, pattern_pairs, scale_vec)


def fused_window_attention_qkv(
    qkv: jnp.ndarray,          # (Bw, N, 3C) fused projection output
    bias: jnp.ndarray,         # (h, N, N) additive, query-major
    n_heads: int,
    grid_hw: Tuple[int, int],
    shift_masks: Optional[np.ndarray] = None,
    v2_scale: Optional[jnp.ndarray] = None,   # (h,) f32 logit scale
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Serving-only fused attention over the raw qkv projection:
    slicing, v2 cosine normalization, and the logit scale all happen
    in VMEM (see _make_fwd_kernel_qkv). Not differentiable -- training
    uses `fused_window_attention` (custom VJP). Numerics: v2
    normalization runs in f32 inside the kernel where the XLA/fused
    paths normalize in the compute dtype, so bf16 outputs differ
    within rounding noise (~1e-2); f32 agrees to ~1e-6."""
    Bw, N, C3 = qkv.shape
    C = C3 // 3
    Np = PADDED_TOKENS
    T = pick_tile_windows(Bw, C)
    assert T and N <= Np, (Bw, N, C)

    n_valid = N if N < Np else None
    if N < Np:
        qkv = jnp.pad(qkv, ((0, 0), (0, Np - N), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, Np - N), (0, Np - N)))

    d = C // n_heads
    v2 = v2_scale is not None
    scale_vec = (v2_scale.astype(jnp.float32).reshape(1, n_heads)
                 if v2 else jnp.zeros((1, n_heads), jnp.float32))
    bias_pair = build_bias_pair(bias)
    patterns = jnp.asarray(
        build_pattern_pairs(Np, shift_masks, grid_hw, n_valid=n_valid))
    out = _fwd_call_qkv(qkv, bias_pair, patterns, scale_vec, n_heads,
                        tuple(grid_hw), T, v2,
                        float(d) ** -0.5, interpret)
    return out[:, :N] if N < Np else out


def _make_bwd_kernel(T: int, N: int, C: int, h: int, n_patterns: int,
                     nW: int, nWw: int, nWh: int, in_dtype):
    """Flash-style backward: recompute the pair/head logits from the
    saved logsumexp, then dV = P dO, dS = P (dP - delta),
    dQ = dS^T K, dK = dS Q; the bias gradient accumulates across all
    grid steps into the revisited (h, 2N, 2N) output block."""
    d = C // h
    N2 = 2 * N
    pattern_id = _pattern_id_fn(nW, nWw, nWh)

    def kernel(q_ref, k_ref, v_ref, do_ref, l_ref, bias_ref, pmask_ref,
               dq_ref, dk_ref, dv_ref, dbias_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

        def pair(p, _):
            q2 = q_ref[pl.ds(2 * p, 2)].reshape(N2, C)
            k2 = k_ref[pl.ds(2 * p, 2)].reshape(N2, C)
            v2 = v_ref[pl.ds(2 * p, 2)].reshape(N2, C)
            do2 = do_ref[pl.ds(2 * p, 2)].reshape(N2, C) \
                .astype(jnp.float32)

            if n_patterns == 1:
                pm = pmask_ref[0]
            else:
                g0 = t * T + 2 * p
                pid = pattern_id(g0) * 4 + pattern_id(g0 + 1)
                pm = pmask_ref[pid]

            dqs, dks, dvs = [], [], []
            for j in range(h):
                sl = slice(j * d, (j + 1) * d)
                lt = jax.lax.dot_general(
                    k2[:, sl], q2[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                lt = lt + bias_ref[j] + pm
                prob32 = jnp.exp(lt - l_ref[pl.ds(p, 1), j])  # (m, n)
                prob = prob32.astype(in_dtype)
                doj = do2[:, sl].astype(in_dtype)
                # dV (m, d) = sum_n P[m, n] dO[n, d]
                dvs.append(jax.lax.dot_general(
                    prob, doj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                # dP (m, n) = sum_d V[m, d] dO[n, d]
                dp = jax.lax.dot_general(
                    v2[:, sl], doj, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                delta = jnp.sum(prob32 * dp, axis=0, keepdims=True)
                ds = prob32 * (dp - delta)                   # (m, n) f32
                dbias_ref[j] = dbias_ref[j] + ds
                dsc = ds.astype(in_dtype)
                # dQ (n, d) = sum_m dS[m, n] K[m, d]
                dqs.append(jax.lax.dot_general(
                    dsc, k2[:, sl], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                # dK (m, d) = sum_n dS[m, n] Q[n, d]
                dks.append(jax.lax.dot_general(
                    dsc, q2[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))

            def put(ref, pieces):
                val = jnp.concatenate(pieces, axis=1).astype(in_dtype)
                ref[pl.ds(2 * p, 2)] = val.reshape(2, N, C)

            put(dq_ref, dqs)
            put(dk_ref, dks)
            put(dv_ref, dvs)
            return 0

        jax.lax.fori_loop(0, T // 2, pair, 0)

    return kernel


def _specs(T, N, C, bias_shape, pmask_shape, n_pairs_per_tile, h):
    io = pl.BlockSpec((T, N, C), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    lse = pl.BlockSpec((n_pairs_per_tile, h, 2 * N),
                       lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return io, const, lse


@functools.partial(
    jax.jit,
    static_argnames=('n_heads', 'grid_hw', 'tile_windows', 'interpret'))
def _fwd_call(q, k, v, bias_pair, pattern_pairs, n_heads,
              grid_hw, tile_windows, interpret):
    Bw, N, C = q.shape
    nWh, nWw = grid_hw
    T = tile_windows
    h = n_heads

    io, const, lse = _specs(T, N, C, bias_pair.shape,
                            pattern_pairs.shape, T // 2, h)
    n_patterns = 1 if pattern_pairs.shape[0] == 1 else 4
    return pl.pallas_call(
        _make_fwd_kernel(T, N, C, h, n_patterns,
                         nWh * nWw, nWw, nWh, q.dtype),
        grid=(Bw // T,),
        in_specs=[io, io, io, const(bias_pair.shape),
                  const(pattern_pairs.shape)],
        out_specs=(io, lse),
        out_shape=(jax.ShapeDtypeStruct((Bw, N, C), q.dtype),
                   jax.ShapeDtypeStruct((Bw // 2, h, 2 * N),
                                        jnp.float32)),
        interpret=interpret,
    )(q, k, v, bias_pair, pattern_pairs)


@functools.partial(
    jax.jit,
    static_argnames=('n_heads', 'grid_hw', 'tile_windows', 'interpret'))
def _bwd_call(q, k, v, do, lse_arr, bias_pair, pattern_pairs, n_heads,
              grid_hw, tile_windows, interpret):
    Bw, N, C = q.shape
    nWh, nWw = grid_hw
    T = tile_windows
    h = n_heads

    io, const, lse = _specs(T, N, C, bias_pair.shape,
                            pattern_pairs.shape, T // 2, h)
    bias_out = pl.BlockSpec(bias_pair.shape,
                            lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    n_patterns = 1 if pattern_pairs.shape[0] == 1 else 4
    return pl.pallas_call(
        _make_bwd_kernel(T, N, C, h, n_patterns,
                         nWh * nWw, nWw, nWh, q.dtype),
        grid=(Bw // T,),
        in_specs=[io, io, io, io, lse, const(bias_pair.shape),
                  const(pattern_pairs.shape)],
        out_specs=(io, io, io, bias_out),
        out_shape=(jax.ShapeDtypeStruct((Bw, N, C), q.dtype),
                   jax.ShapeDtypeStruct((Bw, N, C), q.dtype),
                   jax.ShapeDtypeStruct((Bw, N, C), q.dtype),
                   jax.ShapeDtypeStruct(bias_pair.shape, jnp.float32)),
        interpret=interpret,
    )(q, k, v, do, lse_arr, bias_pair, pattern_pairs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _attention_core(q, k, v, bias_pair, pattern_pairs, n_heads,
                    grid_hw, tile_windows, interpret):
    out, _ = _fwd_call(q, k, v, bias_pair, pattern_pairs, n_heads,
                       grid_hw, tile_windows, interpret)
    return out


def _attention_core_fwd(q, k, v, bias_pair, pattern_pairs, n_heads,
                        grid_hw, tile_windows, interpret):
    out, lse_arr = _fwd_call(q, k, v, bias_pair, pattern_pairs, n_heads,
                             grid_hw, tile_windows, interpret)
    return out, (q, k, v, bias_pair, pattern_pairs, lse_arr)


def _attention_core_bwd(n_heads, grid_hw, tile_windows, interpret,
                        res, dout):
    q, k, v, bias_pair, pattern_pairs, lse_arr = res
    dq, dk, dv, dbias = _bwd_call(
        q, k, v, dout, lse_arr, bias_pair, pattern_pairs, n_heads,
        grid_hw, tile_windows, interpret)
    return dq, dk, dv, dbias, jnp.zeros_like(pattern_pairs)


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


def _attention_call(q, k, v, bias_pair, pattern_pairs, n_heads,
                    grid_hw, tile_windows, interpret):
    return _attention_core(q, k, v, bias_pair, pattern_pairs, n_heads,
                           grid_hw, tile_windows, interpret)


def build_bias_pair(bias: jnp.ndarray) -> jnp.ndarray:
    """(h, N, N) query-major additive bias -> block-diagonal key-major
    (h, 2N, 2N) for the window-pair kernel (off-diagonal zeros; the
    cross-window kill lives in the pattern masks)."""
    h, N, _ = bias.shape
    bt = jnp.swapaxes(bias, 1, 2).astype(jnp.float32)      # key-major
    out = jnp.zeros((h, 2 * N, 2 * N), jnp.float32)
    out = out.at[:, :N, :N].set(bt)
    return out.at[:, N:, N:].set(bt)


def build_pattern_pairs(
    N: int,
    shift_masks: Optional[np.ndarray],
    grid_hw: Tuple[int, int],
    n_valid: Optional[int] = None,
) -> np.ndarray:
    """(P*P, 2N, 2N) f32 pattern-pair mask table.

    shift_masks: the dense (nV, N_valid, N_valid) query-major additive
    mask from `_shift_attn_mask`, or None when the block is unshifted.
    Patterns are extracted at the four representative grid positions;
    degenerate grids (single window row/column) collapse naturally
    because the representatives coincide.

    n_valid < N marks token-padded windows (v1's 49-token windows pad
    to the sublane/lane-aligned 64): pad KEYS get -1e9 so no real
    query attends to them; pad query rows still produce finite rows
    (their outputs are sliced away by the caller).
    """
    n_valid = N if n_valid is None else n_valid

    def window_block(pattern):
        # key-major (m, n): rows are keys, columns are queries
        m = np.full((N, N), _BIG_NEG, np.float32)
        m[:n_valid, :n_valid] = pattern
        m[n_valid:, :] = _BIG_NEG       # pad keys: invisible to everyone
        m[:n_valid, n_valid:] = 0.0     # pad queries: finite columns
        return m

    zero = np.zeros((n_valid, n_valid), np.float32)
    if shift_masks is None:
        table = np.full((2 * N, 2 * N), _BIG_NEG, np.float32)
        table[:N, :N] = window_block(zero)
        table[N:, N:] = window_block(zero)
        return table[None]

    nWh, nWw = grid_hw
    reps = {}
    for last_r in (0, 1):
        for last_c in (0, 1):
            r = nWh - 1 if last_r else 0
            c = nWw - 1 if last_c else 0
            # key-major single-window pattern
            reps[2 * last_r + last_c] = window_block(
                shift_masks[r * nWw + c].T.astype(np.float32))

    table = np.full((16, 2 * N, 2 * N), _BIG_NEG, np.float32)
    for i0 in range(4):
        for i1 in range(4):
            m = table[i0 * 4 + i1]
            m[:N, :N] = reps[i0]
            m[N:, N:] = reps[i1]
    return table


def pick_tile_windows(Bw: int, C: int) -> int:
    """Largest even divisor of Bw within a VMEM-informed cap."""
    cap = 16 if C <= 256 else (8 if C <= 512 else 4)
    t = min(cap, Bw)
    t -= t % 2
    while t > 2 and Bw % t:
        t -= 2
    return t if t >= 2 and Bw % t == 0 else 0


PADDED_TOKENS = 64      # kernel-native window length (sublane/lane tile)


def fused_window_attention(
    q: jnp.ndarray,            # (Bw, N, C), scale pre-folded into q
    k: jnp.ndarray,            # (Bw, N, C)
    v: jnp.ndarray,            # (Bw, N, C)
    bias: jnp.ndarray,         # (h, N, N) additive, query-major
    n_heads: int,
    grid_hw: Tuple[int, int],  # (nWh, nWw) image window grid
    shift_masks: Optional[np.ndarray] = None,   # (nW, N, N) or None
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused shifted-window attention; returns (Bw, N, C).

    N < 64 (v1's 7x7 = 49-token windows) pads the token axis to 64:
    pad keys are masked with -1e9 in the pattern table, pad query rows
    compute garbage that is sliced away here. The pad copy costs one
    extra qkv-sized round trip; the kernel still removes the ~4x
    larger logits-tensor HBM traffic. Callers gate on
    `supports_fused_window_attention` and fall back to the XLA einsum
    path otherwise."""
    Bw, N, C = q.shape
    Np = PADDED_TOKENS
    T = pick_tile_windows(Bw, C)
    assert T and N <= Np, (Bw, N, C)

    n_valid = N if N < Np else None
    if N < Np:
        pad = ((0, 0), (0, Np - N), (0, 0))
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
        bias = jnp.pad(bias, ((0, 0), (0, Np - N), (0, Np - N)))

    bias_pair = build_bias_pair(bias)
    patterns = jnp.asarray(
        build_pattern_pairs(Np, shift_masks, grid_hw, n_valid=n_valid))
    out = _attention_call(q, k, v, bias_pair, patterns, n_heads,
                          tuple(grid_hw), T, interpret)
    return out[:, :N] if N < Np else out


def supports_fused_window_attention(Bw: int, N: int, C: int,
                                    n_heads: int) -> bool:
    """Shape gate: windows of at most 64 tokens (v2 win-8 native; v1
    win-7 via token padding), sublane-aligned head dim, pairable
    window count."""
    if N > PADDED_TOKENS or C % n_heads:
        return False
    d = C // n_heads
    return d % 8 == 0 and Bw % 2 == 0 and pick_tile_windows(Bw, C) > 0
