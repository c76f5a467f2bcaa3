"""Upsampling modules: nearest / bilinear / learned-3x3[-zeropad].

Reference model/upsampling.py:24-115. `learned-3x3` mimics bilinear
interpolation: nearest x2 upscale followed by a depthwise 3x3 conv
initialized to the bilinear kernel (replication padding; the
`-zeropad` variant uses zero padding).

`Upsampling(defer=True)` (learned-3x3-zeropad only) declares the same
parameters but returns a `DeferredUpsampling` carrying (x, kernel,
bias) instead of applying the conv -- consumers can then fuse the
upsampling with their reduction (ops/pallas/semantic_finisher.py) or
apply it verbatim via `apply_deferred_upsampling`."""
import math
from typing import Any, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


class DeferredUpsampling(NamedTuple):
    """A learned-3x3-zeropad x2 upsampling captured as data: apply via
    `apply_deferred_upsampling` or fuse into a downstream kernel."""
    x: Any            # (B, H, W, C) pre-upsampling features
    kernel: Any       # (3, 3, 1, C) depthwise weights (f32 master)
    bias: Any         # (C,) or None


class DeferredUpsampling2(NamedTuple):
    """TWO chained learned-3x3-zeropad x2 upsamplings captured as data
    (the semantic head's full prediction-upsampling ladder at
    downsampling 4); fused by ops/pallas/semantic_finisher4x.py."""
    x: Any            # (B, H, W, C) quarter-res features
    kernel1: Any      # (3, 3, 1, C) stage-1 depthwise weights
    bias1: Any        # (C,) or None
    kernel2: Any      # (3, 3, 1, C) stage-2 depthwise weights
    bias2: Any        # (C,) or None


class DeferredBilinear2(NamedTuple):
    """TWO chained half-pixel bilinear x2 upsamplings captured as data
    (the MLP-decoder semantic head's prediction ladder, e.g.
    EMSAFormer). Bilinear x2 with clamped edges is EXACTLY nearest-x2 +
    replication-padded depthwise 3x3 with the fixed bilinear kernel
    (reference model/upsampling.py:24-62 'learned-3x3' at init), so the
    fused 4x finisher covers it by edge-padding the input and dropping
    the zero-pad border masks (every bilinear phase's taps sum to 1,
    hence duplicated edge rows reproduce the clamp)."""
    x: Any            # (B, H, W, C) quarter-res features


# every deferred-upsampling marker a postprocessor may receive in
# place of a dense output tensor
DEFERRED_TYPES = (DeferredUpsampling, DeferredUpsampling2,
                  DeferredBilinear2)


def _phase_combine(k, axis):
    """(..., 3, ...) kernel axis -> the 4 zeropad-x2 phase rows
    [K0, K0+K1, K1+K2, K2] (== flip(T @ K) for T = [[0,0,1],[0,1,1],
    [1,1,0],[1,0,0]]), built with exact adds -- an einsum with the 0/1
    T matrix routes through reduced-precision matmuls on some backends
    (oneDNN CPU, bf16-pass TPU) and corrupts the weights by ~1e-3."""
    k0, k1, k2 = (jax.lax.index_in_dim(k, i, axis, keepdims=True)
                  for i in range(3))
    return jnp.concatenate([k0, k0 + k1, k1 + k2, k2], axis=axis)


def fused_zeropad_2x_kernel(kernel):
    """3x3 depthwise kernel (3, 3, 1, C) -> the fused 4x4 kernel of
    the input-dilated one-conv form (== flip(T W T^T), exactness-tested
    against the two-op form in tests/test_models.py)."""
    kt = _phase_combine(kernel.astype(jnp.float32), 0)
    return _phase_combine(kt, 1)


def learned_zeropad_2x(x, kernel, bias, dtype):
    """The fused form of nearest-x2 + zero-padded depthwise 3x3: one
    input-dilated depthwise conv with a 4x4 kernel."""
    n = x.shape[-1]
    kt = fused_zeropad_2x_kernel(kernel)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kt.astype(dtype),
        (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=n)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def apply_deferred_upsampling(d, dtype=None):
    """Apply a DeferredUpsampling / DeferredUpsampling2 /
    DeferredBilinear2 verbatim (the exact twin of the fused finisher
    kernels; identical to the non-deferred model's output)."""
    if isinstance(d, DeferredBilinear2):
        x = d.x if dtype is None else d.x.astype(dtype)
        h, w = x.shape[-3], x.shape[-2]
        return resize_bilinear(resize_bilinear(x, 2 * h, 2 * w),
                               4 * h, 4 * w)
    if isinstance(d, DeferredUpsampling2):
        y = learned_zeropad_2x(d.x, d.kernel1, d.bias1,
                               dtype or d.x.dtype)
        return learned_zeropad_2x(y, d.kernel2, d.bias2,
                                  dtype or d.x.dtype)
    return learned_zeropad_2x(d.x, d.kernel, d.bias,
                              dtype or d.x.dtype)


def _ileave(a, b, axis: int):
    """Interleave two equal-shape arrays along `axis`:
    out[2k] = a[k], out[2k+1] = b[k]."""
    axis = axis % a.ndim
    y = jnp.stack([a, b], axis=axis + 1)
    return y.reshape(*a.shape[:axis], 2 * a.shape[axis],
                     *a.shape[axis + 1:])


def _zeropad_2x_phases_exact(xp, kt, bias, dtype):
    """One learned-zeropad x2 stage with the finisher kernel's EXACT
    numerics (ops/pallas/semantic_finisher.py `phase`): per output
    phase (py, px), f32 tap accumulation in the kernel's (a, b) term
    order over the padded input, round to `dtype`, add the f32 bias,
    round again. xp: (B, H+2, W+2, C) pre-padded input; kt: (4, 4, C)
    fused kernel already cast to the compute dtype. Returns
    (B, 2H, 2W, C) in `dtype`."""
    B, Hp, Wp, C = xp.shape
    H, W = Hp - 2, Wp - 2
    bias_f32 = (jnp.zeros((C,), jnp.float32) if bias is None
                else bias.astype(dtype).astype(jnp.float32))

    def phase(py, px):
        acc = None
        for a in (0, 1):
            for b in (0, 1):
                w = kt[2 * a + py, 2 * b + px].astype(jnp.float32)
                t = w * xp[:, py + a:py + a + H,
                           px + b:px + b + W].astype(jnp.float32)
                acc = t if acc is None else acc + t
        return (acc.astype(dtype).astype(jnp.float32)
                + bias_f32).astype(dtype)

    rows0 = _ileave(phase(0, 0), phase(0, 1), axis=2)
    rows1 = _ileave(phase(1, 0), phase(1, 1), axis=2)
    return _ileave(rows0, rows1, axis=1)


def _finisher4x_logits_exact(x, kernel1, bias1, kernel2, bias2, *,
                             edge: bool = False):
    """Dense (B, 4H, 4W, C) logits with the EXACT numerics of the 4x
    finisher kernel (ops/pallas/semantic_finisher4x.py): stage-1 phase
    accumulation (including the stage-2 halo ring), rounding to the
    compute dtype before and after each bias add, the zero-pad ring
    applied AFTER the stage-1 bias (zeropad chain), or edge-padded
    input with no ring masks (bilinear chain, edge=True)."""
    B, H, W, C = x.shape
    dt = x.dtype
    k1t = fused_zeropad_2x_kernel(kernel1)[:, :, 0, :].astype(dt)
    k2t = fused_zeropad_2x_kernel(kernel2)[:, :, 0, :].astype(dt)
    b1 = (jnp.zeros((C,), jnp.float32) if bias1 is None
          else bias1.astype(dt).astype(jnp.float32))
    b2 = (jnp.zeros((C,), jnp.float32) if bias2 is None
          else bias2.astype(dt).astype(jnp.float32))
    pad_mode = 'edge' if edge else 'constant'
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=pad_mode)

    # stage 1 incl. the stage-2 halo ring: phase (py, px) evaluated at
    # H+1 row / W+1 col positions (kernel `strip1` over q in
    # [0, 2H+2)); ring rows/cols are the out-of-range phase values
    # (edge chain) or get zeroed below (zeropad chain)
    def s1(py, px):
        acc = None
        for a in (0, 1):
            for b in (0, 1):
                w = k1t[2 * a + py, 2 * b + px].astype(jnp.float32)
                t = w * xp[:, a:a + H + 1,
                           b:b + W + 1].astype(jnp.float32)
                acc = t if acc is None else acc + t
        return acc

    # row q: q=0 -> (py=1)@0, q=2t+1 -> (py=0)@t, q=2t+2 -> (py=1)@t+1
    # => rows = interleave(py=1, py=0); cols: odd phase first
    def assemble(p11, p10, p01, p00):
        cols1 = _ileave(p11, p10, axis=2)     # (B, H+1, 2W+2, C)
        cols0 = _ileave(p01, p00, axis=2)
        return _ileave(cols1, cols0, axis=1)  # (B, 2H+2, 2W+2, C)

    inter = assemble(s1(1, 1), s1(1, 0), s1(0, 1), s1(0, 0))
    inter = (inter.astype(dt).astype(jnp.float32) + b1)
    if not edge:
        ring = np.zeros((2 * H + 2, 2 * W + 2, 1), np.float32)
        ring[1:-1, 1:-1] = 1.0
        inter = inter * jnp.asarray(ring)
    interf = inter.astype(dt).astype(jnp.float32)

    # stage 2: phase (qy, qx) reads interf[qy+c : qy+c+2H,
    # qx+d : qx+d+2W] (kernel `phase2`)
    def s2(qy, qx):
        acc = None
        for c in (0, 1):
            for d in (0, 1):
                w = k2t[2 * c + qy, 2 * d + qx].astype(jnp.float32)
                t = w * interf[:, qy + c:qy + c + 2 * H,
                               qx + d:qx + d + 2 * W]
                acc = t if acc is None else acc + t
        return (acc.astype(dt).astype(jnp.float32) + b2).astype(dt)

    rows0 = _ileave(s2(0, 0), s2(0, 1), axis=2)
    rows1 = _ileave(s2(1, 0), s2(1, 1), axis=2)
    return _ileave(rows0, rows1, axis=1)      # (B, 4H, 4W, C)


def apply_deferred_upsampling_exact(d):
    """Apply a deferred upsampling with numerics BIT-IDENTICAL to the
    fused finisher kernels (ops/pallas/semantic_finisher{,4x}.py), so
    `argmax(softmax(result))` always equals the kernels'
    `semantic_segmentation_idx` — including on bf16 tie pixels where
    the XLA conv twin's fused bias add keeps excess precision and can
    flip the argmax (PERF.md). Used by postprocessing to emit the
    on-demand dense logits/softmax keys in deferred mode; slightly
    more ops than the conv form but DCE'd unless consumed."""
    if isinstance(d, DeferredBilinear2):
        C = d.x.shape[-1]
        kernel = jnp.broadcast_to(
            jnp.asarray(_BILINEAR_KERNEL)[:, :, None, None],
            (3, 3, 1, C)).astype(jnp.float32)
        return _finisher4x_logits_exact(d.x, kernel, None, kernel,
                                        None, edge=True)
    if isinstance(d, DeferredUpsampling2):
        return _finisher4x_logits_exact(d.x, d.kernel1, d.bias1,
                                        d.kernel2, d.bias2)
    dt = d.x.dtype
    kt = fused_zeropad_2x_kernel(d.kernel)[:, :, 0, :].astype(dt)
    xp = jnp.pad(d.x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return _zeropad_2x_phases_exact(xp, kt, d.bias, dt)


KNOWN_UPSAMPLING_METHODS = (
    'nearest', 'bilinear', 'learned-3x3', 'learned-3x3-zeropad',
)

# numpy, not jnp: module-level jnp constants initialize the XLA
# backend at import time (breaks jax.distributed.initialize ordering)
_BILINEAR_KERNEL = np.array([
    [0.0625, 0.1250, 0.0625],
    [0.1250, 0.2500, 0.1250],
    [0.0625, 0.1250, 0.0625],
], dtype=np.float32)


def _bilinear_kernel_init(key, shape, dtype=jnp.float32):
    # depthwise kernel shape: (3, 3, 1, C)
    del key
    return jnp.broadcast_to(
        jnp.asarray(_BILINEAR_KERNEL)[:, :, None, None], shape
    ).astype(dtype)


def upsample_nearest_2x(x):
    """Exact x2 nearest upsampling via repeat (NHWC)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _two_tap_params(n: int, m: int):
    """Source taps/weights of a half-pixel 2-tap linear resize n -> m
    (torch F.interpolate bilinear, align_corners=False, antialias=False
    -- the reference's fullres-resize semantics at
    model/postprocessing/dense_base.py:14-58). Returns (i0, f): output
    j = (1-f[j]) * x[i0[j]] + f[j] * x[i0[j]+1], taps clamped to
    [0, n-1]."""
    j = np.arange(m)
    src = (j + 0.5) * (n / m) - 0.5
    i0 = np.floor(src).astype(np.int64)
    f = (src - i0).astype(np.float32)
    return i0, f


def _two_tap_plan(n: int, m: int):
    """Periodic-block decomposition of the 2-tap resize n -> m:
    (i0, f, g, q, p, periodic) with g = gcd(n, m) blocks of q source /
    p output elements. When `periodic`, phase r (r < p) of every block
    reads taps i0[r] + b*q (clamped) with weight f[r] -- so the resize
    is p strided slices combined elementwise instead of a dense
    (n, m) matmul. The periodicity re-check guards against float
    rounding of the src coordinates in pathological cases."""
    i0, f = _two_tap_params(n, m)
    g = math.gcd(n, m)
    q, p = n // g, m // g
    periodic = (
        p <= 32
        and bool(np.all(i0.reshape(g, p)
                        - np.arange(g)[:, None] * q == i0[:p]))
        and bool(np.all(f.reshape(g, p) - f[:p] == 0.0))
    )
    return i0, f, g, q, p, periodic


def _tap_slice(x, s: int, q: int, g: int, axis: int):
    """Strided block slice of tap rows i = s + b*q, b in [0, g), with
    out-of-range rows clamped to the edge. A 2-tap resize only ever
    goes out of range at s == -1 (first block) or s + (g-1)*q == n
    (last block); clamping is done by concatenating the single edge
    row, NOT by edge-padding x -- jnp.pad materialized a full fullres
    copy (7.5 GB at B128 eval, the OOM that motivated this)."""
    n = x.shape[axis]
    last = s + (g - 1) * q
    if s < 0:
        first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        if g == 1:
            return first
        rest = jax.lax.slice_in_dim(x, s + q, last + 1, stride=q,
                                    axis=axis)
        return jnp.concatenate([first, rest], axis=axis)
    if last > n - 1:
        lastv = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
        if g == 1:
            return lastv
        rest = jax.lax.slice_in_dim(x, s, last - q + 1, stride=q,
                                    axis=axis)
        return jnp.concatenate([rest, lastv], axis=axis)
    return jax.lax.slice_in_dim(x, s, last + 1, stride=q, axis=axis)


def _resize_axis_linear(x, m: int, axis: int):
    """2-tap linear resize of one axis (n -> m), XLA-friendly.

    jax.image.resize lowers the 2-tap stencil to a DENSE (n, m) f32
    dot_general -- ~n/2 x the necessary FLOPs and a compute-bound
    matmul at fullres eval shapes (measured 70 ms/step at B128; its
    f32 temporaries were the eval B256 OOM, see PERF.md). Instead:
    the tap pattern is periodic with block size (q -> p) for
    q = n/g, p = m/g, g = gcd(n, m), so the resize is p strided
    slices combined with 2-tap weights -- pure elementwise VPU work
    that XLA can fuse into downstream consumers. Edge clamping is
    reproduced exactly by `_tap_slice`.

    Falls back to a dense tensordot when the period is too long to
    unroll (p > 32)."""
    n = x.shape[axis]
    if m == n:
        return x
    axis = axis % x.ndim
    i0, f, g, q, p, periodic = _two_tap_plan(n, m)
    if not periodic:
        R = np.zeros((n, m), np.float32)
        j = np.arange(m)
        np.add.at(R, (np.clip(i0, 0, n - 1), j), 1.0 - f)
        np.add.at(R, (np.clip(i0 + 1, 0, n - 1), j), f)
        # HIGHEST: default-precision TPU matmuls run f32 as one bf16
        # pass, corrupting the interpolation by ~2^-8 (CLAUDE.md
        # selection-matrix lesson; jax.image.resize also pins HIGHEST)
        y = jnp.tensordot(jnp.moveaxis(x, axis, -1),
                          jnp.asarray(R, x.dtype), axes=1,
                          precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(y, -1, axis)

    pieces = []
    for r in range(p):
        s = int(i0[r])
        a = _tap_slice(x, s, q, g, axis)
        w = float(f[r])
        if w == 0.0:
            pieces.append(a)
            continue
        b = _tap_slice(x, s + 1, q, g, axis)
        pieces.append(a * (1.0 - w) + b * w)
    y = jnp.stack(pieces, axis=axis + 1)       # (..., g, p, ...)
    return y.reshape(*x.shape[:axis], m, *x.shape[axis + 1:])


def resize_bilinear(x, height: int, width: int):
    """Half-pixel-centered bilinear resize (torch align_corners=False,
    antialias=False). Matches jax.image.resize 'linear' on upscales;
    on downscales it keeps the reference's 2-tap semantics (torch
    F.interpolate default) where jax.image would antialias."""
    x = _resize_axis_linear(x, height, -3)
    return _resize_axis_linear(x, width, -2)


def resized_channel_reduce(x, height: int, width: int, reduce_fn):
    """`reduce_fn(resize_bilinear(x.astype(f32), height, width))`
    without materializing the resized (B, height, width, C) tensor.

    `reduce_fn` maps (B, h, w, C) -> tuple of (B, h, w) maps (e.g.
    ops.pallas.semantic_reduce.semantic_score_idx). The resize is
    computed per tap phase -- p_h * p_w independent elementwise
    chains over strided slices, each feeding reduce_fn directly, so
    XLA fuses slice+lerp+reduce per phase and the fullres class-logits
    tensor never exists in HBM (at eval B128 it was 6.25 GB; with the
    stack+pad temporaries it OOMed -- see PERF.md). The phase grids of
    the already-reduced maps are then interleaved (cheap: C is gone).

    Bit-identical to the materializing form: phases slice the same
    elements, cast and combine in the same order (h taps, then w
    taps), and reduce_fn sees the same per-pixel values.

    Reference analogue: model/postprocessing/semantic.py:17-82
    computes softmax/argmax of F.interpolate'd logits."""
    B, n_h, n_w = x.shape[:3]
    i0h, fh, g_h, q_h, p_h, per_h = _two_tap_plan(n_h, height)
    i0w, fw, g_w, q_w, p_w, per_w = _two_tap_plan(n_w, width)
    if height == n_h:
        p_h, g_h = 1, n_h
    if width == n_w:
        p_w, g_w = 1, n_w
    if ((height != n_h and not per_h) or (width != n_w and not per_w)
            or p_h * p_w > 64):
        # non-periodic sizes (dense fallback is the only exact form) or
        # a phase grid too large to unroll (the p<=32 gate is per-axis;
        # an unlucky ratio pair could otherwise emit up to 1024
        # slice+lerp+reduce chains in the unrolled HLO): materialize
        # like the plain path would
        return reduce_fn(resize_bilinear(x.astype(jnp.float32),
                                         height, width))

    def h_phase(r):
        if height == n_h:
            return x.astype(jnp.float32)
        a = _tap_slice(x, int(i0h[r]), q_h, g_h, 1).astype(jnp.float32)
        w = float(fh[r])
        if w == 0.0:
            return a
        b = _tap_slice(x, int(i0h[r]) + 1, q_h, g_h, 1)
        return a * (1.0 - w) + b.astype(jnp.float32) * w

    def w_phase(yh, r):
        if width == n_w:
            return yh
        a = _tap_slice(yh, int(i0w[r]), q_w, g_w, 2)
        w = float(fw[r])
        if w == 0.0:
            return a
        b = _tap_slice(yh, int(i0w[r]) + 1, q_w, g_w, 2)
        return a * (1.0 - w) + b * w

    phase_outs = []                    # [p_h][p_w] tuples of (B, g, g)
    for rh in range(p_h):
        yh = h_phase(rh)
        phase_outs.append([reduce_fn(w_phase(yh, rw))
                           for rw in range(p_w)])

    n_out = len(phase_outs[0][0])
    maps = []
    for k in range(n_out):
        rows = jnp.stack(
            [jnp.stack([phase_outs[rh][rw][k] for rw in range(p_w)],
                       axis=-1)                    # (B, g_h, g_w, p_w)
             for rh in range(p_h)],
            axis=2)                                # (B, g_h, p_h, g_w, p_w)
        maps.append(rows.reshape(B, height, width))
    return tuple(maps)


def _resize_axis_nearest(x, m: int, axis: int):
    """Nearest resize of one axis via the same blocked strided-slice
    decomposition as `_resize_axis_linear` (1 tap): avoids the 2-axis
    advanced-indexing gather, which XLA:TPU lowers poorly at fullres
    shapes (PERF.md lesson 1)."""
    n = x.shape[axis]
    if m == n:
        return x
    axis = axis % x.ndim
    idx = (np.arange(m) * n) // m              # floor(j*n/m), in range
    g = math.gcd(n, m)
    q, p = n // g, m // g
    periodic = (
        p <= 32
        and bool(np.all(idx.reshape(g, p)
                        - np.arange(g)[:, None] * q == idx[:p]))
    )
    if not periodic:
        take = jnp.asarray(idx)
        return jnp.take(x, take, axis=axis)
    pieces = [
        jax.lax.slice_in_dim(x, int(idx[r]), int(idx[r]) + (g - 1) * q + 1,
                             stride=q, axis=axis)
        for r in range(p)
    ]
    y = jnp.stack(pieces, axis=axis + 1)       # (..., g, p, ...)
    return y.reshape(*x.shape[:axis], m, *x.shape[axis + 1:])


def resize_nearest(x, height: int, width: int):
    """Nearest resize with the same floor(i*src/dst) index mapping as
    the host preprocessing resize (exact for label maps)."""
    x = _resize_axis_nearest(x, height, -3)
    return _resize_axis_nearest(x, width, -2)


class Upsampling(nn.Module):
    mode: str = 'bilinear'
    n_channels: int = 0
    scale_factor: Union[float, Tuple[float, float]] = 2.0
    use_bias: bool = True
    dtype: Any = jnp.float32
    # declare params but return DeferredUpsampling instead of applying
    # (learned-3x3-zeropad only; parameter tree stays identical)
    defer: bool = False

    @nn.compact
    def __call__(self, x):
        mode = self.mode.lower()
        if mode not in KNOWN_UPSAMPLING_METHODS:
            raise ValueError(f"Unknown upsampling: '{mode}'")

        sf = self.scale_factor
        if isinstance(sf, (tuple, list)):
            sfy, sfx = sf
        else:
            sfy = sfx = sf

        h, w = x.shape[-3], x.shape[-2]
        new_h, new_w = int(h * sfy), int(w * sfx)

        if 'learned-3x3' in mode:
            assert (sfy, sfx) == (2.0, 2.0) or (sfy, sfx) == (2, 2)
            n = self.n_channels or x.shape[-1]
            if mode == 'learned-3x3-zeropad':
                # fused form: one input-dilated depthwise conv, no 2x
                # intermediate (see learned_zeropad_2x)
                kernel = self.param('kernel', _bilinear_kernel_init,
                                    (3, 3, 1, n), jnp.float32)
                bias = (self.param('bias', nn.initializers.zeros,
                                   (n,), jnp.float32)
                        if self.use_bias else None)
                if self.defer:
                    return DeferredUpsampling(x=x, kernel=kernel,
                                              bias=bias)
                return learned_zeropad_2x(x, kernel, bias, self.dtype)
            # replication-padding variant keeps the two-op form
            x = upsample_nearest_2x(x)
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        mode='edge')
            x = nn.Conv(
                n, (3, 3), padding='VALID', feature_group_count=n,
                use_bias=self.use_bias, dtype=self.dtype,
                kernel_init=_bilinear_kernel_init,
                bias_init=nn.initializers.zeros,
                name='conv',
            )(x)
            return x

        if mode == 'nearest':
            if (sfy, sfx) == (2.0, 2.0) or (sfy, sfx) == (2, 2):
                return upsample_nearest_2x(x)
            return resize_nearest(x, new_h, new_w)

        return resize_bilinear(x, new_h, new_w)


def get_upsampling_name(name: Optional[str] = None) -> str:
    if name is None:
        name = 'bilinear'
    name = name.lower()
    if name not in KNOWN_UPSAMPLING_METHODS:
        raise ValueError(f"Unknown upsampling: '{name}'")
    return name
