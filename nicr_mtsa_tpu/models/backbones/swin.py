"""Swin Transformer backbone (v1 / v2), written from scratch for TPU.

Capability parity with reference model/backbone/swin.py:18-260 (which
wraps torchvision): five stages matching the encoder contract
  0: patch embed (4x4)                          ds 4
  1: stage-1 blocks                             ds 4
  2: patch merging + stage-2 blocks             ds 8
  3: patch merging + stage-3 blocks             ds 16
  4: patch merging + stage-4 blocks + final LN  ds 32
with window attention (v1: 7x7, pre-norm, relative-position-bias
table; v2: 8x8, post-norm, cosine attention with learned logit scale
and log-CPB MLP), shifted windows on alternate blocks, and linearly
increasing stochastic depth.

TPU-first notes: everything is NHWC (the reference's per-stage
nchw/nhwc metadata disappears); window partitioning is pure reshapes;
attention over (num_windows*B, ws*ws, C) runs as batched MXU matmuls;
shift masks are computed statically at trace time. Feature maps are
padded to window multiples and cropped back (480x640/32 = 15x20 is not
a multiple of 7)."""
from typing import Any, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..common import FusedLayerNorm
from .base import Backbone


def _trunc_normal(stddev=0.02):
    return nn.initializers.truncated_normal(stddev=stddev)


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng('dropout')
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B * H//ws * W//ws, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_unpartition(windows, ws: int, H: int, W: int):
    """Inverse of window_partition."""
    B = windows.shape[0] // (H // ws * W // ws)
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) indices into the (2ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing='ij'))           # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _log_cpb_coords(ws: int) -> np.ndarray:
    """v2 continuous position bias: log-spaced relative coordinates,
    (N, N, 2) float32 normalized as in Swin v2."""
    r = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(r, r, indexing='ij'), axis=-1)
    table = table / (ws - 1) * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / 3.0
    idx = _relative_position_index(ws)
    flat = table.reshape(-1, 2)
    return flat, idx


def _shift_attn_mask(H: int, W: int, ws: int, shift_h: int,
                     shift_w: int) -> np.ndarray:
    """(num_windows, N, N) additive mask for shifted-window attention
    (static at trace time). Matches torchvision's region construction,
    including the degenerate per-dim shift=0 case (the -0 slices
    collapse so that dimension contributes no partitioning)."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    # -shift as a slice bound is 0 when shift == 0: the middle slice is
    # then empty and the last covers everything, exactly as in
    # torchvision (shift 0 -> no partitioning along that dim)
    for h_sl in (slice(0, -ws), slice(-ws, -shift_h if shift_h else 0),
                 slice(-shift_h if shift_h else 0, None)):
        for w_sl in (slice(0, -ws), slice(-ws, -shift_w if shift_w else 0),
                     slice(-shift_w if shift_w else 0, None)):
            img[h_sl, w_sl] = cnt
            cnt += 1
    img = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    img = img.reshape(-1, ws * ws)
    diff = img[:, :, None] - img[:, None, :]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class QKVProjection(nn.Module):
    """Dense to 3C with an optionally dead key-bias slice.

    Swin v2 (torchvision shifted_window_attention) zeroes the k third
    of the qkv bias on EVERY forward: k is L2-normalized per head, so
    a key bias is not a no-op and the reference explicitly disables
    it. The parameter tree matches nn.Dense ('kernel'/'bias'), so
    ported checkpoints and v1 models are unaffected. Setup-based so
    `weights()` can hand the raw kernel/bias to fused kernels that
    run the GEMM themselves (attn_backend='pallas-block')."""
    features: int
    in_features: int
    zero_k_bias: bool = False
    kernel_init: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            'kernel', self.kernel_init or _trunc_normal(),
            (self.in_features, self.features))
        self.bias = self.param('bias', nn.initializers.zeros,
                               (self.features,))

    def weights(self):
        bias = jnp.asarray(self.bias)
        if self.zero_k_bias:
            C = self.features // 3
            bias = bias.at[C:2 * C].set(0.0)
        return self.kernel, bias

    def __call__(self, x):
        kernel, bias = self.weights()
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        return jnp.dot(x, kernel) + bias


class DenseWeights(nn.Module):
    """nn.Dense twin (identical parameter tree and __call__
    semantics) that can also expose its raw weights to fused kernels
    (the attention output projection under 'pallas-block')."""
    features: int
    in_features: int
    kernel_init: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            'kernel', self.kernel_init or _trunc_normal(),
            (self.in_features, self.features))
        self.bias = self.param('bias', nn.initializers.zeros,
                               (self.features,))

    def weights(self):
        return self.kernel, jnp.asarray(self.bias)

    def __call__(self, x):
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, self.kernel, self.bias, dtype=self.dtype)
        return jnp.dot(x, kernel) + bias


class WindowAttention(nn.Module):
    dim: int
    n_heads: int
    window_size: int
    v2: bool = False
    # 'auto' = fused Pallas kernel on the TPU inference path when the
    # shapes qualify (64-token windows), XLA einsums otherwise; 'xla'
    # forces the einsum path, 'pallas-interpret' runs the kernel in
    # interpret mode (CPU tests)
    backend: str = 'auto'
    dtype: Any = jnp.float32

    def _position_bias(self, N):
        """(h, N, N) f32 additive relative-position bias, query-major."""
        h, ws = self.n_heads, self.window_size
        if self.v2:
            flat, idx = _log_cpb_coords(ws)
            cpb = nn.Sequential([
                nn.Dense(512, dtype=jnp.float32, name='cpb_fc1'),
                jax.nn.relu,
                nn.Dense(h, use_bias=False, dtype=jnp.float32,
                         name='cpb_fc2'),
            ])(jnp.asarray(flat))                       # (T, h)
            bias = cpb[jnp.asarray(idx.reshape(-1))]
            bias = bias.reshape(N, N, h).transpose(2, 0, 1)
            return 16.0 * jax.nn.sigmoid(bias)
        table = self.param(
            'relative_position_bias_table', _trunc_normal(),
            ((2 * ws - 1) ** 2, h))
        idx = _relative_position_index(ws)
        bias = table[jnp.asarray(idx.reshape(-1))]
        return bias.reshape(N, N, h).transpose(2, 0, 1)

    def _v2_scale(self):
        logit_scale = self.param(
            'logit_scale', nn.initializers.constant(np.log(10.0)),
            (self.n_heads, 1, 1))
        return jnp.exp(jnp.minimum(logit_scale, jnp.log(1.0 / 0.01)))

    @nn.compact
    def __call__(self, x, shift_spec=None, train: bool = False):
        """x: (B_windows, N, C); shift_spec: None for unshifted blocks,
        else (Hp, Wp, ws, shift_h, shift_w) describing the padded image
        window grid (the dense (nW, N, N) mask and the fused kernel's
        pattern table both derive from it at trace time)."""
        from ...ops.pallas.window_attention import (
            fused_window_attention, fused_window_attention_block,
            supports_fused_window_attention,
            supports_fused_window_attention_block,
        )

        Bw, N, C = x.shape
        h = self.n_heads
        d = C // h

        qkv_mod = QKVProjection(3 * C, in_features=C,
                                zero_k_bias=self.v2, dtype=self.dtype,
                                name='qkv')
        proj_mod = DenseWeights(C, in_features=C,
                                kernel_init=_trunc_normal(),
                                dtype=self.dtype, name='proj')
        bias = self._position_bias(N)

        backend = self.backend
        if backend == 'auto':
            # inference default: the whole-sub-block kernel (qkv GEMM
            # + attention + proj in VMEM; 171.5 -> 182.8 f/s measured
            # at serve B128). Training and unsupported shapes fall
            # back to the custom-VJP q/k/v kernel below.
            backend = ('pallas-block' if jax.default_backend() == 'tpu'
                       else 'xla')

        # whole-sub-block kernel: qkv GEMM + v2 norm + attention +
        # output projection in VMEM; only the windowed x enters and
        # the projected output leaves (no qkv/q/k/v/proj-side layout
        # copies). Serving only (no VJP): training falls back to the
        # custom-VJP q/k/v kernel.
        use_fused_block = (not train
                           and backend in ('pallas-block',
                                           'pallas-block-interpret')
                           and supports_fused_window_attention_block(
                               Bw, N, C, h))
        if use_fused_block:
            if shift_spec is not None:
                Hp, Wp, ws, sh, sw = shift_spec
                grid_hw = (Hp // ws, Wp // ws)
                shift_masks = _shift_attn_mask(Hp, Wp, ws, sh, sw)
            else:
                grid_hw, shift_masks = (1, 1), None
            scale_vec = (self._v2_scale()[:, 0, 0].astype(jnp.float32)
                         if self.v2 else None)
            wqkv, bqkv = qkv_mod.weights()
            wproj, bproj = proj_mod.weights()
            out = fused_window_attention_block(
                x.astype(self.dtype), wqkv, bqkv, wproj, bproj, bias,
                h, grid_hw, shift_masks, v2_scale=scale_vec,
                interpret=backend == 'pallas-block-interpret')
            return out.astype(self.dtype)
        if backend == 'pallas-block':          # unsupported shape
            backend = 'pallas'
        elif backend == 'pallas-block-interpret':
            backend = 'pallas-interpret'

        qkv = qkv_mod(x)
        # training uses the kernel too: the flash-style custom VJP
        # (ops/pallas/window_attention._attention_core_bwd) recomputes
        # the logits from the saved logsumexp, so neither direction
        # materializes (Bw, h, N, N) in HBM
        use_fused = (backend in ('pallas', 'pallas-interpret')
                     and supports_fused_window_attention(Bw, N, C, h))
        # serving-only variant over the RAW qkv tensor: slicing + v2
        # normalization/scale run inside the kernel, so the projection
        # GEMM feeds it directly (none of the sliced/normalized
        # q/k/v intermediates -- or their layout copies -- exist in
        # HBM). Forward-only (no VJP): opt in via
        # attn_backend='pallas-qkv[-interpret]' for inference graphs.
        use_fused_qkv = (backend in ('pallas-qkv',
                                     'pallas-qkv-interpret')
                         and supports_fused_window_attention(Bw, N, C,
                                                             h))

        if use_fused_qkv:
            from ...ops.pallas.window_attention import (
                fused_window_attention_qkv,
            )
            if shift_spec is not None:
                Hp, Wp, ws, sh, sw = shift_spec
                grid_hw = (Hp // ws, Wp // ws)
                shift_masks = _shift_attn_mask(Hp, Wp, ws, sh, sw)
            else:
                grid_hw, shift_masks = (1, 1), None
            scale_vec = (self._v2_scale()[:, 0, 0].astype(jnp.float32)
                         if self.v2 else None)
            out = fused_window_attention_qkv(
                qkv, bias, h, grid_hw, shift_masks, v2_scale=scale_vec,
                interpret=backend == 'pallas-qkv-interpret')
            out = out.astype(self.dtype)
        elif use_fused:
            # fused path: logits/softmax/PV in one Pallas pass; the
            # (Bw, h, N, N) logits never reach HBM. q keeps the GEMM's
            # (Bw, N, C) layout; per-head scale folds into q.
            q = qkv[..., :C]
            k = qkv[..., C:2 * C]
            v = qkv[..., 2 * C:]
            if self.v2:
                q4 = q.reshape(Bw, N, h, d)
                k4 = k.reshape(Bw, N, h, d)
                q4 = q4 / jnp.maximum(
                    jnp.linalg.norm(q4, axis=-1, keepdims=True), 1e-6)
                k4 = k4 / jnp.maximum(
                    jnp.linalg.norm(k4, axis=-1, keepdims=True), 1e-6)
                scale = self._v2_scale()                # (h, 1, 1)
                # scale folds into q in f32, then rounds back to the
                # compute dtype: q/k/v MUST share the input dtype or
                # the custom-VJP cotangents (q.dtype) hit strict
                # lax.mul dtype checks in the AD transpose of the
                # surrounding ops (found by bench --train on hardware)
                q = (q4.astype(jnp.float32)
                     * scale[None, None, :, 0]).astype(q4.dtype)
                q = q.reshape(Bw, N, C)
                k = k4.reshape(Bw, N, C)
            else:
                q = q * (d ** -0.5)
            if shift_spec is not None:
                Hp, Wp, ws, sh, sw = shift_spec
                grid_hw = (Hp // ws, Wp // ws)
                shift_masks = _shift_attn_mask(Hp, Wp, ws, sh, sw)
            else:
                grid_hw, shift_masks = (1, 1), None
            out = fused_window_attention(
                q, k, v, bias, h, grid_hw, shift_masks,
                interpret=backend == 'pallas-interpret')
            out = out.astype(self.dtype)
        else:
            # XLA path: slice + reshape in the GEMM's own (Bw, N, 3C)
            # layout; the 3C axis decomposes as (3, h, d), so
            # qkv[..., :C] IS the q of the reference's reshape(3, h, d)
            # split. The head transpose stays implicit in the einsums
            # (XLA folds it into the matmuls instead of materializing
            # a (3, Bw, h, N, d) relayout)
            q = qkv[..., :C].reshape(Bw, N, h, d)
            k = qkv[..., C:2 * C].reshape(Bw, N, h, d)
            v = qkv[..., 2 * C:].reshape(Bw, N, h, d)

            if self.v2:
                # cosine attention with learned per-head logit scale
                q = q / jnp.maximum(
                    jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
                k = k / jnp.maximum(
                    jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
                # logits stored in the compute dtype: at bf16 serving
                # this halves the (Bw, h, N, N) HBM footprint and every
                # softmax pass over it; the MXU still accumulates f32
                # and f32 master mode (all parity tests) is unchanged
                attn = (jnp.einsum('bnhd,bmhd->bhnm', q, k,
                                   preferred_element_type=jnp.float32)
                        * self._v2_scale()).astype(self.dtype)
            else:
                attn = (jnp.einsum('bnhd,bmhd->bhnm', q, k,
                                   preferred_element_type=jnp.float32)
                        * (d ** -0.5)).astype(self.dtype)

            attn = attn + bias[None].astype(attn.dtype)

            if shift_spec is not None:
                Hp, Wp, ws, sh, sw = shift_spec
                mask = _shift_attn_mask(Hp, Wp, ws, sh, sw)
                nW = mask.shape[0]
                attn = attn.reshape(Bw // nW, nW, h, N, N) \
                    + jnp.asarray(mask)[None, :, None].astype(attn.dtype)
                attn = attn.reshape(Bw, h, N, N)

            # f32-internal softmax over dtype-stored logits: the
            # converts stay in VPU registers inside the fused pass
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=-1).astype(self.dtype)
            out = jnp.einsum('bhnm,bmhd->bnhd', attn, v,
                             preferred_element_type=jnp.float32)
            out = out.reshape(Bw, N, C).astype(self.dtype)

        return proj_mod(out)


class SwinBlock(nn.Module):
    dim: int
    n_heads: int
    window_size: int
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    v2: bool = False
    # images per attention chunk (0 = whole batch at once); see
    # attention_part for the memory rationale
    attn_chunk_size: int = 0
    # LayerNorm backend ('auto' = fused Pallas kernel on TPU inference)
    ln_backend: str = 'auto'
    # window-attention backend (see WindowAttention.backend)
    attn_backend: str = 'auto'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        ws = self.window_size

        # pad to window multiples (cropped after); the shift disables
        # per dimension when one window already covers it, matching
        # torchvision's shifted_window_attention
        pad_h = (ws - H % ws) % ws
        pad_w = (ws - W % ws) % ws
        Hp, Wp = H + pad_h, W + pad_w
        shift_h = self.shift if ws < Hp else 0
        shift_w = self.shift if ws < Wp else 0

        def attention_part(y):
            if pad_h or pad_w:
                y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            shift_spec = None
            if shift_h or shift_w:
                y = jnp.roll(y, (-shift_h, -shift_w), axis=(1, 2))
                shift_spec = (Hp, Wp, ws, shift_h, shift_w)
            attn = WindowAttention(
                dim=C, n_heads=self.n_heads, window_size=ws,
                v2=self.v2, backend=self.attn_backend,
                dtype=self.dtype, name='attn')

            def run(y_sub):
                windows = window_partition(y_sub, ws)
                windows = attn(windows, shift_spec, train)
                return window_unpartition(windows, ws, Hp, Wp)

            # image-batch chunking caps the live (Bw, h, N, N) logits /
            # (Bw, N, 3C) qkv footprint at chunk-size images: at
            # 480x640 stage 1 a full-batch B128 serve OOMs on ~2 GB of
            # f32 attention logits alone. Sequential chunks in the HLO
            # keep each chunk's intermediates dead before the next one
            # materializes; params are shared (same module instance)
            cs = self.attn_chunk_size
            if cs and B > cs and B % cs == 0:
                y = jnp.concatenate(
                    [run(y[i:i + cs]) for i in range(0, B, cs)], axis=0)
            else:
                y = run(y)
            if shift_h or shift_w:
                y = jnp.roll(y, (shift_h, shift_w), axis=(1, 2))
            if pad_h or pad_w:
                y = y[:, :H, :W]
            return y

        def mlp_part(y):
            hidden = int(C * self.mlp_ratio)
            y = nn.Dense(hidden, dtype=self.dtype,
                         kernel_init=_trunc_normal(), name='mlp_fc1')(y)
            # exact (erf) GELU: torch nn.GELU default; the jax default
            # tanh approximation deviates ~1e-3 and breaks weight-port
            # parity
            y = jax.nn.gelu(y, approximate=False)
            return nn.Dense(C, dtype=self.dtype,
                            kernel_init=_trunc_normal(), name='mlp_fc2')(y)

        dp = DropPath(self.drop_path, name='drop_path')
        ln1 = FusedLayerNorm(backend=self.ln_backend, dtype=self.dtype,
                             name='norm1')
        ln2 = FusedLayerNorm(backend=self.ln_backend, dtype=self.dtype,
                             name='norm2')
        if self.v2:
            # post-norm (res-post-norm)
            x = x + dp(ln1(attention_part(x), train), train)
            x = x + dp(ln2(mlp_part(x), train), train)
        else:
            x = x + dp(attention_part(ln1(x, train)), train)
            x = x + dp(mlp_part(ln2(x, train)), train)
        return x


class PatchMerging(nn.Module):
    """2x2 patch merging: concat 4 neighbors -> project to 2C.
    v1: LN then projection; v2: projection then LN."""
    v2: bool = False
    ln_backend: str = 'auto'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        pad_h, pad_w = H % 2, W % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            H, W = H + pad_h, W + pad_w
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        ln = FusedLayerNorm(backend=self.ln_backend, dtype=self.dtype,
                            name='norm')
        if self.v2:
            x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                         kernel_init=_trunc_normal(), name='reduction')(x)
            x = ln(x, train)
        else:
            x = ln(x, train)
            x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                         kernel_init=_trunc_normal(), name='reduction')(x)
        return x


class PatchEmbed(nn.Module):
    embed_dim: int = 96
    patch_size: int = 4
    n_input_channels: int = 3
    ln_backend: str = 'auto'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.embed_dim,
                    (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding='VALID', dtype=self.dtype,
                    kernel_init=_trunc_normal(), name='proj')(x)
        return FusedLayerNorm(backend=self.ln_backend, dtype=self.dtype,
                              name='norm')(x, train)


class MergedPatchEmbedder(nn.Module):
    """Multimodal patch embed (reference swin_multimodal.py:18-109):
    separate rgb/depth patch convs + LNs, concatenated channel-wise."""
    embed_dim_rgb: int = 64
    embed_dim_depth: int = 32
    patch_size: int = 4
    ln_backend: str = 'auto'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (..., 4) rgbd."""
        rgb = PatchEmbed(self.embed_dim_rgb, self.patch_size, 3,
                         ln_backend=self.ln_backend,
                         dtype=self.dtype, name='rgb')(x[..., :3], train)
        depth = PatchEmbed(self.embed_dim_depth, self.patch_size, 1,
                           ln_backend=self.ln_backend,
                           dtype=self.dtype,
                           name='depth')(x[..., 3:], train)
        return jnp.concatenate([rgb, depth], axis=-1)


class SwinBackbone(Backbone):
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    n_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    stochastic_depth: float = 0.2
    v2: bool = False
    n_input_channels: int = 3
    multimodal: bool = False                 # separate rgb/depth embeds
    embed_dim_depth: int = 32
    # gradient checkpointing: recompute each block's activations in the
    # backward pass instead of storing them (trades ~1/3 more FLOPs for
    # O(depth) -> O(1) attention-activation memory per stage). The
    # lifted transform leaves the parameter tree unchanged, so
    # checkpoints interchange with the non-remat model.
    remat: bool = False
    # images per attention chunk inside each block (0 = off); bounds
    # the live window-attention intermediates for large serving batches
    attn_chunk_size: int = 0
    # LayerNorm backend for every LN in the backbone ('auto' = fused
    # Pallas kernel on the TPU inference path, XLA otherwise)
    ln_backend: str = 'auto'
    # window-attention backend for every block ('auto' = fused Pallas
    # attention on the TPU inference path when shapes qualify)
    attn_backend: str = 'auto'
    dtype: Any = jnp.float32

    @property
    def stages_n_channels(self) -> List[int]:
        e = self.embed_dim
        return [e, e, 2 * e, 4 * e, 8 * e]

    @property
    def stages_downsampling(self) -> List[int]:
        return [4, 4, 8, 16, 32]

    def setup(self):
        if self.multimodal:
            assert self.n_input_channels == 4
            self.patch_embed = MergedPatchEmbedder(
                embed_dim_rgb=self.embed_dim - self.embed_dim_depth,
                embed_dim_depth=self.embed_dim_depth,
                ln_backend=self.ln_backend, dtype=self.dtype)
        else:
            self.patch_embed = PatchEmbed(
                embed_dim=self.embed_dim,
                n_input_channels=self.n_input_channels,
                ln_backend=self.ln_backend, dtype=self.dtype)

        total_blocks = sum(self.depths)
        dp_rates = np.linspace(0, self.stochastic_depth, total_blocks)

        # static_argnums counts the bound module as arg 0, so `train`
        # (arg 2 of __call__) stays a trace-time constant under remat
        block_cls = nn.remat(SwinBlock, static_argnums=(2,)) \
            if self.remat else SwinBlock

        layers = []
        block_idx = 0
        for i, (depth, heads) in enumerate(zip(self.depths, self.n_heads)):
            blocks = []
            for b in range(depth):
                blocks.append(block_cls(
                    dim=self.embed_dim * 2 ** i,
                    n_heads=heads,
                    window_size=self.window_size,
                    shift=0 if b % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=float(dp_rates[block_idx]),
                    v2=self.v2,
                    attn_chunk_size=self.attn_chunk_size,
                    ln_backend=self.ln_backend,
                    attn_backend=self.attn_backend,
                    dtype=self.dtype,
                    name=f'layer{i + 1}_block{b}',
                ))
                block_idx += 1
            layers.append(tuple(blocks))
        self.layers = tuple(layers)
        self.mergers = tuple(
            PatchMerging(v2=self.v2, ln_backend=self.ln_backend,
                         dtype=self.dtype, name=f'merge{i}')
            for i in range(1, 4))
        self.final_norm = FusedLayerNorm(
            backend=self.ln_backend, dtype=self.dtype, name='norm')

    def forward_stage(self, idx: int, x, train: bool = False):
        if idx == 0:
            return self.patch_embed(x, train)
        if idx >= 2:
            x = self.mergers[idx - 2](x, train)
        for block in self.layers[idx - 1]:
            x = block(x, train)
        if idx == 4:
            x = self.final_norm(x, train)
        return x

    def __call__(self, x, train: bool = False):
        outs = []
        for i in range(self.n_stages):
            x = self.forward_stage(i, x, train)
            outs.append(x)
        return outs


def get_swin_backbone(
    name: str,
    n_input_channels: int = 3,
    **kwargs: Any,
) -> SwinBackbone:
    """Registry names (reference backbone/__init__.py:36-57):
    swin-{t,s,b}[-v2], swin-t-128, swin-t-v2-128, and swin-multi-*
    variants with the merged rgb+depth patch embedder."""
    name = name.lower()
    v2 = '-v2' in name
    multimodal = name.startswith('swin-multi')

    if '-t' in name:
        depths, heads, embed = (2, 2, 6, 2), (3, 6, 12, 24), 96
        sd = 0.2
    elif '-s' in name:
        depths, heads, embed = (2, 2, 18, 2), (3, 6, 12, 24), 96
        sd = 0.3
    elif '-b' in name:
        depths, heads, embed = (2, 2, 18, 2), (4, 8, 16, 32), 128
        sd = 0.5
    else:
        raise ValueError(f"Unknown swin backbone: '{name}'")

    if name.endswith('-128'):
        # EMSAFormer's widened Swin-T: embed 128 needs head counts that
        # divide it (head dim 32, like swin-b)
        embed = 128
        heads = (4, 8, 16, 32)

    if multimodal:
        n_input_channels = 4

    return SwinBackbone(
        embed_dim=embed,
        depths=depths,
        n_heads=heads,
        window_size=8 if v2 else 7,
        stochastic_depth=sd,
        v2=v2,
        n_input_channels=n_input_channels,
        multimodal=multimodal,
        **kwargs,
    )
