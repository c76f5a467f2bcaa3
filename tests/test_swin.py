"""Swin backbone tests: stage contract, shifted windows, v2 variants,
multimodal patch embedding, encoder integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nicr_mtsa_tpu.models import get_backbone, get_encoder
from nicr_mtsa_tpu.models.backbones.swin import (
    SwinBackbone,
    _relative_position_index,
    _shift_attn_mask,
    window_partition,
    window_unpartition,
)


H, W = 64, 96


def _run(bb, x, train=False):
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    variables = bb.init(rngs, x, train=train)
    if train:
        out, _ = bb.apply(variables, x, train=True,
                          rngs={'dropout': jax.random.PRNGKey(2)},
                          mutable=['batch_stats'])
        return out
    return bb.apply(variables, x, train=False)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 14, 28, 8)),
                    jnp.float32)
    w = window_partition(x, 7)
    assert w.shape == (2 * 2 * 4, 49, 8)
    back = window_unpartition(w, 7, 14, 28)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index():
    idx = _relative_position_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25
    # symmetric displacement pairs map to mirrored entries
    assert idx[0, 0] == idx[4, 4]


def test_shift_mask():
    mask = _shift_attn_mask(14, 14, 7, 3, 3)
    assert mask.shape == (4, 49, 49)
    # first (unshifted-interior) window: fully visible
    assert (mask[0] == 0).all()
    # boundary windows have blocked pairs
    assert (mask[-1] < 0).any()
    # per-dim degenerate shift: shift_w == 0 partitions rows only
    mask_h = _shift_attn_mask(14, 7, 7, 3, 0)
    assert mask_h.shape == (2, 49, 49)
    assert (mask_h[0] == 0).all() and (mask_h[-1] < 0).any()


@pytest.mark.parametrize('name,embed', [
    ('swin-t', 96),
    ('swin-t-v2', 96),
    ('swin-t-128', 128),
])
def test_swin_backbone_shapes(name, embed):
    bb = get_backbone(name)
    x = jnp.zeros((1, H, W, 3))
    outs = _run(bb, x)
    assert len(outs) == 5
    for out, n_ch, ds in zip(outs, bb.stages_n_channels,
                             bb.stages_downsampling):
        assert out.shape == (1, H // ds, W // ds, n_ch), (name, ds)


def test_swin_multimodal():
    bb = get_backbone('swin-multi-t')
    x = jnp.zeros((1, H, W, 4))
    outs = _run(bb, x)
    assert outs[0].shape == (1, H // 4, W // 4, 96)
    assert outs[-1].shape == (1, H // 32, W // 32, 768)


def test_swin_nondivisible_input():
    # 480/32 = 15 is not a multiple of the 7x7 window: padding path
    bb = get_backbone('swin-t')
    x = jnp.zeros((1, 96, 160, 3))    # ds32 -> 3x5
    outs = _run(bb, x)
    assert outs[-1].shape == (1, 3, 5, 768)


def test_swin_encoder_and_train_mode():
    bb = get_backbone('swin-t')
    enc = get_encoder(backbone_rgb=bb)
    x = {'rgb': jnp.asarray(
        np.random.default_rng(0).normal(size=(1, H, W, 3)), jnp.float32)}
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    variables = enc.init(rngs, x, train=False)
    out, skips = enc.apply(variables, x, train=False)
    assert out['rgb'].shape == (1, H // 32, W // 32, 768)
    assert skips['4']['rgb'].shape == (1, H // 4, W // 4, 96)
    assert skips['8']['rgb'].shape == (1, H // 8, W // 8, 192)
    assert skips['16']['rgb'].shape == (1, H // 16, W // 16, 384)

    # stochastic depth active in train mode -> differs between rng keys
    out1, _ = enc.apply(variables, x, train=True,
                        rngs={'dropout': jax.random.PRNGKey(2)})
    out2, _ = enc.apply(variables, x, train=True,
                        rngs={'dropout': jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(out1['rgb']),
                           np.asarray(out2['rgb']))


def test_swin_block_vs_bruteforce_numpy():
    """Shifted-window attention block vs a token-by-token numpy
    computation using the same parameters: validates windowing, cyclic
    shift, attention masking, relative-position-bias indexing, scaling,
    and the MLP residual -- independently of the vectorized
    implementation."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nicr_mtsa_tpu.models.backbones.swin import SwinBlock

    H = W = 8
    C, h, ws, shift = 8, 2, 4, 2
    d = C // h
    N = ws * ws

    rng = np.random.default_rng(11)
    x = rng.normal(size=(1, H, W, C)).astype(np.float32)

    block = SwinBlock(dim=C, n_heads=h, window_size=ws, shift=shift,
                      mlp_ratio=2.0)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(block.apply(variables, jnp.asarray(x), train=False))

    p = jax.tree_util.tree_map(np.asarray, variables['params'])

    def ln(z, prm, eps=1e-5):
        m = z.mean(-1, keepdims=True)
        v = z.var(-1, keepdims=True)
        return (z - m) / np.sqrt(v + eps) * prm['scale'] + prm['bias']

    def gelu_tanh(z):
        return 0.5 * z * (1.0 + np.tanh(
            np.sqrt(2.0 / np.pi) * (z + 0.044715 * z ** 3)))

    # region ids for the shift mask, derived on the (post-roll) window
    # grid with boundaries [0, H-ws), [H-ws, H-shift), [H-shift, H):
    # these boundaries are engineered so that region changes align
    # exactly with the wrap points inside rolled windows -- e.g. the
    # rolled window (0,0) holds ORIGINAL rows 2..5, which are
    # contiguous, and correctly gets full attention (its grid rows
    # 0..3 all fall in region 0), while the last window's rolled rows
    # 4..7 hold original {6,7,0,1} and split into regions {1,1,2,2}
    def region(coord, size):
        return 0 if coord < size - ws else (1 if coord < size - shift
                                            else 2)

    # relative position bias lookup, recomputed by hand
    table = p['attn']['relative_position_bias_table']   # ((2ws-1)^2, h)

    def rel_bias(n, m):
        yn, xn = divmod(n, ws)
        ym, xm = divmod(m, ws)
        idx = (yn - ym + ws - 1) * (2 * ws - 1) + (xn - xm + ws - 1)
        return table[idx]                               # (h,)

    y = ln(x[0], p['norm1'])                            # (H, W, C)
    y = np.roll(y, (-shift, -shift), axis=(0, 1))
    attn_out = np.zeros_like(y)

    Wqkv, bqkv = p['attn']['qkv']['kernel'], p['attn']['qkv']['bias']
    Wproj, bproj = p['attn']['proj']['kernel'], p['attn']['proj']['bias']

    for wi in range(H // ws):
        for wj in range(W // ws):
            tok = y[wi * ws:(wi + 1) * ws,
                    wj * ws:(wj + 1) * ws].reshape(N, C)
            qkv = tok @ Wqkv + bqkv
            q, k, v = qkv[:, :C], qkv[:, C:2 * C], qkv[:, 2 * C:]

            # region ids of this window's tokens (window-grid coords)
            ids = []
            for n in range(N):
                yy = wi * ws + n // ws
                xx = wj * ws + n % ws
                ids.append((region(yy, H), region(xx, W)))

            o = np.zeros((N, C))
            for hh in range(h):
                qh = q[:, hh * d:(hh + 1) * d]
                kh = k[:, hh * d:(hh + 1) * d]
                vh = v[:, hh * d:(hh + 1) * d]
                logits = qh @ kh.T / np.sqrt(d)
                for n in range(N):
                    for m in range(N):
                        logits[n, m] += rel_bias(n, m)[hh]
                        if ids[n] != ids[m]:
                            logits[n, m] += -100.0
                a = np.exp(logits - logits.max(-1, keepdims=True))
                a /= a.sum(-1, keepdims=True)
                o[:, hh * d:(hh + 1) * d] = a @ vh
            proj = o @ Wproj + bproj
            attn_out[wi * ws:(wi + 1) * ws,
                     wj * ws:(wj + 1) * ws] = proj.reshape(ws, ws, C)

    attn_out = np.roll(attn_out, (shift, shift), axis=(0, 1))
    x1 = x[0] + attn_out

    z = ln(x1, p['norm2'])
    z = gelu_tanh(z @ p['mlp_fc1']['kernel'] + p['mlp_fc1']['bias'])
    z = z @ p['mlp_fc2']['kernel'] + p['mlp_fc2']['bias']
    expected = x1 + z

    np.testing.assert_allclose(out[0], expected, rtol=1e-4, atol=1e-4)


def test_swin_v2_attention_vs_bruteforce_numpy():
    """Swin v2 window attention (cosine attention with learned logit
    scale, log-CPB bias, res-post-norm lives in the block) vs explicit
    numpy computation with the same parameters."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nicr_mtsa_tpu.models.backbones.swin import (
        WindowAttention, _log_cpb_coords,
    )

    C, h, ws = 8, 2, 4
    d = C // h
    N = ws * ws
    Bw = 2

    rng = np.random.default_rng(13)
    x = rng.normal(size=(Bw, N, C)).astype(np.float32)

    attn = WindowAttention(dim=C, n_heads=h, window_size=ws, v2=True)
    variables = attn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(attn.apply(variables, jnp.asarray(x)))

    p = jax.tree_util.tree_map(np.asarray, variables['params'])
    Wqkv, bqkv = p['qkv']['kernel'], p['qkv']['bias']
    Wproj, bproj = p['proj']['kernel'], p['proj']['bias']
    ls = p['logit_scale']                                    # (h, 1, 1)

    # continuous position bias: MLP over log-spaced rel coords
    flat, idx = _log_cpb_coords(ws)
    hidden = np.maximum(flat @ p['cpb_fc1']['kernel']
                        + p['cpb_fc1']['bias'], 0.0)
    cpb = hidden @ p['cpb_fc2']['kernel']                    # (T, h)
    bias_nm = cpb[idx.reshape(-1)].reshape(N, N, h)
    bias_nm = 16.0 / (1.0 + np.exp(-bias_nm))                # sigmoid*16

    expected = np.zeros_like(x)
    for b in range(Bw):
        qkv = x[b] @ Wqkv + bqkv
        q, k, v = qkv[:, :C], qkv[:, C:2 * C], qkv[:, 2 * C:]
        o = np.zeros((N, C))
        for hh in range(h):
            qh = q[:, hh * d:(hh + 1) * d]
            kh = k[:, hh * d:(hh + 1) * d]
            vh = v[:, hh * d:(hh + 1) * d]
            qh = qh / np.maximum(
                np.linalg.norm(qh, axis=-1, keepdims=True), 1e-6)
            kh = kh / np.maximum(
                np.linalg.norm(kh, axis=-1, keepdims=True), 1e-6)
            scale = np.exp(min(float(ls[hh, 0, 0]),
                               float(np.log(1.0 / 0.01))))
            logits = (qh @ kh.T) * scale + bias_nm[:, :, hh]
            a = np.exp(logits - logits.max(-1, keepdims=True))
            a /= a.sum(-1, keepdims=True)
            o[:, hh * d:(hh + 1) * d] = a @ vh
        expected[b] = o @ Wproj + bproj

    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_remat_matches_standard():
    """remat=True must keep the parameter tree AND forward/grad values
    identical (checkpoints interchange; only the backward-pass memory
    schedule changes)."""
    bb = SwinBackbone(embed_dim=16, depths=(1, 1, 1, 1),
                      n_heads=(2, 4, 8, 16), window_size=7,
                      stochastic_depth=0.0)
    bb_r = SwinBackbone(embed_dim=16, depths=(1, 1, 1, 1),
                        n_heads=(2, 4, 8, 16), window_size=7,
                        stochastic_depth=0.0, remat=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 28, 28, 3)),
                    jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), x, train=False)
    v_r = bb_r.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v_r)

    def loss(variables, model):
        outs = model.apply(variables, x, train=True,
                           rngs={'dropout': jax.random.PRNGKey(1)})
        return sum(jnp.sum(o * o) for o in outs)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, bb))(v)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, bb_r))(v)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # recomputation reassociates float32 reductions: tiny noise only
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_attn_chunking_matches_full_batch():
    """Image-batch chunked window attention must be numerically
    identical to the full-batch computation (same params, per-image
    independence)."""
    bb = SwinBackbone(embed_dim=16, depths=(1, 1, 1, 1),
                      n_heads=(2, 4, 8, 16), window_size=7,
                      stochastic_depth=0.0)
    bb_c = SwinBackbone(embed_dim=16, depths=(1, 1, 1, 1),
                        n_heads=(2, 4, 8, 16), window_size=7,
                        stochastic_depth=0.0, attn_chunk_size=2)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 56, 28, 3)),
                    jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        bb_c.init(jax.random.PRNGKey(0), x, train=False))
    ref = bb.apply(v, x, train=False)
    out = bb_c.apply(v, x, train=False)
    for i, (a, b) in enumerate(zip(ref, out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f'stage {i}')
