"""Fused Pallas window attention vs the XLA einsum path.

The kernel (ops/pallas/window_attention.py) must reproduce the XLA
WindowAttention path on identical parameters: unshifted and shifted
(pattern-pair mask table vs dense per-window masks), v1 and v2
semantics. Interpret mode on CPU; the serving path runs the same
kernel compiled on TPU (reference semantics:
model/backbone/swin.py:196-207)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nicr_mtsa_tpu.models.backbones.swin import SwinBlock, WindowAttention
from nicr_mtsa_tpu.ops.pallas.window_attention import (
    build_pattern_pairs, pick_tile_windows,
    supports_fused_window_attention,
)


def _attn_pair(v2: bool, C: int = 128, h: int = 4):
    xla = WindowAttention(dim=C, n_heads=h, window_size=8, v2=v2,
                          backend='xla')
    fused = WindowAttention(dim=C, n_heads=h, window_size=8, v2=v2,
                            backend='pallas-interpret')
    return xla, fused


@pytest.mark.parametrize('v2', [False, True])
def test_fused_matches_xla_unshifted(v2):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 64, 128)).astype(np.float32))
    xla, fused = _attn_pair(v2)
    variables = xla.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(xla.apply(variables, x))
    got = np.asarray(fused.apply(variables, x))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('v2', [False, True])
def test_fused_matches_xla_shifted(v2):
    """2x3 window grid: every pattern id (interior, last-row, last-col,
    corner) appears; two images so window->image mapping is exercised."""
    ws, shift = 8, 4
    Hp, Wp = 16, 24                          # 2 x 3 windows
    nW = (Hp // ws) * (Wp // ws)
    B = 2
    rng = np.random.default_rng(11)
    x = jnp.asarray(
        rng.normal(size=(B * nW, 64, 128)).astype(np.float32))
    shift_spec = (Hp, Wp, ws, shift, shift)

    xla, fused = _attn_pair(v2)
    variables = xla.init(jax.random.PRNGKey(1), x, shift_spec)
    ref = np.asarray(xla.apply(variables, x, shift_spec))
    got = np.asarray(fused.apply(variables, x, shift_spec))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('v2', [False, True])
def test_fused_qkv_matches_xla_unshifted(v2):
    # serving-only fused-qkv variant: slicing + v2 normalization/scale
    # inside the kernel; must match the XLA path at f32
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.normal(size=(4, 64, 128)).astype(np.float32))
    xla = WindowAttention(dim=128, n_heads=4, window_size=8, v2=v2,
                          backend='xla')
    fused = WindowAttention(dim=128, n_heads=4, window_size=8, v2=v2,
                            backend='pallas-qkv-interpret')
    variables = xla.init(jax.random.PRNGKey(3), x)
    ref = np.asarray(xla.apply(variables, x))
    got = np.asarray(fused.apply(variables, x))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('v2', [False, True])
def test_fused_qkv_matches_xla_shifted(v2):
    ws, shift = 8, 4
    Hp, Wp = 16, 24
    nW = (Hp // ws) * (Wp // ws)
    rng = np.random.default_rng(23)
    x = jnp.asarray(
        rng.normal(size=(2 * nW, 64, 128)).astype(np.float32))
    shift_spec = (Hp, Wp, ws, shift, shift)
    xla = WindowAttention(dim=128, n_heads=4, window_size=8, v2=v2,
                          backend='xla')
    fused = WindowAttention(dim=128, n_heads=4, window_size=8, v2=v2,
                            backend='pallas-qkv-interpret')
    variables = xla.init(jax.random.PRNGKey(5), x, shift_spec)
    ref = np.asarray(xla.apply(variables, x, shift_spec))
    got = np.asarray(fused.apply(variables, x, shift_spec))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_fused_qkv_matches_xla_v1_win7_padded():
    # v1 49-token windows pad to 64 inside the qkv variant too
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.normal(size=(4, 49, 128)).astype(np.float32))
    xla = WindowAttention(dim=128, n_heads=4, window_size=7, v2=False,
                          backend='xla')
    fused = WindowAttention(dim=128, n_heads=4, window_size=7, v2=False,
                            backend='pallas-qkv-interpret')
    variables = xla.init(jax.random.PRNGKey(7), x)
    ref = np.asarray(xla.apply(variables, x))
    got = np.asarray(fused.apply(variables, x))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_pattern_pair_table_matches_dense_masks():
    """The 16-entry pattern-pair table must contain exactly the dense
    per-window masks in key-major layout for every window pair the
    kernel forms."""
    from nicr_mtsa_tpu.models.backbones.swin import _shift_attn_mask
    Hp, Wp, ws, shift = 24, 32, 8, 4
    nWh, nWw = Hp // ws, Wp // ws
    dense = _shift_attn_mask(Hp, Wp, ws, shift, shift)    # (nW, N, N)
    table = build_pattern_pairs(64, dense, (nWh, nWw))
    assert table.shape == (16, 128, 128)

    def pattern_id(w):
        r, c = w // nWw, w % nWw
        return 2 * int(r == nWh - 1) + int(c == nWw - 1)

    nW = nWh * nWw
    for w0 in range(0, nW - 1, 2):
        pid = pattern_id(w0) * 4 + pattern_id(w0 + 1)
        np.testing.assert_array_equal(table[pid][:64, :64], dense[w0].T)
        np.testing.assert_array_equal(table[pid][64:, 64:],
                                      dense[w0 + 1].T)
        assert (table[pid][:64, 64:] == -1e9).all()
        assert (table[pid][64:, :64] == -1e9).all()


def test_swin_block_fused_matches_xla():
    """Full SwinBlock (shifted, v2, padding + roll + un/partition) with
    the fused attention backend vs the XLA backend, same params."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 20, 28, 128)).astype(np.float32))

    def block(backend):
        return SwinBlock(dim=128, n_heads=4, window_size=8, shift=4,
                         v2=True, attn_backend=backend, ln_backend='xla')

    variables = block('xla').init(jax.random.PRNGKey(2), x)
    ref = np.asarray(block('xla').apply(variables, x))
    got = np.asarray(block('pallas-interpret').apply(variables, x))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_support_gate_and_tiling():
    assert supports_fused_window_attention(600, 64, 128, 4)
    assert supports_fused_window_attention(600, 49, 128, 4)  # v1: padded
    assert not supports_fused_window_attention(600, 81, 128, 4)  # win 9
    assert not supports_fused_window_attention(601, 64, 128, 4)  # odd Bw
    assert not supports_fused_window_attention(600, 64, 130, 4)
    t = pick_tile_windows(19200, 128)
    assert t and t % 2 == 0 and 19200 % t == 0
    t = pick_tile_windows(6, 1024)
    assert t and 6 % t == 0


@pytest.mark.parametrize('shifted', [False, True])
def test_fused_matches_xla_v1_win7_padded(shifted):
    """v1 7x7 windows (49 tokens) run the kernel via token padding to
    64: pad keys masked, pad query rows sliced away. Must match the
    XLA path exactly (f32)."""
    ws, shift = 7, 3
    Hp, Wp = 14, 21                          # 2 x 3 windows
    nW = (Hp // ws) * (Wp // ws)
    rng = np.random.default_rng(17)
    x = jnp.asarray(
        rng.normal(size=(2 * nW, ws * ws, 128)).astype(np.float32))
    shift_spec = (Hp, Wp, ws, shift, shift) if shifted else None

    xla = WindowAttention(dim=128, n_heads=4, window_size=ws,
                          backend='xla')
    fused = WindowAttention(dim=128, n_heads=4, window_size=ws,
                            backend='pallas-interpret')
    variables = xla.init(jax.random.PRNGKey(4), x, shift_spec)
    ref = np.asarray(xla.apply(variables, x, shift_spec))
    got = np.asarray(fused.apply(variables, x, shift_spec))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('v2', [False, True])
def test_fused_gradients_match_xla(v2):
    """The flash-style custom VJP must reproduce the XLA path's
    gradients w.r.t. the input windows AND the parameters (qkv/proj
    weights, logit scale / CPB MLP or bias table) -- shifted blocks so
    the pattern masks participate."""
    ws, shift = 8, 4
    Hp, Wp = 16, 24
    nW = (Hp // ws) * (Wp // ws)
    rng = np.random.default_rng(23)
    x = jnp.asarray(
        rng.normal(size=(2 * nW, 64, 128)).astype(np.float32))
    shift_spec = (Hp, Wp, ws, shift, shift)

    xla, fused = _attn_pair(v2)
    variables = xla.init(jax.random.PRNGKey(6), x, shift_spec)

    def loss(module):
        def f(params, xin):
            out = module.apply({'params': params}, xin, shift_spec,
                               True)  # train=True exercises the VJP
            return jnp.sum(out * out)
        return f

    g_ref = jax.grad(loss(xla), argnums=(0, 1))(variables['params'], x)
    g_got = jax.grad(loss(fused), argnums=(0, 1))(variables['params'], x)

    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref[0])[0]
    flat_got = jax.tree_util.tree_flatten_with_path(g_got[0])[0]
    for (path_r, leaf_r), (path_g, leaf_g) in zip(flat_ref, flat_got):
        assert path_r == path_g
        np.testing.assert_allclose(
            np.asarray(leaf_g), np.asarray(leaf_r), rtol=5e-4, atol=5e-4,
            err_msg=str(path_r))
    np.testing.assert_allclose(np.asarray(g_got[1]), np.asarray(g_ref[1]),
                               rtol=5e-4, atol=5e-4, err_msg='d_input')


def test_fused_gradients_v1_padded():
    """Gradients through the token-padded v1 path: pad rows must not
    leak gradient."""
    ws = 7
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.normal(size=(4, 49, 64)).astype(np.float32))

    def make(backend):
        return WindowAttention(dim=64, n_heads=2, window_size=ws,
                               backend=backend)

    variables = make('xla').init(jax.random.PRNGKey(8), x)

    def f(module):
        return lambda xin: jnp.sum(
            module.apply(variables, xin, None, True) ** 2)

    g_ref = jax.grad(f(make('xla')))(x)
    g_got = jax.grad(f(make('pallas-interpret')))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize('v2', [False, True])
def test_fused_bf16_gradients_compile(v2):
    """bf16 training through the fused kernel: the v2 per-head
    logit-scale fold must keep q in the COMPUTE dtype or the custom-VJP
    cotangents (q.dtype) hit strict lax.mul dtype checks in the AD
    transpose of the surrounding ops (regression: found by
    bench --train --model emsaformer_dve_v2 on hardware)."""
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(4, 64, 64)).astype(np.float32),
                    jnp.bfloat16)

    fused = WindowAttention(dim=64, n_heads=2, window_size=8, v2=v2,
                            backend='pallas-interpret',
                            dtype=jnp.bfloat16)
    variables = fused.init(jax.random.PRNGKey(9), x)

    def f(params, xin):
        out = fused.apply({'params': params}, xin, None, True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    loss, grads = jax.value_and_grad(f)(variables['params'], x)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l, np.float32)))
               for l in leaves)


@pytest.mark.parametrize('v2', [False, True])
def test_fused_block_matches_xla_unshifted(v2):
    # whole-sub-block variant: qkv GEMM + v2 norm + attention + output
    # projection inside the kernel; must match the XLA path at f32
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(4, 64, 128)).astype(np.float32))
    xla = WindowAttention(dim=128, n_heads=4, window_size=8, v2=v2,
                          backend='xla')
    fused = WindowAttention(dim=128, n_heads=4, window_size=8, v2=v2,
                            backend='pallas-block-interpret')
    variables = xla.init(jax.random.PRNGKey(9), x)
    ref = np.asarray(xla.apply(variables, x))
    got = np.asarray(fused.apply(variables, x))
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize('v2', [False, True])
def test_fused_block_matches_xla_shifted(v2):
    ws, shift = 8, 4
    Hp, Wp = 16, 24
    nW = (Hp // ws) * (Wp // ws)
    rng = np.random.default_rng(37)
    x = jnp.asarray(
        rng.normal(size=(2 * nW, 64, 128)).astype(np.float32))
    shift_spec = (Hp, Wp, ws, shift, shift)
    xla = WindowAttention(dim=128, n_heads=4, window_size=8, v2=v2,
                          backend='xla')
    fused = WindowAttention(dim=128, n_heads=4, window_size=8, v2=v2,
                            backend='pallas-block-interpret')
    variables = xla.init(jax.random.PRNGKey(11), x, shift_spec)
    ref = np.asarray(xla.apply(variables, x, shift_spec))
    got = np.asarray(fused.apply(variables, x, shift_spec))
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def test_fused_block_matches_xla_v1_win7_padded():
    # v1 49-token windows pad to 64: pad tokens flow through the
    # in-kernel qkv GEMM but their keys are masked and their rows
    # sliced away
    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.normal(size=(4, 49, 128)).astype(np.float32))
    xla = WindowAttention(dim=128, n_heads=4, window_size=7, v2=False,
                          backend='xla')
    fused = WindowAttention(dim=128, n_heads=4, window_size=7, v2=False,
                            backend='pallas-block-interpret')
    variables = xla.init(jax.random.PRNGKey(13), x)
    ref = np.asarray(xla.apply(variables, x))
    got = np.asarray(fused.apply(variables, x))
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize('v2', [False, True])
def test_fused_block_matches_xla_c1024(v2):
    # the widest Swin-T-128 stage (C=1024, 32 heads): weights are
    # 8.4 MB bf16, admitted by the 9 MB VMEM residency bound in
    # supports_fused_window_attention_block (T<=4 tile cap keeps the
    # activation tiles small enough alongside them)
    from nicr_mtsa_tpu.ops.pallas.window_attention import (
        supports_fused_window_attention_block,
    )
    assert supports_fused_window_attention_block(2, 64, 1024, 32)
    rng = np.random.default_rng(43)
    x = jnp.asarray(rng.normal(size=(2, 64, 1024)).astype(np.float32))
    xla = WindowAttention(dim=1024, n_heads=32, window_size=8, v2=v2,
                          backend='xla')
    fused = WindowAttention(dim=1024, n_heads=32, window_size=8, v2=v2,
                            backend='pallas-block-interpret')
    variables = xla.init(jax.random.PRNGKey(17), x)
    ref = np.asarray(xla.apply(variables, x))
    got = np.asarray(fused.apply(variables, x))
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-5)


def test_fused_block_param_tree_matches_xla():
    """'pallas-block' must keep the parameter tree identical to the
    XLA/fused paths (checkpoints interchange)."""
    x = jnp.zeros((4, 64, 128), jnp.float32)
    xla = WindowAttention(dim=128, n_heads=4, window_size=8, v2=True,
                          backend='xla')
    blk = WindowAttention(dim=128, n_heads=4, window_size=8, v2=True,
                          backend='pallas-block-interpret')
    v1 = xla.init(jax.random.PRNGKey(0), x)
    v2_ = blk.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v1) == \
        jax.tree_util.tree_structure(v2_)
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v2_)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
