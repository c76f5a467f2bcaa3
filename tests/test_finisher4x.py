"""Exactness tests for the double-deferred (4x) semantic finisher.

Oracle: exact float64 numpy evaluation of TWO chained
nearest-x2 + zero-padded depthwise 3x3 stages (the learned-3x3-zeropad
prediction upsampling, reference model/upsampling.py:63-69) followed
by argmax / max-softmax score. The XLA conv path is NOT the oracle
(oneDNN CPU convs are reduced-precision -- see test_ops.py)."""
import numpy as np
import jax.numpy as jnp


def _zeropad_2x_f64(x, kern, bias):
    """float64 nearest-x2 + zero-padded depthwise 3x3 + bias."""
    B, H, W, C = x.shape
    up = np.repeat(np.repeat(x.astype(np.float64), 2, 1), 2, 2)
    upp = np.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros_like(up)
    for dy in range(3):
        for dx in range(3):
            out += (kern[dy, dx, 0].astype(np.float64)
                    * upp[:, dy:dy + 2 * H, dx:dx + 2 * W, :])
    return out + bias.astype(np.float64)


def _random_case(seed, B=8, H=8, W=32, C=40):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    k1 = rng.normal(0, 0.1, size=(3, 3, 1, C)).astype(np.float32)
    b1 = rng.normal(0, 0.05, size=(C,)).astype(np.float32)
    k2 = rng.normal(0, 0.1, size=(3, 3, 1, C)).astype(np.float32)
    b2 = rng.normal(0, 0.05, size=(C,)).astype(np.float32)
    return x, k1, b1, k2, b2


def test_finisher4x_matches_numpy_oracle_f32():
    from nicr_mtsa_tpu.ops.pallas.semantic_finisher4x import (
        upsample4x_argmax_score,
    )
    x, k1, b1, k2, b2 = _random_case(7)
    B, H, W, _ = x.shape

    logits = _zeropad_2x_f64(_zeropad_2x_f64(x, k1, b1), k2, b2)
    idx_o = np.argmax(logits, axis=-1)
    m = logits.max(axis=-1, keepdims=True)
    score_o = 1.0 / np.sum(np.exp(logits - m), axis=-1)

    # block (4, 16) on (8, 32) -> a 2x2 spatial grid: every tile hits
    # an image border AND an interior tile boundary (the stage-2 halo
    # ring is exercised both as zero-pad and as recomputed data)
    idx, score = upsample4x_argmax_score(
        jnp.asarray(x), jnp.asarray(k1), jnp.asarray(b1),
        jnp.asarray(k2), jnp.asarray(b2), interpret=True)
    assert idx.shape == (B, 4 * H, 4 * W)
    np.testing.assert_array_equal(np.asarray(idx), idx_o)
    np.testing.assert_allclose(np.asarray(score), score_o, rtol=1e-4)


def test_finisher4x_matches_xla_twin_f32():
    # same weights through the production fallback (two XLA convs +
    # reduces). The twin's matmul precision must be pinned or this
    # measures the twin's one-pass-bf16 conv rounding, not the kernel
    # (PERF.md "exactness gate precision" lesson).
    import jax
    from nicr_mtsa_tpu.ops.pallas.semantic_finisher4x import (
        upsample4x_argmax_score, upsample4x_argmax_score_reference,
    )
    x, k1, b1, k2, b2 = _random_case(11)
    args = (jnp.asarray(x), jnp.asarray(k1), jnp.asarray(b1),
            jnp.asarray(k2), jnp.asarray(b2))
    idx, score = upsample4x_argmax_score(*args, interpret=True)
    with jax.default_matmul_precision('highest'):
        idx_r, score_r = upsample4x_argmax_score_reference(*args)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
    np.testing.assert_allclose(
        np.asarray(score), np.asarray(score_r), rtol=1e-5)


def test_finisher4x_tie_break_first():
    from nicr_mtsa_tpu.ops.pallas.semantic_finisher4x import (
        upsample4x_argmax_score,
    )
    B, H, W, C = 8, 8, 32, 8
    x = np.zeros((B, H, W, C), np.float32)
    x[..., 2] = 1.5
    x[..., 5] = 1.5              # tie with class 2 -> first wins
    kern = np.zeros((3, 3, 1, C), np.float32)
    kern[1, 1] = 1.0             # center tap: ties survive both stages
    idx, _ = upsample4x_argmax_score(
        jnp.asarray(x), jnp.asarray(kern), None,
        jnp.asarray(kern), None, interpret=True)
    assert (np.asarray(idx) == 2).all()


def _bilinear_2x_f64(x):
    """float64 nearest-x2 + REPLICATION-padded depthwise 3x3 with the
    fixed bilinear kernel == half-pixel clamped bilinear x2 resize
    (models/upsampling.py DeferredBilinear2)."""
    from nicr_mtsa_tpu.models.upsampling import _BILINEAR_KERNEL
    B, H, W, C = x.shape
    up = np.repeat(np.repeat(x.astype(np.float64), 2, 1), 2, 2)
    upp = np.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='edge')
    out = np.zeros_like(up)
    for dy in range(3):
        for dx in range(3):
            out += (float(_BILINEAR_KERNEL[dy, dx])
                    * upp[:, dy:dy + 2 * H, dx:dx + 2 * W, :])
    return out


def test_bilinear_formulation_matches_jax_resize():
    # the DeferredBilinear2 premise: nearest-x2 + replication-padded
    # 3x3 bilinear kernel == jax.image.resize 'linear' (half-pixel,
    # clamped) -- the model's actual upsampling op
    from nicr_mtsa_tpu.models.upsampling import resize_bilinear
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float64)
    ours = _bilinear_2x_f64(x)
    # jax runs f32 here (x64 stays off in tests): tolerance is f32 eps
    theirs = np.asarray(resize_bilinear(jnp.asarray(x), 10, 14))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_finisher4x_bilinear_matches_numpy_oracle_f32():
    from nicr_mtsa_tpu.ops.pallas.semantic_finisher4x import (
        upsample4x_bilinear_argmax_score,
    )
    rng = np.random.default_rng(13)
    B, H, W, C = 8, 8, 32, 40
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)

    logits = _bilinear_2x_f64(_bilinear_2x_f64(x))
    idx_o = np.argmax(logits, axis=-1)
    m = logits.max(axis=-1, keepdims=True)
    score_o = 1.0 / np.sum(np.exp(logits - m), axis=-1)

    # (4, 16) blocks on (8, 32): every tile touches an image border
    # (replication ring) AND an interior tile boundary
    idx, score = upsample4x_bilinear_argmax_score(
        jnp.asarray(x), interpret=True)
    assert idx.shape == (B, 4 * H, 4 * W)
    np.testing.assert_array_equal(np.asarray(idx), idx_o)
    np.testing.assert_allclose(np.asarray(score), score_o, rtol=1e-4)


def test_finisher4x_bilinear_matches_xla_twin_f32():
    from nicr_mtsa_tpu.ops.pallas.semantic_finisher4x import (
        upsample4x_bilinear_argmax_score, upsample4x_bilinear_reference,
    )
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(size=(8, 8, 32, 40)).astype(np.float32))
    idx, score = upsample4x_bilinear_argmax_score(x, interpret=True)
    idx_r, score_r = upsample4x_bilinear_reference(x)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
    np.testing.assert_allclose(
        np.asarray(score), np.asarray(score_r), rtol=1e-4)


def test_finisher4x_bilinear_constant_input_is_constant():
    # replication borders: a constant image must stay EXACTLY constant
    # through both stages (zero-pad borders would dim the edges)
    from nicr_mtsa_tpu.ops.pallas.semantic_finisher4x import (
        upsample4x_bilinear_argmax_score,
    )
    B, H, W, C = 8, 4, 16, 8
    x = np.full((B, H, W, C), 0.25, np.float32)
    x[..., 3] = 1.0
    idx, score = upsample4x_bilinear_argmax_score(
        jnp.asarray(x), interpret=True)
    assert (np.asarray(idx) == 3).all()
    expected = 1.0 / (np.exp(0.25 - 1.0) * (C - 1) + 1.0)
    np.testing.assert_allclose(np.asarray(score), expected, rtol=1e-5)


def test_finisher4x_no_bias_zero_input_border():
    # with nonzero biases the border behavior is the discriminating
    # case: stage-1 bias must appear INSIDE the image but not in the
    # stage-2 zero-pad ring
    from nicr_mtsa_tpu.ops.pallas.semantic_finisher4x import (
        upsample4x_argmax_score,
    )
    B, H, W, C = 8, 4, 16, 8
    x = np.zeros((B, H, W, C), np.float32)
    k = np.zeros((3, 3, 1, C), np.float32)
    k[1, 1] = 1.0
    b1 = np.linspace(0.1, 0.8, C).astype(np.float32)
    b2 = np.zeros((C,), np.float32)

    logits = _zeropad_2x_f64(_zeropad_2x_f64(x, k, b1), k, b2)
    idx_o = np.argmax(logits, axis=-1)
    m = logits.max(axis=-1, keepdims=True)
    score_o = 1.0 / np.sum(np.exp(logits - m), axis=-1)

    idx, score = upsample4x_argmax_score(
        jnp.asarray(x), jnp.asarray(k), jnp.asarray(b1),
        jnp.asarray(k), jnp.asarray(b2), interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), idx_o)
    np.testing.assert_allclose(np.asarray(score), score_o, rtol=1e-5)
