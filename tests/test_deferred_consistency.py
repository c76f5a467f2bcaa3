"""Within-dict consistency of the deferred semantic path
(interpret=False additionally exercises the non-pallas fallback,
which must use the same kernel-exact phase math).

With `defer_semantic_prediction_upsampling`, `semantic_segmentation_idx`
comes from the fused finisher kernels while the dense
`semantic_output` / `semantic_softmax_scores` keys come from the
lazily-applied twin. The twin (`apply_deferred_upsampling_exact`)
reproduces the kernels' rounding semantics bit-for-bit, so
`argmax(semantic_softmax_scores) == semantic_segmentation_idx` holds
for EVERY pixel — including bf16 ties, where the old XLA conv twin's
fused bias add kept excess precision and could flip the argmax
(PERF.md; the PARITY.md §2.4 caveat this closes).

Reference contract: model/postprocessing/semantic.py:17-82 derives
idx/score/softmax from ONE logits tensor, so they can never disagree.
"""
import numpy as np
import jax.numpy as jnp
import pytest


def _case(seed, dtype, B=8, H=8, W=32, C=40):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)
                    ).astype(dtype)
    k1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, C)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.05, (C,)).astype(np.float32))
    k2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, C)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.05, (C,)).astype(np.float32))
    return x, k1, b1, k2, b2


@pytest.mark.parametrize('interpret', [True, False])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_exact_twin_matches_finisher_2x(dtype, interpret):
    from nicr_mtsa_tpu.models.upsampling import (
        DeferredUpsampling, apply_deferred_upsampling_exact,
    )
    from nicr_mtsa_tpu.ops.pallas.semantic_finisher import (
        finish_deferred_semantic,
    )
    x, k1, b1, _, _ = _case(23, dtype)
    d = DeferredUpsampling(x=x, kernel=k1, bias=b1)
    idx, score = finish_deferred_semantic(d, interpret=interpret)
    dense = np.asarray(apply_deferred_upsampling_exact(d),
                       dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.argmax(dense, axis=-1))
    m = dense.max(axis=-1, keepdims=True)
    score_twin = 1.0 / np.sum(np.exp(dense - m), axis=-1)
    np.testing.assert_allclose(np.asarray(score), score_twin, rtol=1e-4)


@pytest.mark.parametrize('interpret', [True, False])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_exact_twin_matches_finisher_4x(dtype, interpret):
    from nicr_mtsa_tpu.models.upsampling import (
        DeferredUpsampling2, apply_deferred_upsampling_exact,
    )
    from nicr_mtsa_tpu.ops.pallas.semantic_finisher4x import (
        finish_deferred_semantic2,
    )
    x, k1, b1, k2, b2 = _case(29, dtype)
    d = DeferredUpsampling2(x=x, kernel1=k1, bias1=b1,
                            kernel2=k2, bias2=b2)
    idx, score = finish_deferred_semantic2(d, interpret=interpret)
    dense = np.asarray(apply_deferred_upsampling_exact(d),
                       dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.argmax(dense, axis=-1))
    m = dense.max(axis=-1, keepdims=True)
    score_twin = 1.0 / np.sum(np.exp(dense - m), axis=-1)
    np.testing.assert_allclose(np.asarray(score), score_twin, rtol=1e-4)


@pytest.mark.parametrize('interpret', [True, False])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_exact_twin_matches_finisher_bilinear2(dtype, interpret):
    from nicr_mtsa_tpu.models.upsampling import (
        DeferredBilinear2, apply_deferred_upsampling_exact,
    )
    from nicr_mtsa_tpu.ops.pallas.semantic_finisher4x import (
        finish_deferred_bilinear2,
    )
    x, _, _, _, _ = _case(31, dtype)
    d = DeferredBilinear2(x=x)
    idx, score = finish_deferred_bilinear2(d, interpret=interpret)
    dense = np.asarray(apply_deferred_upsampling_exact(d),
                       dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.argmax(dense, axis=-1))
    m = dense.max(axis=-1, keepdims=True)
    score_twin = 1.0 / np.sum(np.exp(dense - m), axis=-1)
    np.testing.assert_allclose(np.asarray(score), score_twin, rtol=1e-4)


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_exact_twin_close_to_conv_twin(dtype):
    # the exact twin must still be the SAME function as the conv twin
    # up to rounding (values within ~bf16 eps), so dense-logit
    # consumers see the model's usual output
    from nicr_mtsa_tpu.models.upsampling import (
        DeferredUpsampling2, apply_deferred_upsampling,
        apply_deferred_upsampling_exact,
    )
    x, k1, b1, k2, b2 = _case(37, dtype)
    d = DeferredUpsampling2(x=x, kernel1=k1, bias1=b1,
                            kernel2=k2, bias2=b2)
    conv = np.asarray(apply_deferred_upsampling(d), dtype=np.float32)
    exact = np.asarray(apply_deferred_upsampling_exact(d),
                       dtype=np.float32)
    tol = 1e-5 if dtype == jnp.float32 else 0.05
    np.testing.assert_allclose(exact, conv, rtol=tol, atol=tol)
