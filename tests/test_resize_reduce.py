"""Exactness of the fused crop+resize+reduce kernel
(ops/pallas/resize_reduce.py) against the XLA twin it replaces
(models/upsampling.resized_channel_reduce + semantic_score_idx): the
argmax must be BIT-IDENTICAL (mIoU parity), the score close to 1 ulp.
Runs the kernel in interpret mode on CPU; the bench shape
((480, 640) -> (512, 512)) and border/tie cases are covered."""
import numpy as np
import jax.numpy as jnp
import pytest

from nicr_mtsa_tpu.models.upsampling import (
    resize_bilinear, resized_channel_reduce,
)
from nicr_mtsa_tpu.ops.pallas.resize_reduce import (
    crop_resize_argmax_score, resize_reduce_supported,
)
from nicr_mtsa_tpu.ops.pallas.semantic_reduce import semantic_score_idx


def _twin(x, crop, out_h, out_w):
    sy, sx = crop
    cropped = x[:, sy, sx, :]
    return resized_channel_reduce(cropped, out_h, out_w,
                                  semantic_score_idx)


CASES = [
    # (H, W, crop, out) -- bench: 480x640 full crop -> 512x512
    ((60, 80), (slice(0, 60), slice(0, 80)), (64, 64)),
    # upscale both, non-trivial crop (valid-region semantics)
    ((64, 96), (slice(0, 48), slice(0, 80)), (96, 96)),
    # downscale one axis, upscale the other
    ((64, 96), (slice(0, 64), slice(0, 96)), (96, 64)),
    # identity rows, resize cols
    ((32, 60), (slice(0, 32), slice(0, 60)), (32, 48)),
]


@pytest.mark.parametrize('case', CASES)
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_kernel_matches_xla_twin(case, dtype):
    (H, W), crop, (oh, ow) = case
    rng = np.random.default_rng(hash(case) % 2 ** 31)
    B, C = 8, 40
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)
                    ).astype(dtype)
    assert resize_reduce_supported(x.shape, crop, oh, ow,
                                   interpret=True), case
    idx, score = crop_resize_argmax_score(x, crop, oh, ow,
                                          interpret=True)
    score_r, idx_r = _twin(x, crop, oh, ow)
    assert idx.shape == (B, oh, ow)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_r),
                               rtol=2e-6, atol=2e-7)


def test_kernel_matches_f64_oracle():
    # independent oracle: float64 numpy 2-tap resize, argmax
    (H, W), (oh, ow) = (60, 80), (64, 64)
    rng = np.random.default_rng(42)
    B, C = 8, 40
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)

    def taps(n, m):
        j = np.arange(m)
        src = (j + 0.5) * (n / m) - 0.5
        i0 = np.floor(src).astype(int)
        f = src - i0
        return np.clip(i0, 0, n - 1), np.clip(i0 + 1, 0, n - 1), f

    r0, r1, fr = taps(H, oh)
    c0, c1, fc = taps(W, ow)
    x64 = x.astype(np.float64)
    rows = x64[:, r0] * (1 - fr)[None, :, None, None] \
        + x64[:, r1] * fr[None, :, None, None]
    full = rows[:, :, c0] * (1 - fc)[None, None, :, None] \
        + rows[:, :, c1] * fc[None, None, :, None]
    idx_o = np.argmax(full, axis=-1)

    idx, score = crop_resize_argmax_score(
        jnp.asarray(x), (slice(0, H), slice(0, W)), oh, ow,
        interpret=True)
    mism = (np.asarray(idx) != idx_o).mean()
    # f32-vs-f64 tie pixels only
    assert mism < 1e-3, mism
    m = full.max(axis=-1, keepdims=True)
    score_o = 1.0 / np.sum(np.exp(full - m), axis=-1)
    np.testing.assert_allclose(np.asarray(score), score_o, rtol=1e-4)


def test_tie_break_first():
    B, H, W, C = 8, 32, 32, 8
    x = np.zeros((B, H, W, C), np.float32)
    x[..., 3] = 2.0
    x[..., 6] = 2.0                  # tie -> first (3) wins
    idx, _ = crop_resize_argmax_score(
        jnp.asarray(x), (slice(0, H), slice(0, W)), 64, 64,
        interpret=True)
    assert (np.asarray(idx) == 3).all()


def test_chunked_batch_matches_twin():
    """B = 128k + r (r % 8 == 0) runs as a 128-block prefix plus one
    whole-axis remainder block; both chunks must agree with the XLA
    twin (the eval-B192 case that used to fall back and OOM)."""
    (H, W), crop, (oh, ow) = (60, 80), (slice(0, 60), slice(0, 80)), \
        (64, 64)
    rng = np.random.default_rng(7)
    B, C = 136, 8                     # 128 + 8 exercises both chunks
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    assert resize_reduce_supported(x.shape, crop, oh, ow,
                                   interpret=True)
    idx, score = crop_resize_argmax_score(x, crop, oh, ow,
                                          interpret=True)
    score_r, idx_r = _twin(x, crop, oh, ow)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_r),
                               rtol=2e-6, atol=2e-7)


def test_supported_gate():
    crop = (slice(0, 480), slice(0, 640))
    # the bench shape must take the kernel path on TPU shapes
    assert resize_reduce_supported((128, 480, 640, 40), crop, 512, 512,
                                   interpret=True)
    # B192 (and any B % 8 == 0) now runs chunked on TPU
    assert resize_reduce_supported((192, 480, 640, 40), crop, 512, 512,
                                   interpret=True)
    assert not resize_reduce_supported((100, 480, 640, 40), crop,
                                       512, 512, interpret=True)
    # identity resize -> not supported (nothing to fuse)
    assert not resize_reduce_supported((128, 480, 640, 40), crop,
                                       480, 640, interpret=True)
    # non-unit crop step -> unsupported
    assert not resize_reduce_supported(
        (128, 480, 640, 40), (slice(0, 480, 2), slice(0, 640)),
        512, 512, interpret=True)
