"""Native preprocessing library parity (native/mtsa_preproc.cpp vs the
numpy golden implementations)."""
import numpy as np
import pytest

from nicr_mtsa_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native library not built')


def test_nearest_matches_numpy_exactly():
    from nicr_mtsa_tpu.data.preprocessing.resize import _nearest_indices
    rng = np.random.default_rng(0)
    for dtype, shape in [(np.uint8, (37, 53, 3)), (np.uint16, (64, 48)),
                         (np.uint32, (30, 40)), (np.int32, (24, 36)),
                         (np.float32, (24, 36, 2)), (bool, (32, 32))]:
        arr = rng.integers(0, 255, shape).astype(dtype)
        for (h, w) in [(17, 29), (64, 96), (37, 53)]:
            out = native.nearest_resize(arr, h, w)
            yi = _nearest_indices(arr.shape[0], h)
            xi = _nearest_indices(arr.shape[1], w)
            expected = arr[yi[:, None], xi[None, :], ...]
            np.testing.assert_array_equal(out, expected,
                                          err_msg=f'{dtype} {h}x{w}')


def test_bilinear_close_to_numpy():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    out = native.bilinear_resize_u8(img, 45, 61)
    # numpy golden (without the native fast path)
    import nicr_mtsa_tpu.data.preprocessing.resize as rz
    x = img.astype(np.float32)

    def coords(n_src, n_dst):
        c = (np.arange(n_dst) + 0.5) * (n_src / n_dst) - 0.5
        c0 = np.floor(c).astype(int)
        return (np.clip(c0, 0, n_src - 1), np.clip(c0 + 1, 0, n_src - 1),
                (c - c0).astype(np.float32))

    y0, y1, fy = coords(60, 45)
    x0, x1, fx = coords(80, 61)
    top = x[y0][:, x0] * (1 - fx[None, :, None]) \
        + x[y0][:, x1] * fx[None, :, None]
    bot = x[y1][:, x0] * (1 - fx[None, :, None]) \
        + x[y1][:, x1] * fx[None, :, None]
    ref = top * (1 - fy[:, None, None]) + bot * fy[:, None, None]
    assert np.abs(out.astype(int)
                  - np.round(ref).astype(int)).max() <= 1


def test_normalize_matches_numpy():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    mean = np.array([100.0, 110.0, 120.0], np.float32)
    std = np.array([50.0, 55.0, 60.0], np.float32)
    out = native.normalize_u8(img, mean, std)
    expected = (img.astype(np.float32) - mean) / std
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_preprocessing_uses_native_transparently():
    # the Resize preprocessor output must be identical whichever
    # backend runs underneath (nearest is exact either way)
    from nicr_mtsa_tpu.data.preprocessing.resize import (
        resize_image_nearest,
    )
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 1000, (50, 70)).astype(np.uint16)
    out = resize_image_nearest(labels, 25, 35)
    assert out.shape == (25, 35)
    assert np.isin(out.ravel(), labels.ravel()).all()


def test_hsv_jitter_matches_numpy_exactly():
    # the C++ kernel must be a bit-exact pixelwise twin of the numpy
    # uint8-HSV chain (same branch order, round-half-even everywhere)
    from nicr_mtsa_tpu.data.preprocessing.augmentation import (
        adjust_hsv, rgb_to_hsv_uint8, hsv_to_rgb_uint8,
    )
    rng = np.random.default_rng(4)
    for case in range(6):
        img = rng.integers(0, 256, (41, 57, 3), dtype=np.uint8)
        h_off = int(rng.integers(-180, 181))
        s_off = int(rng.integers(-255, 256))
        v_off = int(rng.integers(-255, 256))
        out = native.hsv_jitter_u8(img, h_off, s_off, v_off)
        assert out is not None
        hsv = rgb_to_hsv_uint8(img)
        h = ((hsv[..., 0].astype(int) + h_off) % 180).astype(np.uint8)
        s = np.clip(hsv[..., 1].astype(int) + s_off, 0, 255).astype(np.uint8)
        v = np.clip(hsv[..., 2].astype(int) + v_off, 0, 255).astype(np.uint8)
        expected = hsv_to_rgb_uint8(np.stack([h, s, v], axis=2))
        np.testing.assert_array_equal(
            out, expected, err_msg=f'case {case} offsets '
                                   f'{h_off}/{s_off}/{v_off}')
        # and the public entry point dispatches to the same result
        np.testing.assert_array_equal(
            adjust_hsv(img, h_off, s_off, v_off), expected)


def test_hsv_jitter_gray_and_extremes():
    # v == 0 (black), diff == 0 (gray), saturated channels: the
    # integer-division and branch-order corner cases
    from nicr_mtsa_tpu.data.preprocessing.augmentation import (
        rgb_to_hsv_uint8, hsv_to_rgb_uint8,
    )
    img = np.zeros((4, 4, 3), np.uint8)
    img[0] = [0, 0, 0]
    img[1] = [128, 128, 128]
    img[2] = [255, 0, 0]
    img[3] = [0, 255, 255]
    for off in [(-7, 30, -30), (90, -255, 255), (0, 0, 0)]:
        out = native.hsv_jitter_u8(img, *off)
        hsv = rgb_to_hsv_uint8(img)
        h = ((hsv[..., 0].astype(int) + off[0]) % 180).astype(np.uint8)
        s = np.clip(hsv[..., 1].astype(int) + off[1], 0, 255)
        v = np.clip(hsv[..., 2].astype(int) + off[2], 0, 255)
        expected = hsv_to_rgb_uint8(
            np.stack([h, s.astype(np.uint8), v.astype(np.uint8)], 2))
        np.testing.assert_array_equal(out, expected, err_msg=str(off))
