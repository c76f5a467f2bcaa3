"""ctypes bindings for the native host-preprocessing library.

Builds `native/libmtsa_preproc.so` on demand (g++ via make) and loads
it; every entry point has a numpy fallback, so the library is a pure
acceleration (set MTSA_NATIVE=0 to disable). Semantics are pinned to
the numpy implementations in data/preprocessing/resize.py and tested
for exact (nearest) / near-exact (bilinear) agreement."""
import ctypes
import os
import subprocess
from typing import Optional

import numpy as np


_LIB = None
_TRIED = False


def _repo_native_dir() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(os.path.dirname(here), '..', 'native')


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True

    if os.environ.get('MTSA_NATIVE', '1') == '0':
        return None

    native_dir = os.path.normpath(_repo_native_dir())
    so_path = os.path.join(native_dir, 'libmtsa_preproc.so')
    # always run make: it is a no-op when the .so is fresh and rebuilds
    # it when mtsa_preproc.cpp gained entry points since the last build
    try:
        subprocess.run(['make', '-C', native_dir], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.isfile(so_path):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    lib.nearest_resize.argtypes = [u8p, u8p, i, i, i, i, i, i]
    lib.bilinear_resize_u8.argtypes = [u8p, u8p, i, i, i, i, i]
    lib.normalize_u8_to_f32.argtypes = [u8p, f32p, i, i, f32p, f32p]
    lib.hsv_jitter_u8.argtypes = [u8p, u8p, ctypes.c_int64, i, i, i]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _u8(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def nearest_resize(value: np.ndarray, height: int, width: int
                   ) -> Optional[np.ndarray]:
    """Native nearest resize (any dtype, HW[C]); None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    value = np.ascontiguousarray(value)
    h, w = value.shape[:2]
    channels = 1 if value.ndim == 2 else int(np.prod(value.shape[2:]))
    out_shape = (height, width) + value.shape[2:]
    dst = np.empty(out_shape, dtype=value.dtype)
    lib.nearest_resize(_u8(value.view(np.uint8)), _u8(dst.view(np.uint8)),
                       h, w, height, width, channels,
                       value.dtype.itemsize)
    return dst


def bilinear_resize_u8(value: np.ndarray, height: int, width: int
                       ) -> Optional[np.ndarray]:
    """Native bilinear resize for uint8 HWC; None if unavailable."""
    lib = _load()
    if lib is None or value.dtype != np.uint8:
        return None
    value = np.ascontiguousarray(value)
    h, w = value.shape[:2]
    channels = 1 if value.ndim == 2 else value.shape[2]
    dst = np.empty((height, width) + value.shape[2:], np.uint8)
    lib.bilinear_resize_u8(_u8(value), _u8(dst), h, w, height, width,
                           channels)
    return dst


def hsv_jitter_u8(value: np.ndarray, h_offset: int, s_offset: int,
                  v_offset: int) -> Optional[np.ndarray]:
    """Native uint8-HSV-space jitter of an RGB HWC image (pixelwise
    twin of data.preprocessing.augmentation.adjust_hsv); None if
    unavailable."""
    lib = _load()
    if (lib is None or value.dtype != np.uint8
            or value.ndim != 3 or value.shape[-1] != 3
            or not hasattr(lib, 'hsv_jitter_u8')):
        return None
    value = np.ascontiguousarray(value)
    dst = np.empty_like(value)
    lib.hsv_jitter_u8(_u8(value), _u8(dst),
                      ctypes.c_int64(value.size // 3),
                      int(h_offset), int(s_offset), int(v_offset))
    return dst


def normalize_u8(value: np.ndarray, mean: np.ndarray, std: np.ndarray
                 ) -> Optional[np.ndarray]:
    """Native (x - mean)/std for uint8 HWC; None if unavailable."""
    lib = _load()
    if lib is None or value.dtype != np.uint8:
        return None
    value = np.ascontiguousarray(value)
    channels = value.shape[-1] if value.ndim == 3 else 1
    n_pixels = value.size // channels
    dst = np.empty(value.shape, np.float32)
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.normalize_u8_to_f32(
        _u8(value), dst.ctypes.data_as(f32p), n_pixels, channels,
        mean32.ctypes.data_as(f32p), std32.ctypes.data_as(f32p))
    return dst
