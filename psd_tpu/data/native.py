"""ctypes bindings for the native host-side data kernels (native/limuc_io.cpp).

Falls back to numpy/PIL implementations when the shared library has not
been built (scripts/build_native.sh), so the framework stays importable on
any machine; `HAVE_NATIVE` reports which path is active.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).resolve().parent.parent.parent / "native" / "liblimuc_io.so"
_SRC_PATH = _LIB_PATH.parent / "limuc_io.cpp"

_lib: Optional[ctypes.CDLL] = None


def _try_build() -> bool:
    if not _SRC_PATH.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC_PATH), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _try_build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.resize_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, u8p, ctypes.c_int,
                                       ctypes.c_int]
    lib.normalize_u8_to_f32.argtypes = [u8p, f32p, ctypes.c_int, ctypes.c_int,
                                        f32p, f32p, ctypes.c_float]
    lib.f32_to_u8.argtypes = [f32p, u8p, ctypes.c_long]
    lib.hflip_u8.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.rotate_nearest_u8.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_float]
    lib.write_bmp.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int]
    lib.write_bmp.restype = ctypes.c_int
    _lib = lib
    return lib


HAVE_NATIVE = _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """uint8 (H,W,C) → uint8 (oh,ow,C), PIL-BILINEAR-equivalent corners."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    lib = _load()
    if lib is None:
        from PIL import Image

        return np.asarray(
            Image.fromarray(img).resize((ow, oh), Image.BILINEAR)
        )
    out = np.empty((oh, ow, c), np.uint8)
    lib.resize_bilinear_u8(_u8ptr(img), h, w, c, _u8ptr(out), oh, ow)
    return out


def normalize(img_u8: np.ndarray, mean, std, scale: float = 1.0 / 255.0) -> np.ndarray:
    """Fused uint8 → float32 (x*scale − mean)/std."""
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, c = img_u8.shape
    lib = _load()
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if lib is None:
        return (img_u8.astype(np.float32) * scale - mean) / std
    out = np.empty((h, w, c), np.float32)
    lib.normalize_u8_to_f32(_u8ptr(img_u8), _f32ptr(out), h * w, c,
                            _f32ptr(mean), _f32ptr(std), scale)
    return out


def to_uint8(img_f32: np.ndarray) -> np.ndarray:
    img_f32 = np.ascontiguousarray(img_f32, np.float32)
    lib = _load()
    if lib is None:
        return (np.clip(img_f32, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    out = np.empty(img_f32.shape, np.uint8)
    lib.f32_to_u8(_f32ptr(img_f32), _u8ptr(out), img_f32.size)
    return out


def hflip(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    lib = _load()
    if lib is None:
        return img[:, ::-1].copy()
    out = np.empty_like(img)
    h, w, c = img.shape
    lib.hflip_u8(_u8ptr(img), _u8ptr(out), h, w, c)
    return out


def rotate_nearest(img: np.ndarray, degrees: float) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    lib = _load()
    if lib is None:
        from PIL import Image

        return np.asarray(
            Image.fromarray(img).rotate(degrees, resample=Image.NEAREST)
        )
    out = np.empty_like(img)
    h, w, c = img.shape
    lib.rotate_nearest_u8(_u8ptr(img), _u8ptr(out), h, w, c, degrees)
    return out


def write_bmp(path: str | Path, rgb_u8: np.ndarray) -> None:
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    h, w, _ = rgb_u8.shape
    lib = _load()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    if lib is None:
        from PIL import Image

        Image.fromarray(rgb_u8).save(path)
        return
    rc = lib.write_bmp(str(path).encode(), _u8ptr(rgb_u8), h, w)
    if rc != 0:
        raise IOError(f"write_bmp failed with code {rc}: {path}")
