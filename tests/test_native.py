"""Native C++ data-kernel parity tests vs PIL/numpy references."""

import numpy as np
import pytest
from PIL import Image

from psd_tpu.data import native


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)


def test_native_library_built():
    assert native.HAVE_NATIVE, "liblimuc_io.so should build in this image"


@pytest.mark.parametrize("shape,out", [
    ((120, 160), (64, 80)),     # downscale
    ((64, 64), (224, 224)),     # upscale
    ((100, 37), (224, 224)),    # odd aspect upscale
    ((768, 1024), (256, 256)),  # big downscale (anti-aliased path)
    ((224, 224), (224, 224)),   # identity
])
def test_resize_is_pil_byte_exact(shape, out):
    """Native resize reproduces Pillow's BILINEAR byte-for-byte (fixed-point
    convolution resampler, anti-aliased on downscale). This is load-bearing:
    the loader feeds CLIP/SD preprocessing through it, and the reference's
    preprocessing is PIL (datamodule_ip.py:81-99)."""
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (*shape, 3), dtype=np.uint8)
    oh, ow = out
    ours = native.resize_bilinear(src, oh, ow)
    ref = np.asarray(Image.fromarray(src).resize((ow, oh), Image.BILINEAR))
    np.testing.assert_array_equal(ours, ref)


def test_normalize_fused(img):
    mean = (0.5, 0.5, 0.5)
    std = (0.5, 0.5, 0.5)
    ours = native.normalize(img, mean, std)
    ref = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_to_uint8_roundtrip():
    f = np.linspace(-0.2, 1.2, 300, dtype=np.float32).reshape(10, 10, 3)
    ours = native.to_uint8(f)
    ref = (np.clip(f, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_hflip(img):
    np.testing.assert_array_equal(native.hflip(img), img[:, ::-1])


def test_rotate_zero_is_identity(img):
    np.testing.assert_array_equal(native.rotate_nearest(img, 0.0), img)


def test_rotate_small_angle_mostly_matches_pil(img):
    ours = native.rotate_nearest(img, 5.0)
    ref = np.asarray(Image.fromarray(img).rotate(5.0, resample=Image.NEAREST))
    # nearest-neighbor rounding at pixel boundaries differs slightly; the
    # overwhelming majority of pixels must agree exactly
    agree = (ours == ref).mean()
    assert agree > 0.85, agree


def test_write_bmp_roundtrip(tmp_path, img):
    p = tmp_path / "out.bmp"
    native.write_bmp(p, img)
    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, img)
