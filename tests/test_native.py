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


def test_resize_matches_corner_aligned_reference(img):
    """Native resize is corner-aligned bilinear (no antialiasing — PIL's
    BILINEAR applies an area filter on downscale); compare to an exact
    numpy implementation of the same convention."""
    oh, ow = 64, 80
    ours = native.resize_bilinear(img, oh, ow)
    h, w, c = img.shape
    ys = np.linspace(0, h - 1, oh)
    xs = np.linspace(0, w - 1, ow)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    ref = (top * (1 - wy) + bot * wy + 0.5).astype(np.uint8)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1  # float32-vs-float64 rounding only


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
