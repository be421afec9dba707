// Native host-side data-path kernels for the LIMUC loader + augment factory.
//
// The TPU compute path is JAX/XLA; this library owns the CPU-hot inner
// loops around it (SURVEY.md §2.1: the reference leans on torchvision/PIL
// C code for the same work): bilinear resize, fused normalize (SD / CLIP /
// ImageNet in one pass), horizontal flip, rotation, float->uint8 image
// quantization, and a fast BMP writer for the augment factory's async
// output (the reference writes BMP for exactly this reason,
// inference_pipeline_ip_data_augment.py:434-498).
//
// Exposed as a plain C ABI consumed via ctypes (psd_tpu/data/native.py).
// Build: scripts/build_native.sh  →  native/liblimuc_io.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

namespace {

// ---- Pillow-exact BILINEAR resampling --------------------------------
// Mirrors Pillow's Resample.c convolution resampler bit-for-bit: center-
// aligned sampling ((xx + 0.5) * scale), triangle filter with support
// scaled by max(1, in/out) (anti-aliasing on downscale), per-output-pixel
// weights normalized in double then quantized to 22-bit fixed point, and
// a horizontal-then-vertical two-pass with uint8 requantization between
// passes. Byte parity with PIL is asserted by tests/test_native.py.

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow PRECISION_BITS

inline double bilinear_filter(double x) {
  if (x < 0.0) x = -x;
  return x < 1.0 ? 1.0 - x : 0.0;
}

inline uint8_t clip8(int in) {
  if (in >= (255 << kPrecisionBits)) return 255;
  if (in <= 0) return 0;
  return (uint8_t)(in >> kPrecisionBits);
}

// Per-output-pixel integer weights + source bounds (Pillow
// precompute_coeffs + normalize_coeffs_8bpc).
int precompute_coeffs(int in_size, int out_size, std::vector<int>& bounds,
                      std::vector<int>& kk) {
  const double scale = (double)in_size / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // bilinear support = 1
  const int ksize = (int)std::ceil(support) * 2 + 1;

  bounds.resize(out_size * 2);
  kk.resize((size_t)out_size * ksize);
  std::vector<double> wd(ksize);

  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    double ww = 0.0;
    const double ss = 1.0 / filterscale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    for (int x = 0; x < xmax; ++x) {
      const double w = bilinear_filter((x + xmin - center + 0.5) * ss);
      wd[x] = w;
      ww += w;
    }
    int* k = kk.data() + (size_t)xx * ksize;
    for (int x = 0; x < xmax; ++x) {
      const double kn = ww != 0.0 ? wd[x] / ww : wd[x];
      k[x] = (int)(kn < 0 ? -0.5 + kn * (1 << kPrecisionBits)
                          : 0.5 + kn * (1 << kPrecisionBits));
    }
    for (int x = xmax; x < ksize; ++x) k[x] = 0;
    bounds[xx * 2 + 0] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }
  return ksize;
}

}  // namespace

extern "C" {

// PIL-BILINEAR-exact resize of an interleaved uint8 image (H,W,C)->(OH,OW,C).
void resize_bilinear_u8(const uint8_t* src, int h, int w, int c,
                        uint8_t* dst, int oh, int ow) {
  std::vector<int> xb, xk, yb, yk;
  const int xks = precompute_coeffs(w, ow, xb, xk);
  const int yks = precompute_coeffs(h, oh, yb, yk);

  // horizontal pass: (h, w, c) -> (h, ow, c), requantized to uint8
  std::vector<uint8_t> tmp((size_t)h * ow * c);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + (size_t)y * w * c;
    uint8_t* orow = tmp.data() + (size_t)y * ow * c;
    for (int x = 0; x < ow; ++x) {
      const int xmin = xb[x * 2], xmax = xb[x * 2 + 1];
      const int* k = xk.data() + (size_t)x * xks;
      for (int ch = 0; ch < c; ++ch) {
        int ss = 1 << (kPrecisionBits - 1);
        for (int i = 0; i < xmax; ++i)
          ss += row[(size_t)(xmin + i) * c + ch] * k[i];
        orow[(size_t)x * c + ch] = clip8(ss);
      }
    }
  }
  // vertical pass: (h, ow, c) -> (oh, ow, c)
  for (int y = 0; y < oh; ++y) {
    const int ymin = yb[y * 2], ymax = yb[y * 2 + 1];
    const int* k = yk.data() + (size_t)y * yks;
    uint8_t* orow = dst + (size_t)y * ow * c;
    for (int x = 0; x < ow * c; ++x) {
      int ss = 1 << (kPrecisionBits - 1);
      for (int i = 0; i < ymax; ++i)
        ss += tmp[(size_t)(ymin + i) * ow * c + x] * k[i];
      orow[x] = clip8(ss);
    }
  }
}

// Fused uint8 -> float32 with per-channel affine normalization:
//   out = (u8 * scale - mean[ch]) / std[ch]
// scale = 1/255 covers [0,1]; SD uses mean .5 std .5; CLIP/ImageNet have
// their own constants. One pass instead of three numpy temporaries.
void normalize_u8_to_f32(const uint8_t* src, float* dst, int n_pixels, int c,
                         const float* mean, const float* stddev, float scale) {
  // out = p*(scale/std) - mean/std : one fused multiply-add per element,
  // plus a 256-entry per-channel LUT beats u8->f32 conversion cost.
  if (c == 3) {
    float lut[3][256];
    for (int ch = 0; ch < 3; ++ch) {
      const float a = scale / stddev[ch];
      const float b = mean[ch] / stddev[ch];
      for (int v = 0; v < 256; ++v) lut[ch][v] = v * a - b;
    }
    const long n = (long)n_pixels * 3;
    for (long i = 0; i < n; i += 3) {
      dst[i + 0] = lut[0][src[i + 0]];
      dst[i + 1] = lut[1][src[i + 1]];
      dst[i + 2] = lut[2][src[i + 2]];
    }
    return;
  }
  for (int i = 0; i < n_pixels; ++i) {
    const uint8_t* p = src + i * c;
    float* o = dst + i * c;
    for (int ch = 0; ch < c; ++ch) {
      o[ch] = (p[ch] * scale - mean[ch]) / stddev[ch];
    }
  }
}

// float32 [0,1] -> uint8 with round-half-up (matches psd_tpu.utils.image_io)
void f32_to_u8(const float* src, uint8_t* dst, long n) {
  for (long i = 0; i < n; ++i) {
    float v = src[i];
    v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
    dst[i] = (uint8_t)(v * 255.f + 0.5f);
  }
}

void hflip_u8(const uint8_t* src, uint8_t* dst, int h, int w, int c) {
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      std::memcpy(dst + (y * w + x) * c, src + (y * w + (w - 1 - x)) * c, c);
    }
  }
}

// Rotate by angle (degrees) about the image center, nearest-neighbor,
// same canvas (matches PIL rotate(expand=False, NEAREST) semantics).
void rotate_nearest_u8(const uint8_t* src, uint8_t* dst, int h, int w, int c,
                       float degrees) {
  const float rad = degrees * 3.14159265358979323846f / 180.f;
  const float cs = std::cos(rad), sn = std::sin(rad);
  const float cy = (h - 1) * 0.5f, cx = (w - 1) * 0.5f;
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      // inverse mapping: output pixel <- rotated source location
      const float dx = x - cx, dy = y - cy;
      const int sxi = (int)std::lround(cs * dx - sn * dy + cx);
      const int syi = (int)std::lround(sn * dx + cs * dy + cy);
      uint8_t* o = dst + (y * w + x) * c;
      if (sxi >= 0 && sxi < w && syi >= 0 && syi < h) {
        std::memcpy(o, src + (syi * w + sxi) * c, c);
      } else {
        std::memset(o, 0, c);
      }
    }
  }
}

// Minimal BMP (BITMAPINFOHEADER, 24bpp BGR bottom-up) writer. Returns 0 on
// success, nonzero on IO failure.
int write_bmp(const char* path, const uint8_t* rgb, int h, int w) {
  const int row_raw = w * 3;
  const int row_padded = (row_raw + 3) & ~3;
  const int data_size = row_padded * h;
  const int file_size = 54 + data_size;

  uint8_t header[54];
  std::memset(header, 0, sizeof(header));
  header[0] = 'B'; header[1] = 'M';
  auto put32 = [&](int off, uint32_t v) {
    header[off] = v & 0xff; header[off + 1] = (v >> 8) & 0xff;
    header[off + 2] = (v >> 16) & 0xff; header[off + 3] = (v >> 24) & 0xff;
  };
  put32(2, file_size);
  put32(10, 54);
  put32(14, 40);
  put32(18, (uint32_t)w);
  put32(22, (uint32_t)h);
  header[26] = 1;          // planes
  header[28] = 24;         // bpp
  put32(34, (uint32_t)data_size);

  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  if (std::fwrite(header, 1, 54, f) != 54) { std::fclose(f); return 2; }
  uint8_t* row = new uint8_t[row_padded];
  std::memset(row, 0, row_padded);
  for (int y = h - 1; y >= 0; --y) {  // bottom-up
    const uint8_t* src_row = rgb + y * w * 3;
    for (int x = 0; x < w; ++x) {     // RGB -> BGR
      row[x * 3 + 0] = src_row[x * 3 + 2];
      row[x * 3 + 1] = src_row[x * 3 + 1];
      row[x * 3 + 2] = src_row[x * 3 + 0];
    }
    if (std::fwrite(row, 1, row_padded, f) != (size_t)row_padded) {
      delete[] row; std::fclose(f); return 3;
    }
  }
  delete[] row;
  std::fclose(f);
  return 0;
}

}  // extern "C"
