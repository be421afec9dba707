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

extern "C" {

// Bilinear resize of an interleaved uint8 image (H,W,C) -> (OH,OW,C).
void resize_bilinear_u8(const uint8_t* src, int h, int w, int c,
                        uint8_t* dst, int oh, int ow) {
  const float sy = (oh > 1) ? (float)(h - 1) / (float)(oh - 1) : 0.f;
  const float sx = (ow > 1) ? (float)(w - 1) / (float)(ow - 1) : 0.f;
  for (int y = 0; y < oh; ++y) {
    const float fy = y * sy;
    const int y0 = (int)fy;
    const int y1 = std::min(y0 + 1, h - 1);
    const float wy = fy - y0;
    for (int x = 0; x < ow; ++x) {
      const float fx = x * sx;
      const int x0 = (int)fx;
      const int x1 = std::min(x0 + 1, w - 1);
      const float wx = fx - x0;
      const uint8_t* p00 = src + (y0 * w + x0) * c;
      const uint8_t* p01 = src + (y0 * w + x1) * c;
      const uint8_t* p10 = src + (y1 * w + x0) * c;
      const uint8_t* p11 = src + (y1 * w + x1) * c;
      uint8_t* out = dst + (y * ow + x) * c;
      for (int ch = 0; ch < c; ++ch) {
        const float top = p00[ch] * (1.f - wx) + p01[ch] * wx;
        const float bot = p10[ch] * (1.f - wx) + p11[ch] * wx;
        const float v = top * (1.f - wy) + bot * wy;
        out[ch] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

// Fused uint8 -> float32 with per-channel affine normalization:
//   out = (u8 * scale - mean[ch]) / std[ch]
// scale = 1/255 covers [0,1]; SD uses mean .5 std .5; CLIP/ImageNet have
// their own constants. One pass instead of three numpy temporaries.
void normalize_u8_to_f32(const uint8_t* src, float* dst, int n_pixels, int c,
                         const float* mean, const float* stddev, float scale) {
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
