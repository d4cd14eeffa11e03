// lfm_data: native host-side batch assembly for the TPU data pipeline.
//
// The per-step hot path of the host loader — uint8 HWC decode output ->
// float32 [-1,1] normalize, optional horizontal flip, square crop, batch
// stacking — implemented in C++ with OpenMP-parallel loops. This is the
// TPU-native equivalent of the native work torch's DataLoader workers +
// vectorized torchvision transforms do for the reference
// (reference train_flow_latent.py:62-69, datasets_prep/__init__.py).
//
// Exposed via a C ABI consumed through ctypes (lfm_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// uint8 HWC -> float32 in [-1,1]; flip[i] != 0 mirrors item i horizontally.
// src: (n, h, w, c) contiguous; dst: same shape float32.
void lfm_normalize_batch(const uint8_t* src, float* dst, int64_t n, int64_t h,
                         int64_t w, int64_t c, const uint8_t* flip) {
  const float scale = 1.0f / 127.5f;
  const int64_t row = w * c;
  const int64_t img = h * row;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* s = src + i * img;
    float* d = dst + i * img;
    const bool f = flip && flip[i];
    for (int64_t y = 0; y < h; ++y) {
      const uint8_t* srow = s + y * row;
      float* drow = d + y * row;
      if (!f) {
        for (int64_t k = 0; k < row; ++k) drow[k] = srow[k] * scale - 1.0f;
      } else {
        for (int64_t x = 0; x < w; ++x) {
          const uint8_t* sp = srow + (w - 1 - x) * c;
          float* dp = drow + x * c;
          for (int64_t ch = 0; ch < c; ++ch) dp[ch] = sp[ch] * scale - 1.0f;
        }
      }
    }
  }
}

// Per-item square crop then normalize+flip.
// src: (n, h, w, c) uint8; dst: (n, size, size, c) float32.
void lfm_crop_normalize_batch(const uint8_t* src, float* dst, int64_t n,
                              int64_t h, int64_t w, int64_t c, int64_t size,
                              const int32_t* tops, const int32_t* lefts,
                              const uint8_t* flip) {
  const float scale = 1.0f / 127.5f;
  const int64_t srow = w * c;
  const int64_t simg = h * srow;
  const int64_t drow = size * c;
  const int64_t dimg = size * drow;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* s = src + i * simg + tops[i] * srow + lefts[i] * c;
    float* d = dst + i * dimg;
    const bool f = flip && flip[i];
    for (int64_t y = 0; y < size; ++y) {
      const uint8_t* sr = s + y * srow;
      float* dr = d + y * drow;
      if (!f) {
        for (int64_t k = 0; k < drow; ++k) dr[k] = sr[k] * scale - 1.0f;
      } else {
        for (int64_t x = 0; x < size; ++x) {
          const uint8_t* sp = sr + (size - 1 - x) * c;
          float* dp = dr + x * c;
          for (int64_t ch = 0; ch < c; ++ch) dp[ch] = sp[ch] * scale - 1.0f;
        }
      }
    }
  }
}

// One-hot a (n, h, w) int32 label map into (n, h, w, k) float32.
// The semantic-synthesis cond path (train_flow_latent_semantic_syn.py:174-176)
// does this per batch on potentially 183-class COCO maps.
void lfm_one_hot(const int32_t* labels, float* dst, int64_t n, int64_t hw,
                 int64_t k) {
  const int64_t total = n * hw;
  std::memset(dst, 0, sizeof(float) * total * k);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < total; ++i) {
    int32_t v = labels[i];
    if (v >= 0 && v < k) dst[i * k + v] = 1.0f;
  }
}

}  // extern "C"
