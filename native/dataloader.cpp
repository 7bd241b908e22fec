// kanvit native host data pipeline.
//
// The reference feeds its model from 8 torchvision DataLoader worker
// processes doing per-sample PIL transforms (reference train.py:99-117).
// kanvit's host pipeline is a single fused multithreaded pass over the
// batch: gather (shuffled indices) + random horizontal flip + pad-4 random
// crop + per-channel normalization, writing the XLA-ready (N, C, H, W)
// float32 buffer directly — no intermediate copies, no worker processes.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).
// Randomness (flip flags, crop offsets) is drawn by the Python caller from
// its seeded generator, so the numpy and native backends produce
// bit-identical batches for the same seed.
//
// Build: make -C native   (or kanvit.data.native builds it on first use)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct AugArgs {
  const float* images;    // (n_total, C, H, W)
  const int64_t* indices; // (n_batch,)
  int n_batch, C, H, W;
  const uint8_t* flip;    // (n_batch,) 0/1, may be null
  const int32_t* oy;      // (n_batch,) crop offsets in [0, 2*pad], may be null
  const int32_t* ox;
  int pad;
  const float* mean;      // (C,), may be null
  const float* stdv;      // (C,)
  float* out;             // (n_batch, C, H, W)
};

// Process one sample: gather -> flip -> pad/crop -> normalize, fused.
void process_sample(const AugArgs& a, int n) {
  const int C = a.C, H = a.H, W = a.W;
  const int64_t src_idx = a.indices[n];
  const float* src = a.images + src_idx * (int64_t)C * H * W;
  float* dst = a.out + (int64_t)n * C * H * W;

  const bool do_flip = a.flip && a.flip[n];
  const bool do_crop = a.oy != nullptr;
  // Crop window in padded coordinates: out(y, x) = padded(y + oy, x + ox)
  // = src(y + oy - pad, x + ox - pad), zero outside.
  const int sy = do_crop ? a.oy[n] - a.pad : 0;
  const int sx = do_crop ? a.ox[n] - a.pad : 0;

  for (int c = 0; c < C; ++c) {
    const float m = a.mean ? a.mean[c] : 0.0f;
    const float inv = a.mean ? 1.0f / a.stdv[c] : 1.0f;
    const float zero_norm = a.mean ? (0.0f - m) * inv : 0.0f;
    const float* sc = src + (int64_t)c * H * W;
    float* dc = dst + (int64_t)c * H * W;
    for (int y = 0; y < H; ++y) {
      const int yy = y + sy;
      float* drow = dc + (int64_t)y * W;
      if (yy < 0 || yy >= H) {
        std::fill(drow, drow + W, zero_norm);
        continue;
      }
      const float* srow = sc + (int64_t)yy * W;
      for (int x = 0; x < W; ++x) {
        const int xs = x + sx;
        float v;
        if (xs < 0 || xs >= W) {
          v = 0.0f;
        } else {
          // Flip applies to the source image before padding/cropping
          // (torchvision composes flip -> crop in that order).
          v = do_flip ? srow[W - 1 - xs] : srow[xs];
        }
        drow[x] = (v - m) * inv;
      }
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success.
int kanvit_augment_batch(const float* images, const int64_t* indices,
                         int n_batch, int C, int H, int W,
                         const uint8_t* flip, const int32_t* oy,
                         const int32_t* ox, int pad, const float* mean,
                         const float* stdv, float* out, int n_threads) {
  AugArgs a{images, indices, n_batch, C, H, W, flip, oy, ox, pad,
            mean, stdv, out};
  if (n_threads <= 1 || n_batch < 16) {
    for (int n = 0; n < n_batch; ++n) process_sample(a, n);
    return 0;
  }
  n_threads = std::min(n_threads, n_batch);
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&a, t, n_threads] {
      for (int n = t; n < a.n_batch; n += n_threads) process_sample(a, n);
    });
  }
  for (auto& th : pool) th.join();
  return 0;
}

// Parse raw MNIST idx image bytes (already read from file, magic-checked by
// caller) into a float32 (n, 1, rows, cols) buffer scaled to [0, 1].
void kanvit_decode_u8_to_f32(const uint8_t* src, int64_t count, float scale,
                             float* dst, int n_threads) {
  if (n_threads <= 1 || count < (1 << 16)) {
    for (int64_t i = 0; i < count; ++i) dst[i] = src[i] * scale;
    return;
  }
  std::vector<std::thread> pool;
  const int64_t chunk = (count + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = t * chunk, hi = std::min(count, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=] {
      for (int64_t i = lo; i < hi; ++i) dst[i] = src[i] * scale;
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
