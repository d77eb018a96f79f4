// Native data-generation runtime for hdmoe_tpu.
//
// The reference ships an empty data_collector placeholder
// (data_augmentation/data_collector.py, 0 LoC) and does all image prep in
// per-sample Python transforms inside the hot loop. Here the host-side batch
// assembly is native: a multithreaded C++ generator fills caller-provided
// uint8 NHWC buffers with procedural flower images (same construction as
// hdmoe_tpu/train/data.py:synthetic_flowers, with its own PRNG), so the
// Python training loop never touches per-pixel work.
//
// Built as a shared library (see native/Makefile) and bound via ctypes
// (hdmoe_tpu/train/native_data.py) with a pure-Python fallback.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Deterministic PCG32: seeded per image so batches are reproducible and
// order-independent regardless of thread scheduling.
struct Pcg32 {
  uint64_t state;
  uint64_t inc;
  explicit Pcg32(uint64_t seed, uint64_t seq = 0xda3e39cb94b95bdbULL) {
    state = 0u;
    inc = (seq << 1u) | 1u;
    next();
    state += seed;
    next();
  }
  uint32_t next() {
    uint64_t old = state;
    state = old * 6364136223846793005ULL + inc;
    uint32_t xorshifted = static_cast<uint32_t>(((old >> 18u) ^ old) >> 27u);
    uint32_t rot = static_cast<uint32_t>(old >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((-rot) & 31));
  }
  double uniform() { return next() * (1.0 / 4294967296.0); }
  double uniform(double lo, double hi) { return lo + (hi - lo) * uniform(); }
  int randint(int lo, int hi) {  // [lo, hi)
    return lo + static_cast<int>(uniform() * (hi - lo));
  }
  double gauss() {  // Box-Muller
    double u1 = uniform();
    double u2 = uniform();
    if (u1 < 1e-12) u1 = 1e-12;
    return std::sqrt(-2.0 * std::log(u1)) * std::cos(2.0 * M_PI * u2);
  }
};

void render_flower(uint8_t* out, int res, uint64_t seed, int index) {
  Pcg32 rs(seed * 100003ULL + static_cast<uint64_t>(index));
  const int n_petals = rs.randint(4, 9);
  const float phase = static_cast<float>(rs.uniform(0.0, 2.0 * M_PI));
  float fg[3], core_c[3], bg[3];
  for (float& v : fg) v = static_cast<float>(rs.uniform(0.3, 1.0));
  for (float& v : core_c) v = static_cast<float>(rs.uniform(0.5, 1.0));
  for (float& v : bg) v = static_cast<float>(rs.uniform(0.0, 0.45));

  const float half = res / 2.0f;
  const float inv_half = 1.0f / half;
  for (int y = 0; y < res; ++y) {
    const float dy = y - half;
    for (int x = 0; x < res; ++x) {
      const float dx = x - half;
      const float r = std::sqrt(dx * dx + dy * dy) * inv_half;
      const float theta = std::atan2(dy, dx);
      float petal = 0.55f + 0.35f * std::cos(n_petals * theta + phase);
      if (petal < 1e-3f) petal = 1e-3f;
      float flower = 1.0f - r / petal;
      if (flower < 0.0f) flower = 0.0f;
      if (flower > 1.0f) flower = 1.0f;
      flower = std::pow(flower, 0.7f);
      float core = 1.0f - r * (1.0f / 0.18f);
      if (core < 0.0f) core = 0.0f;
      if (core > 1.0f) core = 1.0f;
      uint8_t* px = out + (static_cast<size_t>(y) * res + x) * 3;
      const float one_minus_flower = 1.0f - flower;
      for (int c = 0; c < 3; ++c) {
        // cheap zero-mean sensor noise (uniform; the Python generator uses
        // gaussian — both are ~2% amplitude and visually equivalent)
        const float noise = (static_cast<float>(rs.uniform()) - 0.5f) * 0.07f;
        float v = flower * fg[c] + core * core_c[c] + one_minus_flower * bg[c] + noise;
        if (v < 0.0f) v = 0.0f;
        if (v > 1.0f) v = 1.0f;
        px[c] = static_cast<uint8_t>(v * 255.0f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Fill `out` (batch*res*res*3 uint8, NHWC) with images for the given sample
// indices, using `n_threads` workers (0 => hardware concurrency).
void hdmoe_generate_batch(uint8_t* out, const int64_t* indices, int batch,
                          int res, uint64_t seed, int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > batch) n_threads = batch;
  const size_t img_bytes = static_cast<size_t>(res) * res * 3;
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([=]() {
      for (int i = t; i < batch; i += n_threads) {
        render_flower(out + img_bytes * i, res, seed,
                      static_cast<int>(indices[i]));
      }
    });
  }
  for (auto& w : workers) w.join();
}

// Version marker for the ctypes binding sanity check.
int hdmoe_datagen_abi_version() { return 1; }

}  // extern "C"
