// Native moving-MNIST video synthesizer.
//
// C++ implementation of the bouncing-digit synthesis used by the SSGAN
// input pipeline (rebuild of tflib/simple_moving_mnist.py:9-84): per sample,
// a uniform start position and direction, constant speed 0.1 of the canvas
// per step, reflection at the walls, and the 28x28 digit pasted at the
// integer-quantized position of each frame (single digit => plain store is
// the reference's max-overlap).
//
// The reference synthesized a WHOLE EPOCH up front with interpreted Python
// loops; the Python rebuild vectorizes with numpy; this native path removes
// the remaining numpy temporaries and threads the batch across cores so
// video batch synthesis stays off the training critical path at TPU rates.
//
// Exposed as a C ABI for ctypes (no pybind11 in this toolchain):
//   synthesize_moving_mnist(digits[b,28,28], b, seq_len, seed,
//                           out[b,seq_len,64,64])
// RNG is a per-sample splitmix64/xoshiro-free LCG64 stream seeded from
// (seed, sample index) — deterministic and order-independent across
// threads.  The trajectory LAW matches the reference; the underlying RNG
// stream intentionally does not reproduce numpy bit-for-bit.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kImage = 64;
constexpr int kDigit = 28;
constexpr int kCanvas = kImage - kDigit;
constexpr double kStep = 0.1;
constexpr double kTwoPi = 6.283185307179586476925286766559;

// splitmix64: fast, high-quality 64-bit mixer; one independent stream per
// (seed, sample).
struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t s) : state(s) {}
  uint64_t next() {
    uint64_t z = (state += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  }
  // uniform double in [0, 1)
  double uniform() { return (next() >> 11) * 0x1.0p-53; }
};

void synth_one(const float* digit, int seq_len, uint64_t seed, int index,
               float* out) {
  SplitMix64 rng(seed * 0x9E3779B97F4A7C15ull + uint64_t(index) + 1);

  double y = rng.uniform();
  double x = rng.uniform();
  double theta = rng.uniform() * kTwoPi;
  double vy = std::sin(theta);
  double vx = std::cos(theta);

  std::memset(out, 0, sizeof(float) * size_t(seq_len) * kImage * kImage);

  for (int t = 0; t < seq_len; ++t) {
    // step then reflect (tflib/simple_moving_mnist.py:24-41: the position is
    // recorded AFTER the first step)
    y += vy * kStep;
    x += vx * kStep;
    if (x <= 0.0) { x = 0.0; vx = -vx; }
    if (x >= 1.0) { x = 1.0; vx = -vx; }
    if (y <= 0.0) { y = 0.0; vy = -vy; }
    if (y >= 1.0) { y = 1.0; vy = -vy; }

    const int top = int(kCanvas * y);
    const int left = int(kCanvas * x);
    float* frame = out + size_t(t) * kImage * kImage;
    for (int r = 0; r < kDigit; ++r) {
      std::memcpy(frame + size_t(top + r) * kImage + left,
                  digit + size_t(r) * kDigit, sizeof(float) * kDigit);
    }
  }
}

}  // namespace

extern "C" {

// digits: [b, 28, 28] float32; out: [b, seq_len, 64, 64] float32.
void synthesize_moving_mnist(const float* digits, int b, int seq_len,
                             uint64_t seed, float* out) {
  const int hw = std::max(1u, std::thread::hardware_concurrency());
  const int n_threads = b < hw ? (b > 0 ? b : 1) : hw;
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int w = 0; w < n_threads; ++w) {
    threads.emplace_back([=]() {
      for (int i = w; i < b; i += n_threads) {
        synth_one(digits + size_t(i) * kDigit * kDigit, seq_len, seed, i,
                  out + size_t(i) * seq_len * kImage * kImage);
      }
    });
  }
  for (auto& t : threads) t.join();
}

int moving_mnist_abi_version() { return 1; }

}  // extern "C"
