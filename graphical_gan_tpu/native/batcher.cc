// Native host-side batch assembly: multithreaded row gather.
//
// The reference assembles every minibatch with numpy fancy indexing over a
// shuffled permutation (tflib/mnist.py:49-64 and the other loaders) — a
// single-threaded strided memcpy on the host.  For large rows (celebA:
// 12,288 B, chairs videos: 380 kB) that gather is the host input
// bottleneck once the device step is fast.  This kernel does the same
// gather with N worker threads, each memcpy-ing a contiguous slice of the
// output rows; dtype-agnostic (rows are bytes).
//
// Exposed via ctypes (native/batcher_ext.py) with a numpy fallback, like
// the moving-MNIST synthesizer.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

void gather_slice(const uint8_t* src, const int64_t* idx, uint8_t* dst,
                  int64_t begin, int64_t end, int64_t row_bytes) {
  for (int64_t i = begin; i < end; ++i) {
    std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes,
                static_cast<size_t>(row_bytes));
  }
}

}  // namespace

extern "C" {

// dst[i, :] = src[idx[i], :] for i in [0, n_out); rows are row_bytes bytes.
// idx values must be valid row numbers of src (the Python wrapper checks).
void gather_rows(const uint8_t* src, const int64_t* idx, uint8_t* dst,
                 int64_t n_out, int64_t row_bytes, int32_t n_threads) {
  if (n_out <= 0 || row_bytes <= 0) return;
  if (n_threads < 1) n_threads = 1;
  // Below ~1 MiB of traffic thread spawn overhead dominates; stay serial.
  const int64_t total = n_out * row_bytes;
  if (n_threads == 1 || total < (int64_t{1} << 20)) {
    gather_slice(src, idx, dst, 0, n_out, row_bytes);
    return;
  }
  if (n_threads > n_out) n_threads = static_cast<int32_t>(n_out);
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  const int64_t per = (n_out + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    const int64_t begin = t * per;
    const int64_t end = begin + per < n_out ? begin + per : n_out;
    if (begin >= end) break;
    workers.emplace_back(gather_slice, src, idx, dst, begin, end, row_bytes);
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
