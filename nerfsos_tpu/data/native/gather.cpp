// Threaded host-side gather kernels for the data pipeline.
//
// The reference hides data-loading latency behind 8 torch DataLoader worker
// PROCESSES (run_nerf.py:409-419). This is the TPU-native replacement's native
// layer: the two hot host operations — random row gather from the flattened
// ray pool (~26M rows for LLFF flower) and strided patch crops — as
// thread-parallel memcpy loops over the memory-mapped .npy artifacts.
// Exposed via ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread gather.cpp -o libgather.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

void parallel_for(int64_t n, int n_threads, const std::function<void(int64_t, int64_t)>& fn) {
  n_threads = static_cast<int>(std::max<int64_t>(1, std::min<int64_t>(n_threads, n)));
  if (n_threads == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t a = t * chunk;
    int64_t b = std::min<int64_t>(a + chunk, n);
    if (a >= b) break;
    threads.emplace_back(fn, a, b);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// dst[i] = src[idx[i]] for fixed-size rows.
// src: [n_src, row_bytes]; dst: [n, row_bytes]; idx: [n].
void gather_rows(const char* src, char* dst, const int64_t* idx, int64_t n,
                 int64_t row_bytes, int n_threads) {
  parallel_for(n, n_threads, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) {
      std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes, row_bytes);
    }
  });
}

// Strided patch crop: for each batch item b, copy a P x P window starting at
// (h_idx[b], w_idx[b]) of image img_idx[b], strided by `stride` pixels.
// src: [n_imgs, H, W, px_bytes]; dst: [batch, P, P, px_bytes].
void gather_patches(const char* src, char* dst, const int64_t* img_idx,
                    const int64_t* h_idx, const int64_t* w_idx, int64_t batch,
                    int64_t H, int64_t W, int64_t P, int64_t stride,
                    int64_t px_bytes, int n_threads) {
  const int64_t img_bytes = H * W * px_bytes;
  const int64_t row_bytes = W * px_bytes;
  parallel_for(batch * P, n_threads, [&](int64_t a, int64_t b) {
    for (int64_t k = a; k < b; ++k) {
      const int64_t bi = k / P;
      const int64_t r = k % P;
      const char* img = src + img_idx[bi] * img_bytes;
      const char* src_row = img + (h_idx[bi] + r * stride) * row_bytes + w_idx[bi] * px_bytes;
      char* dst_px = dst + (bi * P + r) * P * px_bytes;
      if (stride == 1) {
        std::memcpy(dst_px, src_row, P * px_bytes);
      } else {
        for (int64_t c = 0; c < P; ++c) {
          std::memcpy(dst_px + c * px_bytes, src_row + c * stride * px_bytes, px_bytes);
        }
      }
    }
  });
}

}  // extern "C"
