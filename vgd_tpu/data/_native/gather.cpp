// Native batch gather for the image input pipeline.
//
// The hot host-side op when feeding the TPU is assembling a shuffled
// minibatch from the decoded uint8 memmap cache: out[i] = data[idx[i]] for
// B rows of H*W*C bytes. The reference does the analogous work with
// torchvision transforms inside DataLoader worker processes
// (dataset_code.py:176); here it is a threaded C++ memcpy gather exposed via
// ctypes (pybind11 is not available in this image), overlapping page-in and
// copy across threads. Falls back to numpy fancy indexing when the shared
// library is absent (vgd_tpu/data/native.py).
//
// Build: python -m vgd_tpu.data.native  (invokes g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather `batch` rows of `row_bytes` each from `src` at positions `indices`
// into the contiguous `dst`, using up to `n_threads` threads.
void gather_rows(const uint8_t* src, const int64_t* indices, int64_t batch,
                 int64_t row_bytes, uint8_t* dst, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > batch) n_threads = static_cast<int>(batch);
  auto worker = [&](int64_t start, int64_t stop) {
    for (int64_t i = start; i < stop; ++i) {
      std::memcpy(dst + i * row_bytes, src + indices[i] * row_bytes,
                  static_cast<size_t>(row_bytes));
    }
  };
  if (n_threads == 1) {
    worker(0, batch);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (batch + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t start = t * chunk;
    int64_t stop = start + chunk < batch ? start + chunk : batch;
    if (start >= stop) break;
    threads.emplace_back(worker, start, stop);
  }
  for (auto& th : threads) th.join();
}

// uint8 -> float32 [-1, 1] conversion fused with the gather (for host-side
// consumers; the TPU path keeps uint8 on the wire and converts on-device).
void gather_rows_signed_f32(const uint8_t* src, const int64_t* indices,
                            int64_t batch, int64_t row_elems, float* dst,
                            int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > batch) n_threads = static_cast<int>(batch);
  auto worker = [&](int64_t start, int64_t stop) {
    for (int64_t i = start; i < stop; ++i) {
      const uint8_t* s = src + indices[i] * row_elems;
      float* d = dst + i * row_elems;
      for (int64_t j = 0; j < row_elems; ++j) {
        d[j] = s[j] * (1.0f / 127.5f) - 1.0f;
      }
    }
  };
  if (n_threads == 1) {
    worker(0, batch);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (batch + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t start = t * chunk;
    int64_t stop = start + chunk < batch ? start + chunk : batch;
    if (start >= stop) break;
    threads.emplace_back(worker, start, stop);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
