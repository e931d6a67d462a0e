// Native threaded batch sampler for the training dataloader.
//
// The Stage-2 loader gathers 16 random pixels from ~9 mmap'd npy modalities
// for 256 image pairs per iteration (`vidloader.py` read_raw). Per-item
// numpy fancy indexing pays python/dispatch overhead per modality x item;
// this kernel fuses the whole batch gather into one threaded pass over the
// mmap'd buffers (the TPU-native equivalent of the reference's worker-pool
// dataloader: the host side is IO/gather-bound, not compute-bound).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread batch_sampler.cpp -o libbatch_sampler.so

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) & 1u;
  uint32_t exp = (uint32_t)(h >> 10) & 0x1fu;
  uint32_t man = (uint32_t)h & 0x3ffu;
  uint32_t f;
  if (exp == 0) {
    if (man == 0) {
      f = sign << 31;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while ((man & 0x400u) == 0) {
        man <<= 1;
        exp--;
      }
      man &= 0x3ffu;
      f = (sign << 31) | (exp << 23) | (man << 13);
    }
  } else if (exp == 31) {
    f = (sign << 31) | (0xffu << 23) | (man << 13);
  } else {
    f = (sign << 31) | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &f, sizeof(out));
  return out;
}

template <typename SrcT>
void gather_impl(const SrcT* src, int64_t T, int64_t H, int64_t W, int64_t C,
                 const int32_t* frame_ids, const int32_t* xy, int64_t n_items,
                 int64_t n_px, float* out, int n_threads) {
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t it = lo; it < hi; ++it) {
      const int64_t f = frame_ids[it];
      const SrcT* frame = src + f * H * W * C;
      const int32_t* xy_it = xy + it * n_px * 2;
      float* out_it = out + it * n_px * C;
      for (int64_t p = 0; p < n_px; ++p) {
        const int64_t x = xy_it[p * 2 + 0];
        const int64_t y = xy_it[p * 2 + 1];
        const SrcT* px = frame + (y * W + x) * C;
        float* dst = out_it + p * C;
        for (int64_t c = 0; c < C; ++c) {
          if constexpr (sizeof(SrcT) == 2) {
            dst[c] = half_to_float((uint16_t)px[c]);
          } else {
            dst[c] = (float)px[c];
          }
        }
      }
    }
  };
  if (n_threads <= 1 || n_items < 4) {
    worker(0, n_items);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n_items + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min(n_items, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// src: (T, H, W, C) float16 buffer; frame_ids: (n_items,); xy: (n_items, n_px, 2)
// int32 (x, y); out: (n_items, n_px, C) float32.
void gather_pixels_f16(const uint16_t* src, int64_t T, int64_t H, int64_t W,
                       int64_t C, const int32_t* frame_ids, const int32_t* xy,
                       int64_t n_items, int64_t n_px, float* out,
                       int n_threads) {
  gather_impl<uint16_t>(src, T, H, W, C, frame_ids, xy, n_items, n_px, out,
                        n_threads);
}

void gather_pixels_f32(const float* src, int64_t T, int64_t H, int64_t W,
                       int64_t C, const int32_t* frame_ids, const int32_t* xy,
                       int64_t n_items, int64_t n_px, float* out,
                       int n_threads) {
  gather_impl<float>(src, T, H, W, C, frame_ids, xy, n_items, n_px, out,
                     n_threads);
}

}  // extern "C"
