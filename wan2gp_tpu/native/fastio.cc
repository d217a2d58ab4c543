// Native host-IO runtime for wan2gp_tpu (the analog of the reference's
// native load path: mmgp/safetensors2's C-backed tensor reads +
// torch's multithreaded dtype converts).  The TPU compute path is
// jax/XLA/Pallas; this covers the HOST side of checkpoint loading and
// media staging where single-threaded numpy is the bottleneck:
//   - wg_parallel_read: threaded pread() of a file region into a
//     caller buffer (cold-cache checkpoint page-in at NVMe bandwidth)
//   - wg_bf16_to_f32 / wg_f16_to_f32 / wg_f32_to_bf16: threaded dtype
//     conversion (round-to-nearest-even for the downcast)
//   - wg_u8_to_f32_scale: threaded pixel normalization (u8 -> a*x+b)
//   - wg_f32_to_u8: threaded clamp((x+1)*127.5) pixel quantization
//
// Plain C ABI (loaded via ctypes) — no CPython/pybind dependency.
// Build: g++ -O3 -march=native -shared -fPIC -pthread fastio.cc
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

// Run fn(lo, hi) over [0, n) split across `threads` workers.
template <typename Fn>
void parallel_for(long long n, int threads, Fn fn) {
  threads = std::max(1, threads);
  if (threads == 1 || n < (1 << 16)) {
    fn(0LL, n);
    return;
  }
  std::vector<std::thread> pool;
  long long chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    long long lo = (long long)t * chunk;
    long long hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=] { fn(lo, hi); });
  }
  for (auto &th : pool) th.join();
}

inline float bf16_to_f32_one(uint16_t v) {
  uint32_t u = (uint32_t)v << 16;
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

inline uint16_t f32_to_bf16_one(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  // round-to-nearest-even (matches jax/ml_dtypes)
  uint32_t rounding_bias = 0x7FFF + ((u >> 16) & 1);
  return (uint16_t)((u + rounding_bias) >> 16);
}

inline float f16_to_f32_one(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FF;
  uint32_t u;
  if (exp == 0) {
    if (mant == 0) {
      u = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(mant & 0x400)) {
        mant <<= 1;
        --exp;
      }
      mant &= 0x3FF;
      u = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 0x1F) {
    u = sign | 0x7F800000u | (mant << 13);
  } else {
    u = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

}  // namespace

extern "C" {

void wg_bf16_to_f32(const uint16_t *src, float *dst, long long n,
                    int threads) {
  parallel_for(n, threads, [=](long long lo, long long hi) {
    for (long long i = lo; i < hi; ++i) dst[i] = bf16_to_f32_one(src[i]);
  });
}

void wg_f32_to_bf16(const float *src, uint16_t *dst, long long n,
                    int threads) {
  parallel_for(n, threads, [=](long long lo, long long hi) {
    for (long long i = lo; i < hi; ++i) dst[i] = f32_to_bf16_one(src[i]);
  });
}

void wg_f16_to_f32(const uint16_t *src, float *dst, long long n,
                   int threads) {
  parallel_for(n, threads, [=](long long lo, long long hi) {
    for (long long i = lo; i < hi; ++i) dst[i] = f16_to_f32_one(src[i]);
  });
}

void wg_u8_to_f32_scale(const uint8_t *src, float *dst, long long n,
                        float scale, float shift, int threads) {
  parallel_for(n, threads, [=](long long lo, long long hi) {
    for (long long i = lo; i < hi; ++i)
      dst[i] = (float)src[i] * scale + shift;
  });
}

void wg_f32_to_u8(const float *src, uint8_t *dst, long long n,
                  float scale, float shift, int threads) {
  parallel_for(n, threads, [=](long long lo, long long hi) {
    for (long long i = lo; i < hi; ++i) {
      float v = src[i] * scale + shift;
      v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
      // nearbyintf = round-half-to-even, matching numpy's np.round
      dst[i] = (uint8_t)nearbyintf(v);
    }
  });
}

// Threaded pread of [offset, offset+nbytes) into dst.  Returns bytes
// read (== nbytes on success) or -1 on open failure.
long long wg_parallel_read(const char *path, long long offset,
                           long long nbytes, void *dst, int threads) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  threads = std::max(1, threads);
  long long chunk = (nbytes + threads - 1) / threads;
  // 8 MiB minimum per worker: below that thread overhead dominates
  const long long kMin = 8LL << 20;
  if (chunk < kMin) chunk = kMin;
  int workers = (int)((nbytes + chunk - 1) / chunk);
  std::vector<long long> got((size_t)std::max(workers, 1), 0);
  std::vector<std::thread> pool;
  for (int t = 0; t < workers; ++t) {
    long long lo = (long long)t * chunk;
    long long hi = std::min(nbytes, lo + chunk);
    pool.emplace_back([=, &got] {
      char *p = (char *)dst + lo;
      long long remain = hi - lo, off = offset + lo, done = 0;
      while (remain > 0) {
        ssize_t r = pread(fd, p + done, (size_t)remain, off + done);
        if (r <= 0) break;
        done += r;
        remain -= r;
      }
      got[(size_t)t] = done;
    });
  }
  long long total = 0;
  for (auto &th : pool) th.join();
  for (long long g : got) total += g;
  close(fd);
  return total;
}

int wg_version() { return 1; }

}  // extern "C"
