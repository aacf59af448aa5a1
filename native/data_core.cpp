// Native host-side data pipeline for tensornetworkforml_tpu.
//
// The reference's data layer is NumPy + torch DataLoader plumbing
// (reference TensorNetwork/data_generator.py); at production batch rates the
// host-side work (synthetic sample generation, feature-map embedding,
// pooling, epoch shuffling) competes with feeding the TPU. This library
// implements those paths in multithreaded C++ and is loaded via ctypes
// (tensornetworkforml_tpu/data/native.py); every entry point has a NumPy
// fallback, so the library is an accelerator, not a dependency.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libtnml_data.so data_core.cpp -lpthread

#include <cstdint>
#include <cmath>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

// splitmix64: seed expansion
static inline uint64_t splitmix64(uint64_t &state) {
  uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

// xoshiro256** per-thread PRNG
struct Xoshiro256 {
  uint64_t s[4];
  explicit Xoshiro256(uint64_t seed) {
    for (int i = 0; i < 4; ++i) s[i] = splitmix64(seed);
  }
  static inline uint64_t rotl(uint64_t x, int k) {
    return (x << k) | (x >> (64 - k));
  }
  inline uint64_t next() {
    uint64_t result = rotl(s[1] * 5, 7) * 9;
    uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  inline double uniform() {  // [0, 1)
    return (next() >> 11) * 0x1.0p-53;
  }
};

static int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n);
}

template <typename F>
static void parallel_for(int64_t n, F fn) {
  int nt = std::min<int64_t>(hw_threads(), std::max<int64_t>(1, n / 1024));
  if (nt <= 1) {
    fn(0, n, 0);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=] { fn(lo, hi, t); });
  }
  for (auto &th : threads) th.join();
}

}  // namespace

extern "C" {

// Noisy-diagonals dataset (semantics of reference data_generator.py:6-52):
// data = pattern*(1-sigma) + U[0,sigma], pattern is one of the two
// diagonals of a dim x dim image; labels in {0, 1}.
void tnml_diagonals_dataset(int64_t n_samples, int32_t dim, double sigma,
                            double prob_zero, uint64_t seed, double *out_data,
                            int32_t *out_labels) {
  parallel_for(n_samples, [=](int64_t lo, int64_t hi, int) {
    for (int64_t i = lo; i < hi; ++i) {
      Xoshiro256 rng(seed * 0x9E3779B97F4A7C15ULL + (uint64_t)i + 1);
      int32_t label = rng.uniform() < prob_zero ? 0 : 1;
      out_labels[i] = label;
      double *img = out_data + i * (int64_t)dim * dim;
      for (int r = 0; r < dim; ++r) {
        for (int c = 0; c < dim; ++c) {
          // label 1 -> main diagonal (np.eye), label 0 -> anti-diagonal
          double pat = (label == 1) ? (r == c ? 1.0 : 0.0)
                                    : (r + c == dim - 1 ? 1.0 : 0.0);
          img[r * dim + c] = pat * (1.0 - sigma) + rng.uniform() * sigma;
        }
      }
    }
  });
}

// psi feature map (reference data_generator.py:165-167):
// out[2*i] = sin(pi x_i / 2), out[2*i + 1] = cos(pi x_i / 2)
void tnml_psi_embed_f32(const float *x, int64_t count, float *out) {
  constexpr double kHalfPi = 1.5707963267948966;
  parallel_for(count, [=](int64_t lo, int64_t hi, int) {
    for (int64_t i = lo; i < hi; ++i) {
      double a = kHalfPi * (double)x[i];
      out[2 * i] = (float)std::sin(a);
      out[2 * i + 1] = (float)std::cos(a);
    }
  });
}

void tnml_psi_embed_f64(const double *x, int64_t count, double *out) {
  constexpr double kHalfPi = 1.5707963267948966;
  parallel_for(count, [=](int64_t lo, int64_t hi, int) {
    for (int64_t i = lo; i < hi; ++i) {
      double a = kHalfPi * x[i];
      out[2 * i] = std::sin(a);
      out[2 * i + 1] = std::cos(a);
    }
  });
}

// 2x2 max pooling over (b, h, w) with even h, w
// (reference training_binary_MNIST.py:29-31 semantics).
void tnml_max_pool_2x2_f64(const double *in, int64_t b, int32_t h, int32_t w,
                           double *out) {
  int32_t oh = h / 2, ow = w / 2;
  parallel_for(b, [=](int64_t lo, int64_t hi, int) {
    for (int64_t i = lo; i < hi; ++i) {
      const double *img = in + i * (int64_t)h * w;
      double *dst = out + i * (int64_t)oh * ow;
      for (int32_t r = 0; r < oh; ++r) {
        for (int32_t c = 0; c < ow; ++c) {
          double m = img[(2 * r) * w + 2 * c];
          m = std::max(m, img[(2 * r) * w + 2 * c + 1]);
          m = std::max(m, img[(2 * r + 1) * w + 2 * c]);
          m = std::max(m, img[(2 * r + 1) * w + 2 * c + 1]);
          dst[r * ow + c] = m;
        }
      }
    }
  });
}

// Fisher-Yates shuffle of an index array (epoch shuffling).
void tnml_shuffle_indices(int64_t *idx, int64_t n, uint64_t seed) {
  Xoshiro256 rng(seed + 1);
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = (int64_t)(rng.next() % (uint64_t)(i + 1));
    std::swap(idx[i], idx[j]);
  }
}

// Gather rows into a contiguous batch: out[k] = data[idx[k]] (row_len each).
void tnml_gather_rows_f32(const float *data, const int64_t *idx,
                          int64_t n_rows, int64_t row_len, float *out) {
  parallel_for(n_rows, [=](int64_t lo, int64_t hi, int) {
    for (int64_t k = lo; k < hi; ++k) {
      std::memcpy(out + k * row_len, data + idx[k] * row_len,
                  sizeof(float) * (size_t)row_len);
    }
  });
}

int32_t tnml_version() { return 1; }

}  // extern "C"
