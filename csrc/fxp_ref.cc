// Golden C++ reference of the fixed-point integer algebra.
//
// An independent third implementation (besides the jnp float-sim and the
// XLA/Pallas integer paths) used to triangulate bit-exactness in tests, and
// as the seed of the native serving runtime.  Covers: round-half-to-even
// shift requantization, int8 conv2d (NHWC x HWIO -> int32), saturating
// residual add with fraclen alignment, integer avgpool, and the int8 GEMM.
//
// Build: make -C csrc   (produces libfxpref.so; loaded via ctypes)

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// round-half-to-even right shift (or left shift when net < 0).  The bias
// add deliberately wraps in int32 like the reference's torch path (and our
// jnp path): x near INT32_MAX with net > 0 wraps negative before the shift.
// Bit-parity with the deployed integer graphs beats mathematical nicety.
static inline int32_t rhe_shift(int32_t x, int net) {
  if (net <= 0) return (int32_t)((uint32_t)x << (-net));
  const int32_t half = (int32_t)1 << (net - 1);
  const uint32_t mod = (uint32_t)x & (((uint32_t)1 << net) - 1);
  int32_t res = (int32_t)((uint32_t)x + (uint32_t)half);  // wrapping add
  if (mod == (uint32_t)half) {
    return (res >> (net + 1)) << 1;
  }
  return res >> net;
}

void shift_requant_i32(const int32_t* x, int32_t* out, int64_t n, int wl,
                       int fl, int input_fl, int signedness) {
  const int net = input_fl - fl;
  const int32_t bound = signedness ? ((1 << (wl - 1)) - 1) : ((1 << wl) - 1);
  const int32_t lo = signedness ? -bound : 0;
  for (int64_t i = 0; i < n; ++i) {
    int32_t r = rhe_shift(x[i], net);
    out[i] = std::min(std::max(r, lo), bound);
  }
}

// NHWC int32 activations (8-bit range values) x HWIO int8 weights -> int32.
// groups == 1 or groups == C (depthwise).
void conv2d_int(const int32_t* x, const int8_t* w, const int32_t* bias,
                int32_t* y, int N, int H, int W, int C, int O, int kh, int kw,
                int sh, int sw, int ph, int pw, int groups) {
  const int ho = (H + 2 * ph - kh) / sh + 1;
  const int wo = (W + 2 * pw - kw) / sw + 1;
  const int ci_per_g = C / groups;
  const int co_per_g = O / groups;
#pragma omp parallel for collapse(2) schedule(static)
  for (int n = 0; n < N; ++n) {
    for (int oy = 0; oy < ho; ++oy) {
      for (int ox = 0; ox < wo; ++ox) {
        for (int o = 0; o < O; ++o) {
          const int g = o / co_per_g;
          int64_t acc = bias ? bias[o] : 0;
          for (int ky = 0; ky < kh; ++ky) {
            const int iy = oy * sh - ph + ky;
            if (iy < 0 || iy >= H) continue;
            for (int kx = 0; kx < kw; ++kx) {
              const int ix = ox * sw - pw + kx;
              if (ix < 0 || ix >= W) continue;
              for (int ci = 0; ci < ci_per_g; ++ci) {
                const int c = g * ci_per_g + ci;
                const int32_t xv = x[((int64_t)(n * H + iy) * W + ix) * C + c];
                const int8_t wv =
                    w[(((int64_t)ky * kw + kx) * ci_per_g + ci) * O + o];
                acc += (int64_t)xv * wv;
              }
            }
          }
          y[((int64_t)(n * ho + oy) * wo + ox) * O + o] = (int32_t)acc;
        }
      }
    }
  }
}

// saturating residual add with left-shift fraclen alignment
void residual_add_int(const int32_t* res, int res_fl, const int32_t* x,
                      int x_fl, int32_t* out, int64_t n) {
  const int64_t bound = (1LL << 31) - 1;
  const int sr = res_fl >= x_fl ? 0 : (x_fl - res_fl);
  const int sx = res_fl >= x_fl ? (res_fl - x_fl) : 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t s = ((int64_t)res[i] << sr) + ((int64_t)x[i] << sx);
    s = std::min(std::max(s, -bound), bound);
    out[i] = (int32_t)s;
  }
}

// global sum pool over H,W (int32 accumulate); caller adjusts fraclen
void avgpool_sum_int(const int32_t* x, int32_t* y, int N, int H, int W, int C) {
  for (int n = 0; n < N; ++n) {
    for (int c = 0; c < C; ++c) {
      int64_t acc = 0;
      for (int i = 0; i < H * W; ++i) acc += x[((int64_t)n * H * W + i) * C + c];
      y[(int64_t)n * C + c] = (int32_t)acc;
    }
  }
}

// int8 GEMM with int32 accumulation: y[M,N] = x[M,K] @ w[K,N] + bias
void gemm_int8(const int8_t* x, const int8_t* w, const int32_t* bias,
               int32_t* y, int M, int K, int N) {
#pragma omp parallel for schedule(static)
  for (int m = 0; m < M; ++m) {
    for (int n = 0; n < N; ++n) {
      int64_t acc = bias ? bias[n] : 0;
      for (int k = 0; k < K; ++k)
        acc += (int64_t)x[(int64_t)m * K + k] * w[(int64_t)k * N + n];
      y[(int64_t)m * N + n] = (int32_t)acc;
    }
  }
}

}  // extern "C"
