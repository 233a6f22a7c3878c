// Standalone native inference runtime for F8NB bundles.
//
// Loads the flat binary bundle written by
// f8net_tpu.export.native_bundle.save_native_bundle and executes the
// integer-only graph (int32 activations at 8-bit range, int8 weights, int32
// accumulation, power-of-two shift requantization) on the CPU using the
// golden kernels in fxp_ref.cc -- a complete inference path with zero
// Python/JAX dependencies, bit-exact vs the TPU engine.
//
// Build: make -C csrc infer_main
// Usage: infer_main model.f8nb input.raw N H W > logits.txt
//   input.raw: int32 little-endian NHWC, conditioned to the head's input
//   grid (round(255*image) for the unnormalized pipeline).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

// golden kernels (fxp_ref.cc)
extern "C" {
void shift_requant_i32(const int32_t*, int32_t*, int64_t, int, int, int, int);
void conv2d_int(const int32_t*, const int8_t*, const int32_t*, int32_t*, int,
                int, int, int, int, int, int, int, int, int, int, int);
void residual_add_int(const int32_t*, int, const int32_t*, int, int32_t*,
                      int64_t);
void avgpool_sum_int(const int32_t*, int32_t*, int, int, int, int);
}

namespace {

struct Conv {
  int kh, kw, cin, cout, stride, pad, groups;
  int input_fl, weight_fl, symmetric;
  std::vector<int8_t> w;
  std::vector<int32_t> b;
};

struct Linear {
  int in, out, has_bias;
  int input_fl, weight_fl, symmetric;
  std::vector<int8_t> w;
  std::vector<int32_t> b;
};

struct Block {
  std::vector<int> body;
  int shortcut = -1;
  int residual = 0;
};

struct Model {
  int family, num_classes, quant_avgpool;
  std::vector<Block> blocks;
  std::vector<Conv> convs;      // indexed by layer id (linear slots empty)
  std::vector<Linear> linears;  // parallel
  std::vector<int> kinds;       // 0 conv, 1 linear
};

struct Act {
  std::vector<int32_t> x;
  int n, h, w, c, fl;
};

int32_t rd_i32(FILE* f) {
  int32_t v;
  if (fread(&v, 4, 1, f) != 1) { fprintf(stderr, "truncated bundle\n"); exit(2); }
  return v;
}

Model load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
  char magic[4];
  if (fread(magic, 1, 4, f) != 4 || memcmp(magic, "F8NB", 4) != 0) {
    fprintf(stderr, "bad magic\n"); exit(2);
  }
  Model m;
  int version = rd_i32(f); (void)version;
  m.family = rd_i32(f);
  m.num_classes = rd_i32(f);
  m.quant_avgpool = rd_i32(f);
  int n_layers = rd_i32(f);
  int n_blocks = rd_i32(f);
  m.blocks.resize(n_blocks);
  for (auto& b : m.blocks) {
    int nb = rd_i32(f);
    b.body.resize(nb);
    for (int i = 0; i < nb; ++i) b.body[i] = rd_i32(f);
    b.shortcut = rd_i32(f);
    b.residual = rd_i32(f);
  }
  m.convs.resize(n_layers);
  m.linears.resize(n_layers);
  m.kinds.resize(n_layers);
  for (int i = 0; i < n_layers; ++i) {
    int kind = rd_i32(f);
    m.kinds[i] = kind;
    int input_fl = rd_i32(f), weight_fl = rd_i32(f), sym = rd_i32(f);
    if (kind == 0) {
      Conv& c = m.convs[i];
      c.input_fl = input_fl; c.weight_fl = weight_fl; c.symmetric = sym;
      c.kh = rd_i32(f); c.kw = rd_i32(f); c.cin = rd_i32(f); c.cout = rd_i32(f);
      c.stride = rd_i32(f); c.pad = rd_i32(f); c.groups = rd_i32(f);
      int64_t wn = (int64_t)c.kh * c.kw * (c.cin / c.groups) * c.cout;
      c.w.resize(wn);
      if (fread(c.w.data(), 1, wn, f) != (size_t)wn) exit(2);
      c.b.resize(c.cout);
      if (fread(c.b.data(), 4, c.cout, f) != (size_t)c.cout) exit(2);
    } else {
      Linear& l = m.linears[i];
      l.input_fl = input_fl; l.weight_fl = weight_fl; l.symmetric = sym;
      l.in = rd_i32(f); l.out = rd_i32(f); l.has_bias = rd_i32(f);
      l.w.resize((int64_t)l.in * l.out);
      if (fread(l.w.data(), 1, l.w.size(), f) != l.w.size()) exit(2);
      if (l.has_bias) {
        l.b.resize(l.out);
        if (fread(l.b.data(), 4, l.out, f) != (size_t)l.out) exit(2);
      }
    }
  }
  fclose(f);
  return m;
}

Act conv_layer(const Model& m, int idx, const Act& a) {
  const Conv& c = m.convs[idx];
  Act r;
  std::vector<int32_t> q(a.x.size());
  shift_requant_i32(a.x.data(), q.data(), (int64_t)a.x.size(), 8, c.input_fl,
                    a.fl, c.symmetric);
  r.n = a.n;
  r.h = (a.h + 2 * c.pad - c.kh) / c.stride + 1;
  r.w = (a.w + 2 * c.pad - c.kw) / c.stride + 1;
  r.c = c.cout;
  r.fl = c.input_fl + c.weight_fl;
  r.x.resize((int64_t)r.n * r.h * r.w * r.c);
  conv2d_int(q.data(), c.w.data(), c.b.data(), r.x.data(), a.n, a.h, a.w, a.c,
             c.cout, c.kh, c.kw, c.stride, c.stride, c.pad, c.pad, c.groups);
  return r;
}

void relu(Act& a) {
  for (auto& v : a.x) v = std::max(v, 0);
}

Act maxpool(const Act& a, int k, int s, int p) {
  Act r;
  r.n = a.n; r.c = a.c; r.fl = a.fl;
  r.h = (a.h + 2 * p - k) / s + 1;
  r.w = (a.w + 2 * p - k) / s + 1;
  r.x.assign((int64_t)r.n * r.h * r.w * r.c, 0);
  for (int n = 0; n < a.n; ++n)
    for (int y = 0; y < r.h; ++y)
      for (int x = 0; x < r.w; ++x)
        for (int c = 0; c < a.c; ++c) {
          int32_t best = INT32_MIN;
          for (int ky = 0; ky < k; ++ky) {
            int iy = y * s - p + ky;
            if (iy < 0 || iy >= a.h) continue;
            for (int kx = 0; kx < k; ++kx) {
              int ix = x * s - p + kx;
              if (ix < 0 || ix >= a.w) continue;
              best = std::max(best, a.x[((int64_t)(n * a.h + iy) * a.w + ix) * a.c + c]);
            }
          }
          r.x[((int64_t)(n * r.h + y) * r.w + x) * r.c + c] = best;
        }
  return r;
}

Act add_residual(const Act& res, const Act& sc) {
  Act r = res;
  int out_fl = std::max(res.fl, sc.fl);
  residual_add_int(res.x.data(), res.fl, sc.x.data(), sc.fl, r.x.data(),
                   (int64_t)res.x.size());
  r.fl = out_fl;
  return r;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 6) {
    fprintf(stderr, "usage: %s model.f8nb input.raw N H W\n", argv[0]);
    return 2;
  }
  Model m = load(argv[1]);
  int N = atoi(argv[3]), H = atoi(argv[4]), W = atoi(argv[5]);

  Act a;
  a.n = N; a.h = H; a.w = W; a.c = 3;
  a.x.resize((int64_t)N * H * W * 3);
  {
    FILE* f = fopen(argv[2], "rb");
    if (!f || fread(a.x.data(), 4, a.x.size(), f) != a.x.size()) {
      fprintf(stderr, "cannot read input\n");
      return 2;
    }
    fclose(f);
  }
  // head layer is index 0 by construction; input already at its grid
  a.fl = m.convs[0].input_fl;
  a = conv_layer(m, 0, a);

  if (m.family == 0) {  // resnet: relu + maxpool, post-add relus
    relu(a);
    a = maxpool(a, 3, 2, 1);
    for (const auto& blk : m.blocks) {
      Act in = a;
      Act v = a;
      for (size_t i = 0; i < blk.body.size(); ++i) {
        if (i > 0) relu(v);
        v = conv_layer(m, blk.body[i], v);
      }
      Act sc = blk.shortcut >= 0 ? conv_layer(m, blk.shortcut, in) : in;
      a = add_residual(v, sc);
      relu(a);
    }
  } else if (m.family == 1) {  // mbv1
    for (const auto& blk : m.blocks) {
      relu(a);
      a = conv_layer(m, blk.body[0], a);
      relu(a);
      a = conv_layer(m, blk.body[1], a);
    }
    relu(a);
  } else {  // mbv2
    relu(a);
    for (const auto& blk : m.blocks) {
      Act in = a;
      Act v = a;
      for (size_t i = 0; i < blk.body.size(); ++i) {
        if (i > 0) relu(v);
        v = conv_layer(m, blk.body[i], v);
      }
      a = blk.residual ? add_residual(v, in) : v;
    }
    // tail conv = second-to-last layer record
    a = conv_layer(m, (int)m.kinds.size() - 2, a);
    relu(a);
  }

  // global average pool (quantized: sum with fraclen absorption)
  if (!m.quant_avgpool) {
    fprintf(stderr, "runtime requires quant_avgpool bundles\n");
    return 2;
  }
  std::vector<int32_t> pooled((int64_t)a.n * a.c);
  avgpool_sum_int(a.x.data(), pooled.data(), a.n, a.h, a.w, a.c);
  // FXQAvgPool2d shift = round(log2(k*k)), derived from the actual pooled
  // extent (fix_quant_ops.py:117-124); 6 for the ImageNet 7x7 case.
  int fl = a.fl + (int)lround(log2((double)a.h * (double)a.w));

  // classifier
  const Linear& fc = m.linears.back();
  std::vector<int32_t> q(pooled.size());
  shift_requant_i32(pooled.data(), q.data(), (int64_t)pooled.size(), 8,
                    fc.input_fl, fl, fc.symmetric);
  for (int n = 0; n < a.n; ++n) {
    for (int o = 0; o < fc.out; ++o) {
      int64_t acc = fc.has_bias ? fc.b[o] : 0;
      for (int i = 0; i < fc.in; ++i)
        acc += (int64_t)q[(int64_t)n * fc.in + i] * fc.w[(int64_t)i * fc.out + o];
      printf("%lld%c", (long long)acc, o + 1 == fc.out ? '\n' : ' ');
    }
  }
  return 0;
}
