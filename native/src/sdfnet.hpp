// sdfnet.hpp — native C++ runtime for ImplicitNet (.sdfw weights).
//
// Independent re-implementation of the role played by the reference's C++
// LibTorch model (reference ops/conversion_test/main.cpp:8-75: skip-cat/sqrt2,
// softplus, geometric-init MLP) WITHOUT any framework dependency: forward and
// ANALYTIC input gradients are hand-rolled (an MLP's backward is ~20 lines;
// no autograd library required), multithreaded over point batches.
//
// File format: see sdf_representation_tpu/export/native_format.py.

#pragma once

#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <thread>
#include <vector>

namespace sdfnet {

struct Layer {
  int in = 0, out = 0;
  std::vector<float> w;  // (in, out) row-major
  std::vector<float> b;  // (out)
};

// --- tiny JSON helpers (we control the writer; tolerant scanning) ----------
inline double json_number(const std::string& s, const std::string& key) {
  auto p = s.find("\"" + key + "\"");
  if (p == std::string::npos) throw std::runtime_error("missing key " + key);
  p = s.find(':', p);
  return std::stod(s.substr(p + 1));
}

inline std::vector<long> json_int_array(const std::string& s,
                                        const std::string& key,
                                        size_t from = 0) {
  auto p = s.find("\"" + key + "\"", from);
  if (p == std::string::npos) throw std::runtime_error("missing key " + key);
  auto lb = s.find('[', p), rb = s.find(']', p);
  std::vector<long> out;
  std::string body = s.substr(lb + 1, rb - lb - 1);
  std::stringstream ss(body);
  std::string tok;
  while (std::getline(ss, tok, ','))
    if (tok.find_first_not_of(" \t\n") != std::string::npos)
      out.push_back(std::stol(tok));
  return out;
}

inline std::vector<float> json_float_array(const std::string& s,
                                           const std::string& key,
                                           size_t from = 0) {
  auto p = s.find("\"" + key + "\"", from);
  if (p == std::string::npos) throw std::runtime_error("missing key " + key);
  auto lb = s.find('[', p), rb = s.find(']', p);
  std::vector<float> out;
  std::string body = s.substr(lb + 1, rb - lb - 1);
  std::stringstream ss(body);
  std::string tok;
  while (std::getline(ss, tok, ','))
    if (tok.find_first_not_of(" \t\n") != std::string::npos)
      out.push_back(std::stof(tok));
  return out;
}

class ImplicitNet {
 public:
  int d_in = 3;
  std::vector<int> dims;      // [d_in, hidden..., 1]
  std::vector<int> skip_in;   // layer indices with input skip
  float beta = 100.0f;
  std::vector<Layer> layers;

  static ImplicitNet load(const std::string& path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) throw std::runtime_error("cannot open " + path);
    char magic[4];
    f.read(magic, 4);
    if (std::memcmp(magic, "SDFW", 4) != 0)
      throw std::runtime_error("bad magic in " + path);
    uint32_t version = 0, hlen = 0;
    f.read(reinterpret_cast<char*>(&version), 4);
    f.read(reinterpret_cast<char*>(&hlen), 4);
    if (version != 1 && version != 2)
      throw std::runtime_error("unsupported sdfw version");
    std::string header(hlen, '\0');
    f.read(header.data(), hlen);

    ImplicitNet net;
    net.d_in = static_cast<int>(json_number(header, "d_in"));
    net.beta = static_cast<float>(json_number(header, "beta"));
    for (long h : json_int_array(header, "hidden_dims"))
      net.dims.push_back(static_cast<int>(h));
    net.dims.insert(net.dims.begin(), net.d_in);
    net.dims.push_back(1);
    for (long sidx : json_int_array(header, "skip_in"))
      net.skip_in.push_back(static_cast<int>(sidx));

    // tensor directory: names are layers.{i}.{w|b} in order; v1 = f32 blobs,
    // v2 = int8 weights with per-output-channel "scale" arrays (dequantized
    // here at load — the quantize_save-style format, float compute)
    int n_lin = static_cast<int>(net.dims.size()) - 1;
    net.layers.resize(n_lin);
    for (int l = 0; l < n_lin; ++l) {
      size_t tpos = header.find("layers." + std::to_string(l) + ".w");
      auto shape = json_int_array(header, "shape", tpos);
      bool is_int8 = false;
      if (version == 2) {
        size_t dpos = header.find("\"dtype\"", tpos);
        size_t next = header.find("\"name\"", tpos + 1);
        if (dpos != std::string::npos && (next == std::string::npos || dpos < next)) {
          // entry looks like  "dtype": "int8"  — find the value's open quote
          size_t vq = header.find('"', dpos + 7);
          is_int8 = vq != std::string::npos &&
                    header.compare(vq + 1, 4, "int8") == 0;
        }
      }
      Layer& L = net.layers[l];
      L.in = static_cast<int>(shape[0]);
      L.out = static_cast<int>(shape[1]);
      L.w.resize(static_cast<size_t>(L.in) * L.out);
      if (is_int8) {
        std::vector<float> scale = json_float_array(header, "scale", tpos);
        std::vector<int8_t> q(L.w.size());
        f.read(reinterpret_cast<char*>(q.data()), q.size());
        for (int i = 0; i < L.in; ++i)
          for (int j = 0; j < L.out; ++j)
            L.w[static_cast<size_t>(i) * L.out + j] =
                static_cast<float>(q[static_cast<size_t>(i) * L.out + j]) *
                scale[j];
      } else {
        f.read(reinterpret_cast<char*>(L.w.data()), L.w.size() * 4);
      }
      L.b.resize(L.out);
      f.read(reinterpret_cast<char*>(L.b.data()), L.b.size() * 4);
    }
    if (!f) throw std::runtime_error("truncated sdfw file " + path);
    return net;
  }

  int max_width() const {
    int m = 0;
    for (const auto& L : layers) m = std::max(m, std::max(L.in, L.out));
    return m + d_in;
  }

  bool has_skip(int layer) const {
    for (int s : skip_in)
      if (s == layer) return true;
    return false;
  }

  // Branchless polynomial exp/log (~1e-7 relative, an order below the
  // 1e-5 Python<->C++ parity bar): libm's scalar expf/log1pf was ~70% of
  // forward wall time for softplus nets, and these if-convert + vectorize
  // in the blocked row loops.
  static inline float fast_expf(float x) {  // valid for x <= ~25
    x = x < -87.0f ? -87.0f : x;
    float t = x * 1.44269504088896f;  // x / ln2
    float fi = std::floor(t);
    float f = t - fi;  // [0, 1)
    // 2^f: Taylor in f*ln2, degree 7
    float p = 1.0f + f * (0.69314718056f + f * (0.24022650700f +
              f * (0.05550410866f + f * (0.00961812911f +
              f * (0.00133335581f + f * (0.00015403530f +
              f * 1.52527338e-05f))))));
    union { uint32_t u; float fl; } s;
    s.u = static_cast<uint32_t>(static_cast<int>(fi) + 127) << 23;
    return p * s.fl;
  }

  static inline float fast_logf(float z) {  // natural log, z >= 0.5
    union { float fl; uint32_t u; } b;
    b.fl = z;
    int k = static_cast<int>(b.u >> 23) - 127;
    b.u = (b.u & 0x007FFFFFu) | 0x3F800000u;  // mantissa in [1, 2)
    float w = (b.fl - 1.0f) / (b.fl + 1.0f);  // atanh series argument
    float w2 = w * w;
    float poly = 1.0f + w2 * (0.333333333f + w2 * (0.2f +
                 w2 * (0.142857143f + w2 * 0.111111111f)));
    return k * 0.69314718056f + 2.0f * w * poly;
  }

  float act(float z) const {
    if (beta > 0) {
      // softplus(beta*z)/beta, numerically stable
      float bz = beta * z;
      float soft = fast_logf(1.0f + fast_expf(bz < 20.0f ? bz : 20.0f)) / beta;
      return bz > 20.0f ? z : soft;
    }
    return z > 0 ? z : 0.0f;
  }

  // Row-wise activation for the blocked cores. The scalar act()/
  // act_and_sig() loops did NOT auto-vectorize: GCC 12 reports "control
  // flow in loop" for any chain that clamps a float and then converts it
  // to int (cvttss + VRP refuses to if-convert), which is exactly
  // fast_expf's floor/exponent-splice — with ~N_layers*width
  // transcendentals per point the softplus dominated the 64-wide forward
  // 13:1 over the relu-mode net (ROADMAP round 3). This version builds
  // 2^n with the round-to-nearest MAGIC-NUMBER split (x/ln2 + 1.5*2^23;
  // no float->int casts anywhere), all bit moves are 4-byte memcpy and
  // all guards are ternary blends, so the whole body vectorizes to
  // 64-byte vectors (measured 471 M softplus+sigmoid/s single-core vs
  // ~88 M effective before). Accuracy: |err| <= ~1e-7 absolute, the same
  // bar as fast_expf/fast_logf (the log(1+e) form shares their
  // cancellation for e << 1, intentionally — parity with the scalar
  // path's values at the 1e-7 level).
  template <bool WITH_SIG>
  static inline void softplus_row(const float* __restrict__ z, float bias,
                                  float beta, float* __restrict__ h,
                                  float* __restrict__ sig, int n) {
    for (int p = 0; p < n; ++p) {
      float zp = z[p] + bias;
      float bz = beta * zp;
      float x = bz < 20.0f ? bz : 20.0f;
      x = x < -87.0f ? -87.0f : x;
      // e = 2^round(x/ln2) * e^r, r = x - round(x/ln2)*ln2 in [-ln2/2,
      // ln2/2]; the rounded quotient rides the low bits of y
      float y = x * 1.44269504088896f + 12582912.0f;
      uint32_t yi;
      std::memcpy(&yi, &y, 4);
      uint32_t sb = (yi << 23) + (127u << 23);
      float scale;
      std::memcpy(&scale, &sb, 4);
      float nf = y - 12582912.0f;
      float r = x - nf * 0.693359375f;   // ln2_hi (exact in f32)
      r = r + nf * 2.12194440e-4f;       // ln2_hi - ln2 correction
      float pe = 1.0f + r * (1.0f + r * (0.5f + r * (0.166666667f +
                 r * (0.0416666667f + r * (0.00833333333f +
                 r * (0.00138888889f + r * 0.000198412698f))))));
      float e = pe * scale;
      // log(1 + e): exponent/mantissa split + atanh series (uint->float
      // exponent, no int cast)
      float zl = 1.0f + e;
      uint32_t lb;
      std::memcpy(&lb, &zl, 4);
      float k = static_cast<float>(lb >> 23) - 127.0f;
      uint32_t mb = (lb & 0x007FFFFFu) | 0x3F800000u;
      float m;
      std::memcpy(&m, &mb, 4);
      float w = (m - 1.0f) / (m + 1.0f);
      float w2 = w * w;
      float poly = 1.0f + w2 * (0.333333333f + w2 * (0.2f +
                   w2 * (0.142857143f + w2 * 0.111111111f)));
      float soft = (k * 0.69314718056f + 2.0f * w * poly) / beta;
      h[p] = bz > 20.0f ? zp : soft;
      if (WITH_SIG) sig[p] = bz > 20.0f ? 1.0f : e / (1.0f + e);
    }
  }

  template <bool WITH_SIG>
  static inline void relu_row(const float* __restrict__ z, float bias,
                              float* __restrict__ h, float* __restrict__ sig,
                              int n) {
    for (int p = 0; p < n; ++p) {
      float zp = z[p] + bias;
      h[p] = zp > 0.0f ? zp : 0.0f;
      if (WITH_SIG) sig[p] = zp > 0.0f ? 1.0f : 0.0f;
    }
  }

  template <bool WITH_SIG>
  inline void act_row(const float* z, float bias, float* h, float* sig,
                      int n) const {
    if (beta > 0)
      softplus_row<WITH_SIG>(z, bias, beta, h, sig, n);
    else
      relu_row<WITH_SIG>(z, bias, h, sig, n);
  }

  float act_grad(float z) const {
    if (beta > 0) {
      float bz = beta * z;
      float sig = 1.0f / (1.0f + fast_expf(bz > -20.0f ? -bz : 20.0f));
      return bz > 20.0f ? 1.0f : (bz < -20.0f ? 0.0f : sig);
    }
    return z > 0 ? 1.0f : 0.0f;
  }

  // Forward for one point. scratch must hold >= 2*max_width floats per use;
  // if pre_acts != nullptr it receives every layer's pre-activation
  // (n_lin rows, dims[l+1] entries each, flattened with row starts in
  // pre_off) for the backward pass.
  float forward_point(const float* x, std::vector<float>& h,
                      std::vector<float>& tmp,
                      std::vector<float>* pre_acts = nullptr,
                      std::vector<int>* pre_off = nullptr) const {
    const float inv_sqrt2 = 0.70710678118654752f;
    int n_lin = static_cast<int>(layers.size());
    h.assign(h.size(), 0.0f);
    std::copy(x, x + d_in, h.begin());
    int cur = d_in;
    if (pre_acts) {
      pre_acts->clear();
      pre_off->clear();
    }
    for (int l = 0; l < n_lin; ++l) {
      if (has_skip(l)) {
        for (int k = 0; k < d_in; ++k) h[cur + k] = x[k];
        cur += d_in;
        for (int k = 0; k < cur; ++k) h[k] *= inv_sqrt2;
      }
      const Layer& L = layers[l];
      tmp.assign(L.out, 0.0f);
      for (int i = 0; i < L.in; ++i) {
        float hi = h[i];
        if (hi == 0.0f) continue;
        const float* wrow = &L.w[static_cast<size_t>(i) * L.out];
        for (int j = 0; j < L.out; ++j) tmp[j] += hi * wrow[j];
      }
      for (int j = 0; j < L.out; ++j) tmp[j] += L.b[j];
      if (pre_acts) {
        pre_off->push_back(static_cast<int>(pre_acts->size()));
        pre_acts->insert(pre_acts->end(), tmp.begin(), tmp.end());
      }
      if (l < n_lin - 1) {
        for (int j = 0; j < L.out; ++j) h[j] = act(tmp[j]);
      } else {
        h[0] = tmp[0];
        if (beta <= 0) h[0] = std::tanh(h[0]);
      }
      cur = L.out;
      for (int k = cur; k < static_cast<int>(h.size()); ++k) h[k] = 0.0f;
    }
    return h[0];
  }

  // Register-blocked matmul cores. The j-inner form (for each input row i,
  // FMA w_ij into every output row j) reloads + stores each T row once per
  // i: measured 10 GFLOP/s single-core on the cooperlake VM. Holding JG=8
  // output rows of NB=32 lanes in zmm accumulators across the whole i loop
  // measures 123 GFLOP/s (~77% of the core's 160 GF/s AVX-512 FMA peak).
  // The per-output accumulation order over i is UNCHANGED, so results are
  // bitwise identical to the naive loops (the parity fixtures hold).

  // T (Out x NB) = W^T H: T[j][p] = sum_i w[i][j] * H[i][p]; w is (In, Out)
  // row-major.
  template <int NB>
  static void matvec_tn(const float* __restrict__ w,
                        const float* __restrict__ H, float* __restrict__ T,
                        int In, int Out) {
    constexpr int JG = 8;
    int j0 = 0;
    for (; j0 + JG <= Out; j0 += JG) {
      float acc[JG][NB] = {};
      for (int i = 0; i < In; ++i) {
        const float* hrow = &H[static_cast<size_t>(i) * NB];
        const float* wr = &w[static_cast<size_t>(i) * Out + j0];
        for (int r = 0; r < JG; ++r) {
          const float wij = wr[r];
          for (int p = 0; p < NB; ++p) acc[r][p] += wij * hrow[p];
        }
      }
      for (int r = 0; r < JG; ++r)
        std::memcpy(&T[static_cast<size_t>(j0 + r) * NB], acc[r],
                    NB * sizeof(float));
    }
    for (; j0 < Out; ++j0) {  // tail columns (skip layers, the scalar head)
      float acc[NB] = {};
      for (int i = 0; i < In; ++i) {
        const float wij = w[static_cast<size_t>(i) * Out + j0];
        const float* hrow = &H[static_cast<size_t>(i) * NB];
        for (int p = 0; p < NB; ++p) acc[p] += wij * hrow[p];
      }
      std::memcpy(&T[static_cast<size_t>(j0) * NB], acc, NB * sizeof(float));
    }
  }

  // DP (In x NB) = W D: DP[i][p] = sum_j w[i][j] * D[j][p].
  template <int NB>
  static void matvec_nn(const float* __restrict__ w,
                        const float* __restrict__ D, float* __restrict__ DP,
                        int In, int Out) {
    constexpr int IG = 8;
    int i0 = 0;
    for (; i0 + IG <= In; i0 += IG) {
      float acc[IG][NB] = {};
      for (int j = 0; j < Out; ++j) {
        const float* drow = &D[static_cast<size_t>(j) * NB];
        for (int r = 0; r < IG; ++r) {
          const float wij = w[static_cast<size_t>(i0 + r) * Out + j];
          for (int p = 0; p < NB; ++p) acc[r][p] += wij * drow[p];
        }
      }
      for (int r = 0; r < IG; ++r)
        std::memcpy(&DP[static_cast<size_t>(i0 + r) * NB], acc[r],
                    NB * sizeof(float));
    }
    for (; i0 < In; ++i0) {
      float acc[NB] = {};
      for (int j = 0; j < Out; ++j) {
        const float wij = w[static_cast<size_t>(i0) * Out + j];
        const float* drow = &D[static_cast<size_t>(j) * NB];
        for (int p = 0; p < NB; ++p) acc[p] += wij * drow[p];
      }
      std::memcpy(&DP[static_cast<size_t>(i0) * NB], acc, NB * sizeof(float));
    }
  }

  // Forward for a block of up to NB points in a transposed (feature-major,
  // point-minor) scratch layout: every weight is streamed once per BLOCK
  // instead of once per point, and the point axis vectorizes (NB contiguous
  // lanes). ~4x single-core over forward_point on the 8x512 flagship.
  template <int NB>
  void forward_block(const float* pts, int nb, float* out,
                     std::vector<float>& H, std::vector<float>& T) const {
    const float inv_sqrt2 = 0.70710678118654752f;
    const int n_lin = static_cast<int>(layers.size());
    const int W = max_width();
    H.assign(static_cast<size_t>(W) * NB, 0.0f);
    for (int p = 0; p < nb; ++p)
      for (int k = 0; k < d_in; ++k)
        H[static_cast<size_t>(k) * NB + p] = pts[p * d_in + k];
    int cur = d_in;
    for (int l = 0; l < n_lin; ++l) {
      if (has_skip(l)) {
        for (int k = 0; k < d_in; ++k)
          for (int p = 0; p < nb; ++p)
            H[static_cast<size_t>(cur + k) * NB + p] = pts[p * d_in + k];
        cur += d_in;
        for (size_t k = 0; k < static_cast<size_t>(cur) * NB; ++k)
          H[k] *= inv_sqrt2;
      }
      const Layer& L = layers[l];
      T.resize(static_cast<size_t>(L.out) * NB);
      matvec_tn<NB>(L.w.data(), H.data(), T.data(), L.in, L.out);
      if (l < n_lin - 1) {
        // one LONG activation pass over the whole (out x NB) block: the
        // short 32-lane per-row calls ran at ~140-210 M softplus/s (poly
        // latency not hidden); a single out*NB-length loop pipelines to
        // ~470 M/s. Bias is a cheap vector add first.
        for (int j = 0; j < L.out; ++j) {
          const float bj = L.b[j];
          float* trow = &T[static_cast<size_t>(j) * NB];
          for (int p = 0; p < NB; ++p) trow[p] += bj;
        }
        act_row<false>(T.data(), 0.0f, H.data(), nullptr, L.out * NB);
      } else {
        for (int p = 0; p < nb; ++p) {
          float v = T[p] + L.b[0];
          out[p] = (beta <= 0) ? std::tanh(v) : v;
        }
      }
      cur = L.out;
    }
  }

  // Fused activation + derivative: one fast_expf serves both (the backward
  // used to replay act_grad from stashed pre-activations — recomputing a
  // third of all transcendentals; stashing sigma instead removes them).
  inline void act_and_sig(float z, float* hv, float* sv) const {
    if (beta > 0) {
      float bz = beta * z;
      float bzc = bz < 20.0f ? bz : 20.0f;
      float e = fast_expf(bzc);
      float soft = fast_logf(1.0f + e) / beta;
      *hv = bz > 20.0f ? z : soft;
      *sv = bz > 20.0f ? 1.0f : e / (1.0f + e);
    } else {
      *hv = z > 0 ? z : 0.0f;
      *sv = z > 0 ? 1.0f : 0.0f;
    }
  }

  // Forward + analytic gradients for a block of up to NB points (same
  // transposed layout as forward_block, with per-layer activation
  // DERIVATIVES stashed during the forward for the reverse sweep). ~2x
  // single-core over the per-point gradient path.
  template <int NB>
  void forward_grad_block(const float* pts, int nb, float* out, float* grads,
                          std::vector<float>& H, std::vector<float>& T,
                          std::vector<float>& SIG, std::vector<float>& D,
                          std::vector<float>& DP) const {
    const float inv_sqrt2 = 0.70710678118654752f;
    const int n_lin = static_cast<int>(layers.size());
    const int W = max_width();
    H.assign(static_cast<size_t>(W) * NB, 0.0f);
    size_t sig_total = 0;
    for (int l = 0; l + 1 < n_lin; ++l)
      sig_total += static_cast<size_t>(layers[l].out) * NB;
    SIG.resize(sig_total);
    std::vector<size_t> sig_off(n_lin);
    {
      size_t o = 0;
      for (int l = 0; l + 1 < n_lin; ++l) {
        sig_off[l] = o;
        o += static_cast<size_t>(layers[l].out) * NB;
      }
    }
    for (int p = 0; p < nb; ++p)
      for (int k = 0; k < d_in; ++k)
        H[static_cast<size_t>(k) * NB + p] = pts[p * d_in + k];
    int cur = d_in;
    for (int l = 0; l < n_lin; ++l) {
      if (has_skip(l)) {
        for (int k = 0; k < d_in; ++k)
          for (int p = 0; p < nb; ++p)
            H[static_cast<size_t>(cur + k) * NB + p] = pts[p * d_in + k];
        cur += d_in;
        for (size_t k = 0; k < static_cast<size_t>(cur) * NB; ++k)
          H[k] *= inv_sqrt2;
      }
      const Layer& L = layers[l];
      T.resize(static_cast<size_t>(L.out) * NB);
      float* pre = T.data();
      matvec_tn<NB>(L.w.data(), H.data(), pre, L.in, L.out);
      for (int j = 0; j < L.out; ++j) {
        float* prow = pre + static_cast<size_t>(j) * NB;
        const float bj = L.b[j];
        for (int p = 0; p < NB; ++p) prow[p] += bj;
      }
      if (l < n_lin - 1) {
        act_row<true>(pre, 0.0f, &H[0],
                      &SIG[sig_off[l]], L.out * NB);
      } else {
        for (int p = 0; p < nb; ++p) {
          float v = pre[p];
          out[p] = (beta <= 0) ? std::tanh(v) : v;
        }
      }
      cur = L.out;
    }

    // reverse sweep: D = dL/d(pre-act of layer l), (width, NB)
    D.assign(static_cast<size_t>(W) * NB, 0.0f);
    DP.assign(static_cast<size_t>(W) * NB, 0.0f);
    std::vector<float> dx(static_cast<size_t>(d_in) * NB, 0.0f);
    for (int p = 0; p < nb; ++p) D[p] = 1.0f;
    if (beta <= 0) {
      // tanh head: out already holds tanh(pre), so 1 - out^2 is its slope
      for (int p = 0; p < nb; ++p) D[p] = 1.0f - out[p] * out[p];
    }
    for (int l = n_lin - 1; l >= 0; --l) {
      const Layer& L = layers[l];
      // DP = W D : DP[i][p] = sum_j w[i,j] D[j][p]
      matvec_nn<NB>(L.w.data(), D.data(), DP.data(), L.in, L.out);
      int rows = L.in;
      if (has_skip(l)) {
        for (int k = 0; k < d_in; ++k) {
          const float* dprow = &DP[static_cast<size_t>(rows - d_in + k) * NB];
          float* dxrow = &dx[static_cast<size_t>(k) * NB];
          for (int p = 0; p < NB; ++p) dxrow[p] += dprow[p] * inv_sqrt2;
        }
        rows -= d_in;
        for (size_t k = 0; k < static_cast<size_t>(rows) * NB; ++k)
          DP[k] *= inv_sqrt2;
      }
      if (l == 0) {
        for (int k = 0; k < d_in; ++k) {
          const float* dprow = &DP[static_cast<size_t>(k) * NB];
          float* dxrow = &dx[static_cast<size_t>(k) * NB];
          for (int p = 0; p < NB; ++p) dxrow[p] += dprow[p];
        }
        break;
      }
      const float* sig_prev = &SIG[sig_off[l - 1]];
      const int prev_out = layers[l - 1].out;
      for (int j = 0; j < prev_out; ++j) {
        const float* dprow = &DP[static_cast<size_t>(j) * NB];
        const float* srow = sig_prev + static_cast<size_t>(j) * NB;
        float* drow = &D[static_cast<size_t>(j) * NB];
        for (int p = 0; p < NB; ++p) drow[p] = dprow[p] * srow[p];
      }
    }
    for (int p = 0; p < nb; ++p)
      for (int k = 0; k < d_in; ++k)
        grads[p * d_in + k] = dx[static_cast<size_t>(k) * NB + p];
  }

  // Forward + analytic d(sdf)/d(x) via reverse accumulation.
  float forward_grad_point(const float* x, float* grad_out) const {
    int n_lin = static_cast<int>(layers.size());
    std::vector<float> h(max_width(), 0.0f), tmp(max_width(), 0.0f);
    std::vector<float> pre;
    std::vector<int> off;
    float out = forward_point(x, h, tmp, &pre, &off);

    // backward: d = dL/d(pre_act of layer l)
    std::vector<float> d(max_width(), 0.0f), dprev(max_width(), 0.0f);
    std::vector<float> dx(d_in, 0.0f);
    d[0] = 1.0f;
    if (beta <= 0) {
      float t = std::tanh(pre[off[n_lin - 1]]);
      d[0] = 1.0f - t * t;
    }
    const float inv_sqrt2 = 0.70710678118654752f;
    for (int l = n_lin - 1; l >= 0; --l) {
      const Layer& L = layers[l];
      // dprev = W d  (w is (in,out): dprev_i = sum_j w[i,j] d_j)
      dprev.assign(L.in, 0.0f);
      for (int i = 0; i < L.in; ++i) {
        const float* wrow = &L.w[static_cast<size_t>(i) * L.out];
        float acc = 0.0f;
        for (int j = 0; j < L.out; ++j) acc += wrow[j] * d[j];
        dprev[i] = acc;
      }
      if (has_skip(l)) {
        // input h was [prev_h, x] * inv_sqrt2
        for (int k = 0; k < d_in; ++k)
          dx[k] += dprev[L.in - d_in + k] * inv_sqrt2;
        dprev.resize(L.in - d_in);
        for (auto& v : dprev) v *= inv_sqrt2;
      }
      if (l == 0) {
        for (int k = 0; k < d_in; ++k) dx[k] += dprev[k];
        break;
      }
      // multiply by activation derivative of layer l-1
      const int po = off[l - 1];
      int prev_out = layers[l - 1].out;
      d.assign(prev_out, 0.0f);
      for (int j = 0; j < prev_out; ++j)
        d[j] = dprev[j] * act_grad(pre[po + j]);
    }
    for (int k = 0; k < d_in; ++k) grad_out[k] = dx[k];
    return out;
  }

  // Batched, multithreaded. pts: n x d_in row-major. out: n. grads: n x d_in
  // (nullptr to skip gradients).
  void evaluate(const float* pts, std::size_t n, float* out,
                float* grads = nullptr, int n_threads = 0) const {
    if (n_threads <= 0)
      n_threads = std::max(1u, std::thread::hardware_concurrency());
    n_threads = static_cast<int>(
        std::min<std::size_t>(static_cast<std::size_t>(n_threads), n ? n : 1));
    constexpr int NB = 32;
    auto work = [&](std::size_t lo, std::size_t hi) {
      std::vector<float> H, T, PRE, D, DP;
      for (std::size_t i = lo; i < hi; i += NB) {
        int nb = static_cast<int>(std::min<std::size_t>(NB, hi - i));
        if (grads) {
          forward_grad_block<NB>(pts + i * d_in, nb, out + i,
                                 grads + i * d_in, H, T, PRE, D, DP);
        } else {
          forward_block<NB>(pts + i * d_in, nb, out + i, H, T);
        }
      }
    };
    std::vector<std::thread> threads;
    std::size_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      std::size_t lo = t * chunk, hi = std::min(n, lo + chunk);
      if (lo >= hi) break;
      threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
  }
};

// --- CSV helpers -----------------------------------------------------------
inline std::vector<std::vector<float>> read_csv(const std::string& path) {
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::vector<std::vector<float>> rows;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    std::vector<float> row;
    std::stringstream ss(line);
    std::string tok;
    bool numeric = true;
    while (std::getline(ss, tok, ',')) {
      try {
        row.push_back(std::stof(tok));
      } catch (...) {
        numeric = false;
        break;
      }
    }
    if (numeric && !row.empty()) rows.push_back(std::move(row));
  }
  return rows;
}

inline void write_csv(const std::string& path,
                      const std::vector<std::vector<float>>& rows) {
  std::ofstream f(path);
  f.precision(9);
  for (const auto& row : rows) {
    for (std::size_t i = 0; i < row.size(); ++i) {
      if (i) f << ',';
      f << row[i];
    }
    f << '\n';
  }
}

}  // namespace sdfnet
