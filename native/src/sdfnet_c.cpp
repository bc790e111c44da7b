// C ABI for embedding the native SDF runtime in other applications
// (the serving role the reference fills by linking LibTorch into consumers,
// reference ops/conversion_test/main.cpp:1-40 and ops/DeepTrace/src/
// deeptrace.cpp:30-71 via ONNX Runtime). One shared library, two model
// formats: .sdfw (v1 float / v2 int8, sdfnet.hpp) and model.onnx
// (onnx_net.hpp wire reader). No C++ types cross the boundary.
//
// Contract:
//   h = sdfnet_load(path)            NULL on failure -> sdfnet_last_error()
//   sdfnet_d_in(h)                   input dimensionality
//   sdfnet_evaluate(h, pts, n, out, grads, n_threads)
//       pts: n x d_in row-major f32; out: n f32; grads: n x d_in f32 or
//       NULL to skip; n_threads <= 0 = hardware concurrency (.sdfw path;
//       the onnx reference path is single-threaded). Returns 0, or -1 with
//       sdfnet_last_error() set.
//   sdfnet_free(h)

#include <cstddef>
#include <cstring>
#include <memory>
#include <string>

#include "onnx_net.hpp"
#include "sdfnet.hpp"

namespace {

struct Handle {
  bool is_onnx = false;
  sdfnet::ImplicitNet net;
  onnxnet::Model onnx;
};

thread_local std::string g_err;

bool ends_with(const std::string& s, const char* suf) {
  std::size_t m = std::strlen(suf);
  return s.size() >= m && s.compare(s.size() - m, m, suf) == 0;
}

}  // namespace

extern "C" {

const char* sdfnet_last_error() { return g_err.c_str(); }

void* sdfnet_load(const char* path) {
  g_err.clear();
  try {
    std::unique_ptr<Handle> h(new Handle);
    std::string p(path ? path : "");
    if (ends_with(p, ".onnx")) {
      h->is_onnx = true;
      h->onnx = onnxnet::Model::load(p);
    } else {
      h->net = sdfnet::ImplicitNet::load(p);
    }
    return h.release();
  } catch (const std::exception& e) {
    g_err = e.what();
    return nullptr;
  }
}

int sdfnet_d_in(const void* handle) {
  if (!handle) return -1;
  const auto* h = static_cast<const Handle*>(handle);
  return h->is_onnx ? static_cast<int>(h->onnx.d_in) : h->net.d_in;
}

int sdfnet_evaluate(const void* handle, const float* pts, std::size_t n,
                    float* out, float* grads, int n_threads) {
  g_err.clear();
  if (!handle || !pts || !out) {
    g_err = "sdfnet_evaluate: NULL handle/pts/out";
    return -1;
  }
  const auto* h = static_cast<const Handle*>(handle);
  try {
    if (h->is_onnx) {
      h->onnx.evaluate(pts, n, out, grads);
    } else {
      h->net.evaluate(pts, n, out, grads, n_threads);
    }
    return 0;
  } catch (const std::exception& e) {
    g_err = e.what();
    return -1;
  }
}

void sdfnet_free(void* handle) { delete static_cast<Handle*>(handle); }

}  // extern "C"
