// bench_native — native-runtime throughput check (points/sec, fwd and
// fwd+grad) for the exported net.
//
// usage: bench_native model.sdfw [n_points]

#include <chrono>
#include <cstdio>
#include <random>
#include <vector>

#include "sdfnet.hpp"

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s model.sdfw [n_points]\n", argv[0]);
    return 2;
  }
  auto net = sdfnet::ImplicitNet::load(argv[1]);
  std::size_t n = argc > 2 ? std::stoul(argv[2]) : 100000;

  std::mt19937 rng(0);
  std::uniform_real_distribution<float> dist(-1.f, 1.f);
  std::vector<float> pts(n * net.d_in);
  for (auto& v : pts) v = dist(rng);
  std::vector<float> out(n), grads(n * net.d_in);

  auto t0 = std::chrono::steady_clock::now();
  net.evaluate(pts.data(), n, out.data());
  auto t1 = std::chrono::steady_clock::now();
  net.evaluate(pts.data(), n, out.data(), grads.data());
  auto t2 = std::chrono::steady_clock::now();

  double fwd = std::chrono::duration<double>(t1 - t0).count();
  double fwd_grad = std::chrono::duration<double>(t2 - t1).count();
  std::printf("{\"n\": %zu, \"fwd_pts_per_sec\": %.0f, "
              "\"fwd_grad_pts_per_sec\": %.0f}\n",
              n, n / fwd, n / fwd_grad);
  return 0;
}
