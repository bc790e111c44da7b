// parity_main — export -> independent-runtime re-evaluation -> elementwise
// diff, the key native test idea carried over from the reference
// (ops/conversion_test/run.sh + difference.csv ~1e-7;
//  test_loading.cpp:18-99 evaluates a TorchScript export and its input
//  gradients — here both come from the dependency-free sdfnet runtime).
//
// usage: parity_main model.sdfw input.csv output.csv gradient.csv

#include <cstdio>
#include <string>

#include "sdfnet.hpp"

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s model.sdfw input.csv output.csv gradient.csv\n",
                 argv[0]);
    return 2;
  }
  try {
    auto net = sdfnet::ImplicitNet::load(argv[1]);
    auto rows = sdfnet::read_csv(argv[2]);
    const std::size_t n = rows.size();
    std::vector<float> pts(n * net.d_in);
    for (std::size_t i = 0; i < n; ++i)
      for (int k = 0; k < net.d_in; ++k) pts[i * net.d_in + k] = rows[i][k];

    std::vector<float> out(n), grads(n * net.d_in);
    net.evaluate(pts.data(), n, out.data(), grads.data());

    std::vector<std::vector<float>> orows(n), grows(n);
    for (std::size_t i = 0; i < n; ++i) {
      orows[i] = {out[i]};
      grows[i].assign(grads.begin() + i * net.d_in,
                      grads.begin() + (i + 1) * net.d_in);
    }
    sdfnet::write_csv(argv[3], orows);
    sdfnet::write_csv(argv[4], grows);
    std::printf("parity_main: evaluated %zu points\n", n);
    return 0;
  } catch (const std::exception& e) {
    std::fprintf(stderr, "parity_main: %s\n", e.what());
    return 1;
  }
}
