// deeptrace — native octree-refinement consumer of the exported SDF net.
//
// Rebuild of the reference's DeepTrace bridge
// (reference ops/DeepTrace/src/deeptrace.cpp:30-100: loads model.onnx via
// ONNX Runtime, evaluates per-point SDF + input gradients for the downstream
// octree mesher; config format ops/DeepTrace/sample_inputs/config.txt with
// refine levels, cube/physical domains, ModelFileName, useDeepLearning).
//
// This implementation goes further than the reference (which only streams
// points through the net): it performs the octree refinement itself —
// starting from the cube domain it subdivides every cell whose SDF interval
// |f(center)| <= k * cell_half_diagonal can contain the zero level set, down
// to refine_lvl_bd, evaluating the network natively (sdfnet.hpp, analytic
// gradients, multithreaded). Outputs:
//   cells.csv   — leaf cells: cx,cy,cz,half,level,boundary(0/1)
//   points.csv  — cell-center SDF + gradient: x,y,z,S,nx,ny,nz
//
// usage: deeptrace config.txt [output_dir]

#include <array>
#include <cmath>
#include <cstdio>
#include <fstream>
#include <functional>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

#include "onnx_net.hpp"
#include "sdfnet.hpp"

namespace {

// config.txt parsing: KEY = VALUE with #-comments, quoted strings,
// [a, b, c] vectors, booleans (format of the reference sample config)
struct Config {
  std::map<std::string, std::string> kv;

  static Config load(const std::string& path) {
    std::ifstream f(path);
    if (!f) throw std::runtime_error("cannot open " + path);
    Config c;
    std::string line;
    while (std::getline(f, line)) {
      auto hash = line.find('#');
      if (hash != std::string::npos) line = line.substr(0, hash);
      auto eq = line.find('=');
      if (eq == std::string::npos) continue;
      auto trim = [](std::string s) {
        const char* ws = " \t\r\n\"";
        auto a = s.find_first_not_of(ws);
        auto b = s.find_last_not_of(ws);
        return a == std::string::npos ? std::string()
                                      : s.substr(a, b - a + 1);
      };
      c.kv[trim(line.substr(0, eq))] = trim(line.substr(eq + 1));
    }
    return c;
  }

  std::string str(const std::string& k, const std::string& dflt = "") const {
    auto it = kv.find(k);
    return it == kv.end() ? dflt : it->second;
  }
  long integer(const std::string& k, long dflt) const {
    auto it = kv.find(k);
    return it == kv.end() ? dflt : std::stol(it->second);
  }
  bool boolean(const std::string& k, bool dflt) const {
    auto it = kv.find(k);
    if (it == kv.end()) return dflt;
    return it->second == "true" || it->second == "True" || it->second == "1";
  }
  std::array<double, 3> vec3(const std::string& k,
                             std::array<double, 3> dflt) const {
    auto it = kv.find(k);
    if (it == kv.end()) return dflt;
    std::string s = it->second;
    for (char& ch : s)
      if (ch == '[' || ch == ']') ch = ' ';
    std::stringstream ss(s);
    std::array<double, 3> v = dflt;
    std::string tok;
    int i = 0;
    while (std::getline(ss, tok, ',') && i < 3) v[i++] = std::stod(tok);
    return v;
  }
};

struct Cell {
  double cx, cy, cz, half;
  int level;
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s config.txt [output_dir]\n", argv[0]);
    return 2;
  }
  try {
    Config cfg = Config::load(argv[1]);
    std::string out_dir = argc > 2 ? argv[2] : ".";

    if (!cfg.boolean("useDeepLearning", true)) {
      std::fprintf(stderr,
                   "deeptrace: useDeepLearning=false — nothing to do "
                   "(mesh-based tracing is handled upstream)\n");
      return 0;
    }
    std::string model_file = cfg.str("ModelFileName", "model.sdfw");
    // model.onnx is consumed DIRECTLY (onnx_net.hpp wire reader +
    // forward-mode interpreter — the reference's ORT role,
    // reference ops/DeepTrace/src/deeptrace.cpp:30-71); .sdfw takes the
    // optimized register-blocked runtime (sdfnet.hpp)
    // the lambdas capture their shared_ptr by value — model lifetime is
    // tied to `eval` itself
    std::function<void(const float*, std::size_t, float*, float*)> eval;
    if (model_file.size() > 5 &&
        model_file.substr(model_file.size() - 5) == ".onnx") {
      auto net = std::make_shared<onnxnet::Model>(
          onnxnet::Model::load(model_file));
      eval = [net](const float* p, std::size_t n, float* s, float* g) {
        net->evaluate(p, n, s, g);
      };
    } else {
      auto net = std::make_shared<sdfnet::ImplicitNet>(
          sdfnet::ImplicitNet::load(model_file));
      eval = [net](const float* p, std::size_t n, float* s, float* g) {
        net->evaluate(p, n, s, g);
      };
    }
    auto lo = cfg.vec3("cubeDomainMin", {-1.0, -1.0, -1.0});
    auto hi = cfg.vec3("cubeDomainMax", {1.0, 1.0, 1.0});
    int lvl_uni = static_cast<int>(cfg.integer("refine_lvl_uni", 3));
    int lvl_bd = static_cast<int>(cfg.integer("refine_lvl_bd", 5));

    // uniform refinement to lvl_uni, then boundary refinement to lvl_bd
    std::vector<Cell> leaves;
    Cell root{(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, (lo[2] + hi[2]) / 2,
              (hi[0] - lo[0]) / 2, 0};
    std::vector<Cell> frontier{root};
    auto subdivide = [](const Cell& c, std::vector<Cell>& out) {
      double h = c.half / 2;
      for (int dx = -1; dx <= 1; dx += 2)
        for (int dy = -1; dy <= 1; dy += 2)
          for (int dz = -1; dz <= 1; dz += 2)
            out.push_back(
                {c.cx + dx * h, c.cy + dy * h, c.cz + dz * h, h, c.level + 1});
    };

    while (!frontier.empty()) {
      std::vector<Cell> next;
      std::vector<Cell> evaluate_cells;
      for (const Cell& c : frontier) {
        if (c.level < lvl_uni) {
          subdivide(c, next);
        } else if (c.level < lvl_bd) {
          evaluate_cells.push_back(c);
        } else {
          leaves.push_back(c);
        }
      }
      if (!evaluate_cells.empty()) {
        // batch-evaluate centers; refine cells that may contain the surface
        std::vector<float> pts(evaluate_cells.size() * 3);
        for (std::size_t i = 0; i < evaluate_cells.size(); ++i) {
          pts[i * 3 + 0] = static_cast<float>(evaluate_cells[i].cx);
          pts[i * 3 + 1] = static_cast<float>(evaluate_cells[i].cy);
          pts[i * 3 + 2] = static_cast<float>(evaluate_cells[i].cz);
        }
        std::vector<float> sdf(evaluate_cells.size());
        eval(pts.data(), evaluate_cells.size(), sdf.data(), nullptr);
        for (std::size_t i = 0; i < evaluate_cells.size(); ++i) {
          const Cell& c = evaluate_cells[i];
          double diag = c.half * std::sqrt(3.0);
          if (std::fabs(sdf[i]) <= 1.2 * diag) {
            subdivide(c, next);
          } else {
            leaves.push_back(c);
          }
        }
      }
      frontier.swap(next);
    }

    // final evaluation: SDF + gradient at every leaf center
    std::vector<float> pts(leaves.size() * 3), sdf(leaves.size()),
        grads(leaves.size() * 3);
    for (std::size_t i = 0; i < leaves.size(); ++i) {
      pts[i * 3 + 0] = static_cast<float>(leaves[i].cx);
      pts[i * 3 + 1] = static_cast<float>(leaves[i].cy);
      pts[i * 3 + 2] = static_cast<float>(leaves[i].cz);
    }
    eval(pts.data(), leaves.size(), sdf.data(), grads.data());

    std::vector<std::vector<float>> cells(leaves.size()), points(leaves.size());
    std::size_t n_boundary = 0;
    for (std::size_t i = 0; i < leaves.size(); ++i) {
      const Cell& c = leaves[i];
      double diag = c.half * std::sqrt(3.0);
      bool boundary = std::fabs(sdf[i]) <= 1.2 * diag;
      n_boundary += boundary;
      cells[i] = {static_cast<float>(c.cx), static_cast<float>(c.cy),
                  static_cast<float>(c.cz), static_cast<float>(c.half),
                  static_cast<float>(c.level), boundary ? 1.0f : 0.0f};
      points[i] = {pts[i * 3], pts[i * 3 + 1], pts[i * 3 + 2], sdf[i],
                   grads[i * 3], grads[i * 3 + 1], grads[i * 3 + 2]};
    }
    sdfnet::write_csv(out_dir + "/cells.csv", cells);
    sdfnet::write_csv(out_dir + "/points.csv", points);
    std::printf("deeptrace: %zu leaf cells (%zu boundary), levels %d..%d\n",
                leaves.size(), n_boundary, lvl_uni, lvl_bd);
    return 0;
  } catch (const std::exception& e) {
    std::fprintf(stderr, "deeptrace: %s\n", e.what());
    return 1;
  }
}
