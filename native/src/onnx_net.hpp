// onnx_net — dependency-free native consumer of the exported model.onnx.
//
// Closes the reference's artifact contract natively: the reference's
// DeepTrace loads model.onnx through ONNX Runtime and evaluates the SDF
// per point (reference ops/DeepTrace/src/deeptrace.cpp:30-71; the artifact
// is written by utils/inference_conversion.py:101-110). This image carries
// no onnxruntime, so this header parses the protobuf wire format directly
// and interprets the graph with FORWARD-MODE input tangents, giving
// analytic gradients for the same op subset the exporter emits
// (export/onnx_export.py, linted ORT-strict by export/onnx_lint.py):
//
//   Gemm (transA=transB=0, alpha=beta=1)   — x@W + b
//   Mul / Div with a scalar initializer    — Softplus-beta scaffolding
//   Softplus / Relu / Tanh                 — activations
//   Concat (axis=1)                        — skip connections
//   Identity                               — output alias
//   DequantizeLinear (int8 weights)        — constant-folded at load, the
//                                            quantized model.onnx form
//
// Anything else raises, exactly like the Python evaluator
// (export/onnx_eval.py). Shapes are (batch, cols) row-major f32 matrices.

#pragma once

#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

namespace onnxnet {

// ---------------------------------------------------------------------------
// protobuf wire-format primitives
// ---------------------------------------------------------------------------

struct Slice {
  const uint8_t* p;
  std::size_t n;
};

inline uint64_t read_varint(const uint8_t*& p, const uint8_t* end) {
  uint64_t v = 0;
  int shift = 0;
  while (p < end) {
    uint8_t b = *p++;
    v |= static_cast<uint64_t>(b & 0x7f) << shift;
    if (!(b & 0x80)) return v;
    shift += 7;
    if (shift > 63) break;
  }
  throw std::runtime_error("onnx: truncated varint");
}

// Walk a length-delimited message, calling visit(field_number, wire_type,
// payload_slice_or_varint). For wire type 2 the slice points at the bytes;
// for 0 the varint value is passed via the slice pointer-as-value hack
// avoided — we pass both explicitly.
template <typename F>
inline void walk(Slice msg, F&& visit) {
  const uint8_t* p = msg.p;
  const uint8_t* end = msg.p + msg.n;
  while (p < end) {
    uint64_t key = read_varint(p, end);
    uint32_t field = static_cast<uint32_t>(key >> 3);
    uint32_t wire = static_cast<uint32_t>(key & 7);
    switch (wire) {
      case 0: {  // varint
        uint64_t v = read_varint(p, end);
        visit(field, wire, Slice{nullptr, 0}, v);
        break;
      }
      case 1: {  // 64-bit
        if (end - p < 8) throw std::runtime_error("onnx: truncated i64");
        visit(field, wire, Slice{p, 8}, 0);
        p += 8;
        break;
      }
      case 2: {  // length-delimited
        uint64_t len = read_varint(p, end);
        if (static_cast<uint64_t>(end - p) < len)
          throw std::runtime_error("onnx: truncated bytes");
        visit(field, wire, Slice{p, static_cast<std::size_t>(len)}, 0);
        p += len;
        break;
      }
      case 5: {  // 32-bit
        if (end - p < 4) throw std::runtime_error("onnx: truncated i32");
        visit(field, wire, Slice{p, 4}, 0);
        p += 4;
        break;
      }
      default:
        throw std::runtime_error("onnx: unsupported wire type " +
                                 std::to_string(wire));
    }
  }
}

inline std::string to_str(Slice s) {
  return std::string(reinterpret_cast<const char*>(s.p), s.n);
}

// ---------------------------------------------------------------------------
// model structures
// ---------------------------------------------------------------------------

struct Tensor {
  std::vector<int64_t> dims;
  std::vector<float> data;    // f32 payload (or dequantized view)
  std::vector<int8_t> i8;     // int8 payload (quantized weights)
  int64_t dtype = 1;          // TensorProto.DataType: 1=float, 3=int8
  bool scalar() const {
    int64_t n = 1;
    for (int64_t d : dims) n *= d;
    return n == 1;
  }
};

struct Node {
  std::string op, name;
  std::vector<std::string> inputs, outputs;
  std::map<std::string, int64_t> attr_i;
  std::map<std::string, float> attr_f;
};

class Model {
 public:
  std::map<std::string, Tensor> init;
  std::vector<Node> nodes;
  std::string input_name, output_name;
  int64_t d_in = 0;

  static Model load(const std::string& path) {
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) throw std::runtime_error("cannot open " + path);
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(static_cast<std::size_t>(sz));
    if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
      std::fclose(f);
      throw std::runtime_error("short read: " + path);
    }
    std::fclose(f);
    Model m;
    Slice graph{nullptr, 0};
    walk(Slice{buf.data(), buf.size()},
         [&](uint32_t field, uint32_t wire, Slice s, uint64_t) {
           if (field == 7 && wire == 2) graph = s;  // ModelProto.graph
         });
    if (!graph.p) throw std::runtime_error("onnx: no graph in " + path);
    m.parse_graph(graph);
    return m;
  }

  // forward (+ optional forward-mode input gradients) for (n, d_in) points
  void evaluate(const float* pts, std::size_t n, float* sdf,
                float* grads = nullptr) const {
    const std::size_t nt = grads ? static_cast<std::size_t>(d_in) : 0;
    // value + nt tangent planes per named tensor: (1+nt) matrices each
    // (n x cols) row-major
    struct Var {
      std::size_t cols = 0;
      std::vector<float> v;                  // n*cols
      std::vector<std::vector<float>> t;     // nt of n*cols
    };
    std::map<std::string, Var> env;

    {
      Var x;
      x.cols = static_cast<std::size_t>(d_in);
      x.v.assign(pts, pts + n * x.cols);
      x.t.resize(nt);
      for (std::size_t k = 0; k < nt; ++k) {
        x.t[k].assign(n * x.cols, 0.0f);
        for (std::size_t i = 0; i < n; ++i) x.t[k][i * x.cols + k] = 1.0f;
      }
      env[input_name] = std::move(x);
    }

    auto scalar_of = [&](const std::string& name) -> float {
      auto it = init.find(name);
      if (it == init.end() || !it->second.scalar())
        throw std::runtime_error("onnx: operand " + name +
                                 " must be a scalar initializer");
      return it->second.data[0];
    };

    for (const Node& nd : nodes) {
      Var out;
      if (nd.op == "Gemm") {
        const Var& a = env.at(nd.inputs[0]);
        auto wi = init.find(nd.inputs[1]);
        auto bi = init.find(nd.inputs[2]);
        if (wi == init.end() || bi == init.end())
          throw std::runtime_error("onnx: Gemm weights must be initializers");
        if (nd.attr_i.count("transA") && nd.attr_i.at("transA"))
          throw std::runtime_error("onnx: Gemm transA unsupported");
        if (nd.attr_i.count("transB") && nd.attr_i.at("transB"))
          throw std::runtime_error("onnx: Gemm transB unsupported");
        const Tensor& W = wi->second;
        const Tensor& B = bi->second;
        if (W.dims.size() != 2 ||
            static_cast<std::size_t>(W.dims[0]) != a.cols)
          throw std::runtime_error("onnx: Gemm shape mismatch at " + nd.name);
        std::size_t in_c = a.cols,
                    out_c = static_cast<std::size_t>(W.dims[1]);
        out.cols = out_c;
        auto matmul = [&](const std::vector<float>& src,
                          std::vector<float>& dst, bool add_bias) {
          dst.assign(n * out_c, 0.0f);
          for (std::size_t i = 0; i < n; ++i) {
            const float* xi = src.data() + i * in_c;
            float* yi = dst.data() + i * out_c;
            if (add_bias) std::memcpy(yi, B.data.data(), out_c * sizeof(float));
            for (std::size_t j = 0; j < in_c; ++j) {
              float xv = xi[j];
              if (xv == 0.0f) continue;
              const float* wr = W.data.data() + j * out_c;
              for (std::size_t o = 0; o < out_c; ++o) yi[o] += xv * wr[o];
            }
          }
        };
        matmul(a.v, out.v, true);
        out.t.resize(nt);
        for (std::size_t k = 0; k < nt; ++k) matmul(a.t[k], out.t[k], false);
      } else if (nd.op == "Mul" || nd.op == "Div") {
        const Var& a = env.at(nd.inputs[0]);
        float s = scalar_of(nd.inputs[1]);
        if (nd.op == "Div") {
          if (s == 0.0f) throw std::runtime_error("onnx: Div by zero");
          s = 1.0f / s;
        }
        out.cols = a.cols;
        out.v.resize(a.v.size());
        for (std::size_t i = 0; i < a.v.size(); ++i) out.v[i] = a.v[i] * s;
        out.t.resize(nt);
        for (std::size_t k = 0; k < nt; ++k) {
          out.t[k].resize(a.v.size());
          for (std::size_t i = 0; i < a.v.size(); ++i)
            out.t[k][i] = a.t[k][i] * s;
        }
      } else if (nd.op == "Softplus" || nd.op == "Relu" || nd.op == "Tanh") {
        const Var& a = env.at(nd.inputs[0]);
        out.cols = a.cols;
        out.v.resize(a.v.size());
        std::vector<float> dv(nt ? a.v.size() : 0);
        for (std::size_t i = 0; i < a.v.size(); ++i) {
          float x = a.v[i];
          if (nd.op == "Softplus") {
            // stable log(1+exp(x)); derivative sigmoid(x)
            out.v[i] = x > 20.0f ? x : std::log1p(std::exp(x));
            if (nt) dv[i] = 1.0f / (1.0f + std::exp(-x));
          } else if (nd.op == "Relu") {
            out.v[i] = x > 0.0f ? x : 0.0f;
            if (nt) dv[i] = x > 0.0f ? 1.0f : 0.0f;
          } else {  // Tanh
            float y = std::tanh(x);
            out.v[i] = y;
            if (nt) dv[i] = 1.0f - y * y;
          }
        }
        out.t.resize(nt);
        for (std::size_t k = 0; k < nt; ++k) {
          out.t[k].resize(a.v.size());
          for (std::size_t i = 0; i < a.v.size(); ++i)
            out.t[k][i] = a.t[k][i] * dv[i];
        }
      } else if (nd.op == "Concat") {
        // variadic, like ONNX Concat proper — every input contributes
        if (!nd.attr_i.count("axis") || nd.attr_i.at("axis") != 1)
          throw std::runtime_error("onnx: Concat needs axis=1");
        if (nd.inputs.empty())
          throw std::runtime_error("onnx: Concat without inputs");
        std::vector<const Var*> parts;
        out.cols = 0;
        for (const auto& in_name : nd.inputs) {
          parts.push_back(&env.at(in_name));
          out.cols += parts.back()->cols;
        }
        auto cat = [&](int plane, std::vector<float>& vo) {
          vo.resize(n * out.cols);
          for (std::size_t i = 0; i < n; ++i) {
            float* dst = vo.data() + i * out.cols;
            for (const Var* p : parts) {
              const std::vector<float>& vp =
                  plane < 0 ? p->v : p->t[static_cast<std::size_t>(plane)];
              std::memcpy(dst, vp.data() + i * p->cols,
                          p->cols * sizeof(float));
              dst += p->cols;
            }
          }
        };
        cat(-1, out.v);
        out.t.resize(nt);
        for (std::size_t k = 0; k < nt; ++k)
          cat(static_cast<int>(k), out.t[k]);
      } else if (nd.op == "Identity") {
        out = env.at(nd.inputs[0]);
      } else {
        throw std::runtime_error("onnx: op " + nd.op + " not supported");
      }
      env[nd.outputs[0]] = std::move(out);
    }

    const Var& y = env.at(output_name);
    if (y.cols != 1)
      throw std::runtime_error("onnx: output must be (batch, 1)");
    std::memcpy(sdf, y.v.data(), n * sizeof(float));
    if (grads) {
      for (std::size_t i = 0; i < n; ++i)
        for (std::size_t k = 0; k < nt; ++k)
          grads[i * nt + k] = y.t[k][i];
    }
  }

 private:
  void parse_graph(Slice graph) {
    walk(graph, [&](uint32_t field, uint32_t wire, Slice s, uint64_t) {
      if (wire != 2) return;
      switch (field) {
        case 1:
          nodes.push_back(parse_node(s));
          break;
        case 5: {
          Tensor t;
          std::string name = parse_tensor(s, t);
          init.emplace(std::move(name), std::move(t));
          break;
        }
        case 11:
          input_name = parse_value_info(s, &d_in);
          break;
        case 12:
          output_name = parse_value_info(s, nullptr);
          break;
        default:
          break;
      }
    });
    if (input_name.empty() || output_name.empty() || d_in <= 0)
      throw std::runtime_error("onnx: graph missing typed input/output");
    fold_dequantize();
  }

  // Constant-fold DequantizeLinear(int8 W, per-axis scale[, zero_point])
  // whose inputs are all initializers — the quantized-weight form the
  // exporter emits (export/onnx_export.py save_as_onnx(quantize=True),
  // mirroring the reference's quantize_save artifact,
  // reference utils/inference_conversion.py:113-114). The folded float
  // tensor takes the node's output name, so downstream Gemm finds its
  // weights in `init` exactly as in the f32 graph. This is what ORT's
  // graph optimizer does at session-create.
  void fold_dequantize() {
    std::vector<Node> kept;
    kept.reserve(nodes.size());
    for (Node& nd : nodes) {
      if (nd.op != "DequantizeLinear") {
        kept.push_back(std::move(nd));
        continue;
      }
      if (nd.inputs.size() < 2 || !init.count(nd.inputs[0]) ||
          !init.count(nd.inputs[1]))
        throw std::runtime_error(
            "onnx: DequantizeLinear inputs must be initializers");
      const Tensor& xq = init.at(nd.inputs[0]);
      const Tensor& sc = init.at(nd.inputs[1]);
      if (xq.dtype != 3 || xq.dims.size() != 2)
        throw std::runtime_error(
            "onnx: DequantizeLinear expects a 2-d int8 weight");
      const Tensor* zp = nullptr;
      if (nd.inputs.size() > 2 && !nd.inputs[2].empty())
        zp = &init.at(nd.inputs[2]);
      int64_t axis = nd.attr_i.count("axis") ? nd.attr_i.at("axis") : 1;
      std::size_t rows = static_cast<std::size_t>(xq.dims[0]);
      std::size_t cols = static_cast<std::size_t>(xq.dims[1]);
      bool per_col = sc.data.size() > 1;
      if (per_col && (axis != 1 || sc.data.size() != cols))
        throw std::runtime_error(
            "onnx: per-axis DequantizeLinear scale must match axis-1 dim");
      Tensor out;
      out.dims = xq.dims;
      out.data.resize(rows * cols);
      for (std::size_t i = 0; i < rows; ++i)
        for (std::size_t j = 0; j < cols; ++j) {
          float q = static_cast<float>(xq.i8[i * cols + j]);
          if (zp)
            q -= static_cast<float>(
                zp->i8.empty() ? 0 : zp->i8[per_col ? j : 0]);
          out.data[i * cols + j] = q * (per_col ? sc.data[j] : sc.data[0]);
        }
      init[nd.outputs[0]] = std::move(out);
    }
    nodes = std::move(kept);
  }

  static Node parse_node(Slice s) {
    Node n;
    walk(s, [&](uint32_t field, uint32_t wire, Slice v, uint64_t) {
      if (wire != 2) return;
      switch (field) {
        case 1: n.inputs.push_back(to_str(v)); break;
        case 2: n.outputs.push_back(to_str(v)); break;
        case 3: n.name = to_str(v); break;
        case 4: n.op = to_str(v); break;
        case 5: {  // AttributeProto
          std::string aname;
          walk(v, [&](uint32_t f2, uint32_t w2, Slice v2, uint64_t u2) {
            if (f2 == 1 && w2 == 2) aname = to_str(v2);
            else if (f2 == 2 && w2 == 5) {
              float fv;
              std::memcpy(&fv, v2.p, 4);
              n.attr_f[aname] = fv;
            } else if (f2 == 3 && w2 == 0) {
              n.attr_i[aname] = static_cast<int64_t>(u2);
            }
          });
          break;
        }
        default: break;
      }
    });
    return n;
  }

  static std::string parse_tensor(Slice s, Tensor& t) {
    std::string name;
    int64_t dtype = 1;
    Slice raw{nullptr, 0};
    walk(s, [&](uint32_t field, uint32_t wire, Slice v, uint64_t u) {
      if (field == 1 && wire == 0) {
        t.dims.push_back(static_cast<int64_t>(u));
      } else if (field == 1 && wire == 2) {
        // packed repeated varint dims — what proto3 serializers (e.g. the
        // reference's torch.onnx export) actually emit
        const uint8_t* p = v.p;
        const uint8_t* end = v.p + v.n;
        while (p < end)
          t.dims.push_back(static_cast<int64_t>(read_varint(p, end)));
      } else if (field == 2 && wire == 0) {
        dtype = static_cast<int64_t>(u);
      } else if (field == 4 && wire == 2) {
        // packed repeated float float_data (alternative to raw_data)
        t.data.resize(v.n / 4);
        std::memcpy(t.data.data(), v.p, t.data.size() * 4);
      } else if (field == 4 && wire == 5) {
        float fv;
        std::memcpy(&fv, v.p, 4);
        t.data.push_back(fv);
      } else if (field == 8 && wire == 2) {
        name = to_str(v);
      } else if (field == 9 && wire == 2) {
        raw = v;  // dtype decides the element width below
      }
    });
    if (dtype == 1) {
      if (raw.p) {
        t.data.resize(raw.n / 4);
        std::memcpy(t.data.data(), raw.p, t.data.size() * 4);
      }
    } else if (dtype == 3) {  // int8 (quantized weights)
      if (!raw.p)
        throw std::runtime_error("onnx: int8 tensor without raw_data");
      t.i8.resize(raw.n);
      std::memcpy(t.i8.data(), raw.p, raw.n);
    } else {
      throw std::runtime_error("onnx: unsupported tensor dtype " +
                               std::to_string(dtype));
    }
    t.dtype = dtype;
    return name;
  }

  // ValueInfoProto -> name; when d_in_out, record the LAST dim_value (the
  // feature dim of [batch, d_in])
  static std::string parse_value_info(Slice s, int64_t* d_in_out) {
    std::string name;
    walk(s, [&](uint32_t field, uint32_t wire, Slice v, uint64_t) {
      if (field == 1 && wire == 2) name = to_str(v);
      else if (field == 2 && wire == 2 && d_in_out) {
        // TypeProto -> tensor_type(1) -> shape(2) -> dim(1) -> dim_value(1)
        walk(v, [&](uint32_t f2, uint32_t w2, Slice v2, uint64_t) {
          if (f2 != 1 || w2 != 2) return;
          walk(v2, [&](uint32_t f3, uint32_t w3, Slice v3, uint64_t) {
            if (f3 != 2 || w3 != 2) return;
            walk(v3, [&](uint32_t f4, uint32_t w4, Slice v4, uint64_t) {
              if (f4 != 1 || w4 != 2) return;
              walk(v4, [&](uint32_t f5, uint32_t w5, Slice, uint64_t u5) {
                if (f5 == 1 && w5 == 0) *d_in_out = static_cast<int64_t>(u5);
              });
            });
          });
        });
      }
    });
    return name;
  }
};

}  // namespace onnxnet
