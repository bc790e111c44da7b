"""Independent-evaluator validation of the exported model.onnx.

The evaluator (export/onnx_eval.py) carries its own wire-format parser and a
generic node executor — it shares NO code with the exporter — so a writer
bug in Gemm attributes, initializer layout, or field encodings fails here
instead of inside a real ONNX Runtime consumer
(cf. reference ops/DeepTrace/src/deeptrace.cpp:30-33)."""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_representation_tpu.export.onnx_export import save_as_onnx
from sdf_representation_tpu.export.onnx_eval import load_model, run_onnx
from sdf_representation_tpu.models import ImplicitNet


@pytest.mark.parametrize(
    "skip,beta",
    [((2,), 100.0), ((), 100.0), ((2,), 0.0), ((), 0.0)],
)
def test_exported_onnx_matches_apply(tmp_path, skip, beta):
    model = ImplicitNet(d_in=3, hidden_dims=(64,) * 4, skip_in=skip, beta=beta)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "model.onnx")
    save_as_onnx(path, model, params)

    pts = np.random.default_rng(0).uniform(-1, 1, (257, 3)).astype(np.float32)
    ref = np.asarray(model.apply(params, jnp.asarray(pts)), np.float64)
    out = run_onnx(path, {"points": pts})
    assert set(out) == {"sdf"}
    got = out["sdf"].reshape(-1).astype(np.float64)
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)


def test_parser_is_not_circular(tmp_path):
    """The evaluator must read the graph structurally (nodes, initializers,
    dynamic-batch inputs), not pattern-match the writer."""
    model = ImplicitNet(d_in=3, hidden_dims=(32,) * 2, skip_in=(1,), beta=50.0)
    params = model.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "m.onnx")
    save_as_onnx(path, model, params)
    nodes, inits, ins, outs = load_model(path)
    assert ins == ["points"] and outs == ["sdf"]
    ops = [n[0] for n in nodes]
    assert "Gemm" in ops and "Concat" in ops and "Softplus" in ops
    # initializer layout: W stored (in, out) row-major; layer 0 feeds the
    # skip at layer 1 so its fan_out shrinks by d_in (32 - 3 = 29)
    assert inits["W0"].shape == tuple(model.layer_shapes()[0])
    # a corrupted byte stream must not parse silently
    data = bytearray(open(path, "rb").read())
    with pytest.raises(Exception):
        bad = tmp_path / "bad.onnx"
        bad.write_bytes(bytes(data[: len(data) // 2]))
        run_onnx(str(bad), {"points": np.zeros((4, 3), np.float32)})


def _mini_model(nodes_payload: bytes, inits: bytes, in_name="x", out_name="y"):
    """Hand-build a tiny ModelProto via a THIRD, inline encoder (so neither
    the exporter nor the evaluator defines the fixture)."""

    def varint(v):
        out = b""
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b | 0x80])
            else:
                return out + bytes([b])

    def tag(field, wt):
        return varint((field << 3) | wt)  # field keys >= 16 need varints

    def ld(field, payload):
        return tag(field, 2) + varint(len(payload)) + payload

    def vi(name):
        shape = ld(1, tag(1, 0) + varint(1))  # dim_value 1 (unused)
        ttype = ld(1, tag(1, 0) + varint(1) + ld(2, shape))
        return ld(1, name.encode()) + ld(2, ttype)

    graph = nodes_payload + inits + ld(2, b"mini") + ld(11, vi(in_name)) + ld(
        12, vi(out_name)
    )
    model = (
        tag(1, 0) + varint(8)
        + ld(7, graph)
        + ld(8, ld(1, b"") + tag(2, 0) + varint(13))
    )
    return model, ld, tag, varint


def test_gemm_attributes_honoured(tmp_path):
    """Adversarial: a Gemm with NON-default alpha/beta/transB and an
    initializer in packed float_data form must evaluate correctly — this
    fails if the evaluator hardcodes the exporter's conventions."""

    def varint(v):
        out = b""
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b | 0x80])
            else:
                return out + bytes([b])

    def tag(field, wt):
        return varint((field << 3) | wt)  # field keys >= 16 need varints

    def ld(field, payload):
        return tag(field, 2) + varint(len(payload)) + payload

    rng = np.random.default_rng(2)
    W = rng.normal(size=(5, 4)).astype(np.float32)  # stored (out, in): transB=1
    C = rng.normal(size=(5,)).astype(np.float32)

    # W as packed float_data (field 4), dims packed (field 1, LEN)
    wdims = varint(5) + varint(4)
    wt_payload = (
        ld(1, wdims) + tag(2, 0) + varint(1) + ld(8, b"W")
        + ld(4, W.tobytes())
    )
    c_payload = (
        tag(1, 0) + varint(5) + tag(2, 0) + varint(1) + ld(8, b"C")
        + ld(9, C.tobytes())
    )
    inits = ld(5, wt_payload) + ld(5, c_payload)

    def attr_f(name, v):
        return ld(5, ld(1, name.encode()) + tag(2, 5) + struct.pack("<f", v)
                  + tag(20, 0) + varint(1))

    def attr_i(name, v):
        return ld(5, ld(1, name.encode()) + tag(3, 0) + varint(v)
                  + tag(20, 0) + varint(2))

    node = ld(
        1,
        ld(1, b"x") + ld(1, b"W") + ld(1, b"C") + ld(2, b"y")
        + ld(3, b"g") + ld(4, b"Gemm")
        + attr_f("alpha", 0.5) + attr_f("beta", 2.0) + attr_i("transB", 1),
    )

    model, *_ = _mini_model(node, inits)
    path = tmp_path / "gemm.onnx"
    path.write_bytes(model)

    x = rng.normal(size=(7, 4)).astype(np.float32)
    out = run_onnx(str(path), {"x": x})["y"]
    expected = 0.5 * (x @ W.T) + 2.0 * C
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


def test_multi_skip_export_single_shared_constant(tmp_path):
    """Two skip layers must not emit duplicate initializer names."""
    model = ImplicitNet(d_in=3, hidden_dims=(32,) * 5, skip_in=(2, 4),
                        beta=100.0)
    params = model.init(jax.random.PRNGKey(3))
    path = str(tmp_path / "m.onnx")
    save_as_onnx(path, model, params)
    _, inits, _, _ = load_model(path)
    pts = np.random.default_rng(4).uniform(-1, 1, (64, 3)).astype(np.float32)
    ref = np.asarray(model.apply(params, jnp.asarray(pts)))
    got = run_onnx(path, {"points": pts})["sdf"].reshape(-1)
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)


def test_quantized_onnx_matches_dequantized_apply(tmp_path):
    """The int8-weight model_quant.onnx (DequantizeLinear graph — the
    reference's quantize_save artifact, utils/inference_conversion.py:113-114)
    must reproduce apply() with DEQUANTIZED params to f32 eps (same scales,
    so the graphs are numerically identical), and stay within the int8
    quantization error of the f32 model."""
    from sdf_representation_tpu.export.onnx_export import (
        save_as_onnx_quantized)
    from sdf_representation_tpu.export.quantize import (
        dequantize_params, quantize_params)

    model = ImplicitNet(d_in=3, hidden_dims=(64,) * 4, skip_in=(2,),
                        beta=100.0)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "model_quant.onnx")
    save_as_onnx_quantized(path, model, params)
    # the artifact must be substantially smaller than the f32 one
    f32_path = str(tmp_path / "model.onnx")
    save_as_onnx(f32_path, model, params)
    import os
    assert os.path.getsize(path) < 0.35 * os.path.getsize(f32_path)

    nodes, inits, _, _ = load_model(path)
    ops = [n[0] for n in nodes]
    assert ops.count("DequantizeLinear") == 5  # one per linear layer
    assert inits["Wq0"].dtype == np.int8

    pts = np.random.default_rng(0).uniform(-1, 1, (257, 3)).astype(np.float32)
    got = run_onnx(path, {"points": pts})["sdf"].reshape(-1)

    deq = dequantize_params(quantize_params(model.export_params(params)
                                            if hasattr(model, "export_params")
                                            else params))
    ref_q = np.asarray(model.apply(deq, jnp.asarray(pts)))
    np.testing.assert_allclose(got, ref_q, rtol=2e-6, atol=2e-6)

    # int8 tolerance vs the true f32 model: loose, but must be sane
    ref = np.asarray(model.apply(params, jnp.asarray(pts)))
    assert np.max(np.abs(got - ref)) < 0.05
