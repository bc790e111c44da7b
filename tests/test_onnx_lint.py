"""ORT-strictness lint: the exported model.onnx passes, and every class of
structural damage a real Ort::Session load would reject is caught.

Mutations are applied at the WIRE level (parse -> drop/patch a field ->
re-encode) so the test exercises exactly what a consumer sees, independent
of the writer's code paths (reference contract:
ops/DeepTrace/src/deeptrace.cpp:30-33)."""

import numpy as np
import pytest

import jax

from sdf_representation_tpu.export.onnx_eval import (
    _LEN,
    _VARINT,
    _fields,
)
from sdf_representation_tpu.export.onnx_export import save_as_onnx
from sdf_representation_tpu.export.onnx_lint import lint_onnx
from sdf_representation_tpu.models import ImplicitNet


# --- generic wire-level re-encoder (test-only) -----------------------------

def _encode_key(field, wt):
    key = (field << 3) | wt
    out = b""
    while True:
        b = key & 0x7F
        key >>= 7
        if key:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _encode_varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _encode(fields_dict):
    """Inverse of onnx_eval._fields (order: ascending field number, entries
    in original order within each field — node order is preserved)."""
    out = b""
    for field in sorted(fields_dict):
        for wt, val in fields_dict[field]:
            out += _encode_key(field, wt)
            if wt == _VARINT:
                out += _encode_varint(val)
            elif wt == _LEN:
                out += _encode_varint(len(val)) + val
            else:  # I32 / I64: raw bytes
                out += val
    return out


def _mutate(path, out_path, fn):
    """Parse ModelProto, let fn mutate the top-level field dict, re-encode."""
    with open(path, "rb") as fh:
        model = _fields(fh.read())
    fn(model)
    with open(out_path, "wb") as fh:
        fh.write(_encode(model))
    return out_path


def _mutate_graph(path, out_path, fn):
    def outer(model):
        graph = _fields(model[7][0][1])
        fn(graph)
        model[7] = [(_LEN, _encode(graph))]

    return _mutate(path, out_path, outer)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    model = ImplicitNet(d_in=3, hidden_dims=(16,) * 3, skip_in=(1,), beta=100.0)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path_factory.mktemp("onnx") / "model.onnx")
    save_as_onnx(path, model, params)
    return path


def test_export_is_lint_clean(exported):
    assert lint_onnx(exported) == []


def test_export_relu_tanh_variant_clean(tmp_path):
    model = ImplicitNet(d_in=3, hidden_dims=(8,) * 2, skip_in=(), beta=0.0)
    params = model.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "m.onnx")
    save_as_onnx(path, model, params)
    assert lint_onnx(path) == []


def test_reencode_roundtrip_is_clean(exported, tmp_path):
    """The mutation harness itself must not introduce violations."""
    p = _mutate(exported, str(tmp_path / "m.onnx"), lambda m: None)
    assert lint_onnx(p) == []


@pytest.mark.parametrize(
    "name,mutation,expect",
    [
        ("drop_ir_version", lambda m: m.pop(1), "ir_version missing"),
        (
            "bad_ir_version",
            lambda m: m.__setitem__(1, [(_VARINT, 99)]),
            "ir_version 99 outside",
        ),
        ("drop_opset", lambda m: m.pop(8), "opset_import missing"),
    ],
)
def test_model_level_damage(exported, tmp_path, name, mutation, expect):
    p = _mutate(exported, str(tmp_path / f"{name}.onnx"), mutation)
    assert any(expect in e for e in lint_onnx(p)), lint_onnx(p)


def test_opset_version_out_of_range(exported, tmp_path):
    def mut(model):
        op = _fields(model[8][0][1])
        op[2] = [(_VARINT, 99)]
        model[8] = [(_LEN, _encode(op))]

    p = _mutate(exported, str(tmp_path / "m.onnx"), mut)
    assert any("default opset 99 outside" in e for e in lint_onnx(p))


def test_untyped_graph_input(exported, tmp_path):
    def mut(graph):
        vi = _fields(graph[11][0][1])
        vi.pop(2)  # ValueInfoProto.type
        graph[11] = [(_LEN, _encode(vi))]

    p = _mutate_graph(exported, str(tmp_path / "m.onnx"), mut)
    assert any("missing type" in e for e in lint_onnx(p))


def test_untyped_dim(exported, tmp_path):
    """A dim with neither dim_value nor dim_param (dropped dynamic-batch
    dim_param) must be rejected — ORT cannot bind the axis."""

    def mut(graph):
        vi = _fields(graph[11][0][1])
        tp = _fields(vi[2][0][1])
        tt = _fields(tp[1][0][1])
        shape = _fields(tt[2][0][1])
        d0 = _fields(shape[1][0][1])
        d0.pop(2, None)  # dim_param
        d0.pop(1, None)  # dim_value
        shape[1][0] = (_LEN, _encode(d0))
        tt[2] = [(_LEN, _encode(shape))]
        tp[1] = [(_LEN, _encode(tt))]
        vi[2] = [(_LEN, _encode(tp))]
        graph[11] = [(_LEN, _encode(vi))]

    p = _mutate_graph(exported, str(tmp_path / "m.onnx"), mut)
    assert any("neither dim_value" in e for e in lint_onnx(p))


def test_node_order_not_topological(exported, tmp_path):
    p = _mutate_graph(
        exported,
        str(tmp_path / "m.onnx"),
        lambda g: g.__setitem__(1, list(reversed(g[1]))),
    )
    assert any("topological order violated" in e for e in lint_onnx(p))


def test_duplicate_initializer(exported, tmp_path):
    p = _mutate_graph(
        exported,
        str(tmp_path / "m.onnx"),
        lambda g: g.__setitem__(5, g[5] + [g[5][0]]),
    )
    assert any("duplicate initializer" in e for e in lint_onnx(p))


def test_initializer_raw_data_truncated(exported, tmp_path):
    def mut(graph):
        init = _fields(graph[5][0][1])
        wt, raw = init[9][0]
        init[9] = [(wt, raw[:-4])]
        graph[5][0] = (_LEN, _encode(init))

    p = _mutate_graph(exported, str(tmp_path / "m.onnx"), mut)
    assert any("raw_data" in e and "!=" in e for e in lint_onnx(p))


def test_output_never_produced(exported, tmp_path):
    def mut(graph):
        vi = _fields(graph[12][0][1])
        vi[1] = [(_LEN, b"not_produced")]
        graph[12] = [(_LEN, _encode(vi))]

    p = _mutate_graph(exported, str(tmp_path / "m.onnx"), mut)
    assert any("never produced" in e for e in lint_onnx(p))


def test_ssa_violation(exported, tmp_path):
    def mut(graph):
        graph[1] = graph[1] + [graph[1][-1]]  # duplicate final node

    p = _mutate_graph(exported, str(tmp_path / "m.onnx"), mut)
    out = lint_onnx(p)
    assert any("violates SSA" in e for e in out), out


def test_unknown_op_type(exported, tmp_path):
    def mut(graph):
        nf = _fields(graph[1][0][1])
        nf[4] = [(_LEN, b"NotAnOp")]
        graph[1][0] = (_LEN, _encode(nf))

    p = _mutate_graph(exported, str(tmp_path / "m.onnx"), mut)
    assert any("not registered" in e for e in lint_onnx(p))


def test_concat_missing_axis(exported, tmp_path):
    def mut(graph):
        for k, (wt, raw) in enumerate(graph[1]):
            nf = _fields(raw)
            if nf.get(4) and nf[4][0][1] == b"Concat":
                nf.pop(5, None)  # attributes
                graph[1][k] = (_LEN, _encode(nf))
                return
        raise AssertionError("no Concat node in skip model")

    p = _mutate_graph(exported, str(tmp_path / "m.onnx"), mut)
    assert any("required attribute 'axis' missing" in e for e in lint_onnx(p))


def test_truncated_file(exported, tmp_path):
    with open(exported, "rb") as fh:
        data = fh.read()
    p = str(tmp_path / "trunc.onnx")
    with open(p, "wb") as fh:
        fh.write(data[: len(data) // 2])
    assert lint_onnx(p)  # any violation is acceptable; must not crash


def test_quantized_export_is_lint_clean(tmp_path):
    """The int8 DequantizeLinear graph must satisfy the same ORT-load
    strictness as the f32 artifact (raw_data byte widths for int8, op
    opset availability, SSA with the in-graph dequant outputs)."""
    from sdf_representation_tpu.export.onnx_export import (
        save_as_onnx_quantized)

    model = ImplicitNet(d_in=3, hidden_dims=(16,) * 3, skip_in=(1,),
                        beta=100.0)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "model_quant.onnx")
    save_as_onnx_quantized(path, model, params)
    assert lint_onnx(path) == []


def test_quantized_needs_opset_13(tmp_path):
    """Per-axis DequantizeLinear is an opset-13 extension; a model that
    declares opset 12 must be rejected, as ORT would."""
    from sdf_representation_tpu.export.onnx_export import (
        save_as_onnx_quantized)

    model = ImplicitNet(d_in=3, hidden_dims=(8,) * 2, skip_in=(), beta=100.0)
    params = model.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "model_quant12.onnx")
    save_as_onnx_quantized(path, model, params, opset=12)
    assert any("DequantizeLinear" in e and "opset" in e
               for e in lint_onnx(path))
