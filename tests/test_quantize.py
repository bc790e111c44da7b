"""Int8 quantization: round-trip, accuracy bound, C++ runtime consumption."""

import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_representation_tpu.export.quantize import (
    dequantize_params,
    load_sdfw_any,
    quantize_params,
    save_sdfw_quantized,
)
from sdf_representation_tpu.models import ImplicitNet

# native_build fixture lives in tests/conftest.py (session-shared build dir).


@pytest.fixture(scope="module")
def model_params():
    model = ImplicitNet(d_in=3, hidden_dims=(64,) * 4, skip_in=(2,), beta=100.0)
    return model, model.init(jax.random.PRNGKey(0))


def test_quantize_dequantize_error_bound(model_params):
    model, params = model_params
    deq = dequantize_params(quantize_params(params))
    for orig, got in zip(params["layers"], deq["layers"]):
        w = np.asarray(orig["w"])
        err = np.abs(w - got["w"])
        # symmetric per-channel int8: error <= scale/2 per element
        scale = np.abs(w).max(axis=0) / 127.0
        assert np.all(err <= scale[None, :] * 0.5 + 1e-9)


def test_quantized_forward_close(model_params):
    model, params = model_params
    deq = dequantize_params(quantize_params(params))
    deq = jax.tree_util.tree_map(jnp.asarray, deq)
    pts = np.random.default_rng(0).uniform(-1, 1, (256, 3)).astype(np.float32)
    a = np.asarray(model.apply(params, jnp.asarray(pts)))
    b = np.asarray(model.apply(deq, jnp.asarray(pts)))
    assert np.abs(a - b).max() < 0.05


def test_sdfw_v2_roundtrip(tmp_path, model_params):
    model, params = model_params
    p = str(tmp_path / "q.sdfw")
    save_sdfw_quantized(p, model, params)
    arch, loaded = load_sdfw_any(p)
    assert arch["hidden_dims"] == [64] * 4
    deq = dequantize_params(quantize_params(params))
    for a, b in zip(deq["layers"], loaded["layers"]):
        np.testing.assert_allclose(a["w"], b["w"], rtol=1e-6)
    # ~4x smaller than float32
    from sdf_representation_tpu.export import save_sdfw

    pf = str(tmp_path / "f.sdfw")
    save_sdfw(pf, model, params)
    assert os.path.getsize(p) < 0.45 * os.path.getsize(pf)


def test_cpp_reads_quantized(tmp_path, model_params, native_build):
    model, params = model_params
    from sdf_representation_tpu.export.conversion import write_parity_fixtures

    q = str(tmp_path / "model.sdfw")
    save_sdfw_quantized(q, model, params)
    fixtures = write_parity_fixtures(str(tmp_path), model, params, n_points=64)
    out_csv = os.path.join(str(tmp_path), "o.csv")
    subprocess.run(
        [os.path.join(native_build, "parity_main"), q,
         fixtures["input"], out_csv, os.path.join(str(tmp_path), "g.csv")],
        check=True, capture_output=True,
    )
    got = np.loadtxt(out_csv, delimiter=",")
    ref = np.loadtxt(fixtures["output"], delimiter=",")
    # int8 weights: close but not exact
    assert np.abs(got - ref).max() < 0.05


def test_cpp_reads_quantized_onnx(tmp_path, model_params, native_build):  # noqa: F811
    """deeptrace consumes model_quant.onnx: its load-time DequantizeLinear
    folding must reproduce the Python-dequantized apply to f32 eps — the
    quantized artifact is a first-class citizen of BOTH independent
    consumers (reference contract: quantize_save feeds the same ORT
    pipeline as model.onnx)."""
    from sdf_representation_tpu.export.conversion import save_for_native

    model, params = model_params
    out = str(tmp_path)
    paths = save_for_native(out, model, params, onnx=True, quantized=True)
    assert os.path.basename(paths["onnx_quant"]) == "model_quant.onnx"

    cfg = tmp_path / "config.txt"
    cfg.write_text(
        "refine_lvl_uni = 1\nrefine_lvl_bd = 3\n"
        f'ModelFileName = "{paths["onnx_quant"]}"\nuseDeepLearning = true\n'
    )
    subprocess.run(
        [os.path.join(native_build, "deeptrace"), str(cfg), out],
        check=True, capture_output=True,
    )
    pts = np.loadtxt(os.path.join(out, "points.csv"), delimiter=",")
    deq = dequantize_params(quantize_params(params))
    ref = np.asarray(model.apply(deq, jnp.asarray(pts[:, :3], jnp.float32)))
    np.testing.assert_allclose(pts[:, 3], ref, rtol=1e-4, atol=1e-5)
