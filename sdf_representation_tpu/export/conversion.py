"""Export orchestration: trained checkpoint -> native formats + parity
fixtures.

Role of reference utils/inference_conversion.py:23-110: rebuild the
compatible architecture, export (TorchScript/ONNX there; .sdfw/ONNX here) and
write random input/output CSV fixtures so the independent C++ runtime can be
diffed elementwise (the reference's difference.csv shows ~1e-7 — the same
bar applies to native/parity_main)."""

from __future__ import annotations

import os

import jax
import numpy as np

from ..ops.diffops import sdf_and_gradient
from .native_format import save_sdfw
from .onnx_export import save_as_onnx


def save_for_native(
    out_dir: str, model, params, onnx: bool = True, quantized: bool = True
) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    paths = {"sdfw": save_sdfw(os.path.join(out_dir, "model.sdfw"), model, params)}
    if onnx:
        paths["onnx"] = save_as_onnx(
            os.path.join(out_dir, "model.onnx"), model, params
        )
        if quantized and hasattr(model, "skip_in"):
            # the reference's quantize_save step (utils/
            # inference_conversion.py:113-114): a small int8-weight ONNX
            # artifact next to the f32 one
            paths["onnx_quant"] = save_as_onnx(
                os.path.join(out_dir, "model_quant.onnx"), model, params,
                quantize=True,
            )
        # structural (ORT-load-strictness) lint: a model.onnx that would be
        # rejected by Ort::Session must never leave the exporter
        from .onnx_lint import lint_onnx

        for key in ("onnx", "onnx_quant"):
            if key not in paths:
                continue
            problems = lint_onnx(paths[key])
            if problems:
                raise RuntimeError(
                    f"exported {os.path.basename(paths[key])} failed the "
                    "ORT-strictness lint:\n  " + "\n  ".join(problems)
                )
    return paths


def write_parity_fixtures(
    out_dir: str, model, params, n_points: int = 64, seed: int = 0
) -> dict:
    """input.csv / output.csv / gradient.csv for the C++ parity harness
    (cf. inference_conversion.py:56-64 and ops/conversion_test fixtures)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n_points, model.d_in)).astype(np.float32)
    # full-precision matmuls: on TPU the default is bf16 passes, which would
    # bake ~1e-3 error into the parity reference the C++ runtime is diffed
    # against (the ~1e-7 bar of the reference's difference.csv needs f32)
    with jax.default_matmul_precision("float32"):
        vals, grads = sdf_and_gradient(model.apply, params, pts)
    vals = np.asarray(vals, np.float64)
    grads = np.asarray(grads, np.float64)

    inp_path = os.path.join(out_dir, "input.csv")
    np.savetxt(inp_path, pts, delimiter=",", fmt="%.9g")
    out_path = os.path.join(out_dir, "output.csv")
    np.savetxt(out_path, vals[:, None], delimiter=",", fmt="%.9g")
    grad_path = os.path.join(out_dir, "gradient.csv")
    np.savetxt(grad_path, grads, delimiter=",", fmt="%.9g")
    return {"input": inp_path, "output": out_path, "gradient": grad_path}
