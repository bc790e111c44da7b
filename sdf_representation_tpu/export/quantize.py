"""Int8 weight quantization for exported models.

Role of the reference's ``quantize_save`` (reference
utils/inference_conversion.py:113-114 — onnxruntime dynamic quantization:
int8 weights, float compute). Same scheme here, no onnxruntime needed:
per-output-channel symmetric int8 weights + float32 scales, stored in the
.sdfw container as version 2 (tensor dtype + scale vector in the directory);
biases stay float32. The C++ runtime (sdfnet.hpp) and the Python reader both
dequantize at load, so inference math is unchanged f32 — the file is ~4x
smaller and mirrors ORT's dynamic-quant behavior.
"""

from __future__ import annotations

import json
import struct
from typing import Dict, Tuple

import numpy as np

from .native_format import MAGIC

VERSION_Q = 2


def quantize_params(params) -> Dict:
    """Per-output-channel symmetric int8 quantization of layer weights."""
    out = []
    for layer in params["layers"]:
        w = np.asarray(layer["w"], np.float32)  # (in, out)
        scale = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0  # (out,)
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        out.append(
            {"wq": q, "scale": scale.astype(np.float32),
             "b": np.asarray(layer["b"], np.float32)}
        )
    return {"layers": out}


def dequantize_params(qparams) -> Dict:
    out = []
    for layer in qparams["layers"]:
        w = layer["wq"].astype(np.float32) * layer["scale"][None, :]
        out.append({"w": w, "b": layer["b"]})
    return {"layers": out}


def save_sdfw_quantized(path: str, model, params) -> str:
    """Serialise with int8 weights (format version 2)."""
    if hasattr(model, "export_params"):
        params = model.export_params(params)
    q = quantize_params(params)
    tensors = []
    blobs = []
    for i, layer in enumerate(q["layers"]):
        tensors.append(
            {"name": f"layers.{i}.w", "shape": list(layer["wq"].shape),
             "dtype": "int8", "scale": layer["scale"].tolist()}
        )
        blobs.append(np.ascontiguousarray(layer["wq"]).tobytes())
        tensors.append(
            {"name": f"layers.{i}.b", "shape": list(layer["b"].shape),
             "dtype": "float32"}
        )
        blobs.append(np.ascontiguousarray(layer["b"]).tobytes())
    header = {
        "arch": {
            "d_in": model.d_in,
            "hidden_dims": list(model.hidden_dims),
            "skip_in": list(model.skip_in),
            "beta": float(model.beta),
        },
        "tensors": tensors,
    }
    hjson = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", VERSION_Q))
        f.write(struct.pack("<I", len(hjson)))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)
    return path


def load_sdfw_any(path: str) -> Tuple[dict, dict]:
    """Read v1 (float32) or v2 (int8-quantized) .sdfw; always returns
    dequantized float32 params."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC:
        raise ValueError(f"Not an SDFW file: {path}")
    version, hlen = struct.unpack("<II", data[4:12])
    header = json.loads(data[12 : 12 + hlen].decode("utf-8"))
    off = 12 + hlen
    layers: list = []
    for t in header["tensors"]:
        shape = tuple(t["shape"])
        dtype = t.get("dtype", "float32")
        count = int(np.prod(shape))
        if dtype == "int8":
            arr = np.frombuffer(data, dtype=np.int8, count=count, offset=off)
            off += count
            arr = arr.reshape(shape).astype(np.float32) * np.asarray(
                t["scale"], np.float32
            )[None, :]
        else:
            arr = np.frombuffer(data, dtype="<f4", count=count, offset=off)
            off += count * 4
            arr = arr.reshape(shape).copy()
        li = int(t["name"].split(".")[1])
        key = t["name"].split(".")[2]
        while len(layers) <= li:
            layers.append({})
        layers[li][key.replace("wq", "w")] = np.asarray(arr)
    return header["arch"], {"layers": layers}
