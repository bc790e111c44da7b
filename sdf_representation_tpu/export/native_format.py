"""`.sdfw` — the native weight format consumed by the C++ runtime.

Role of the reference's TorchScript export (reference
utils/inference_conversion.py:23-64 `save_as_libtorch`): a trained net
serialised for an independent native runtime, parity-checked to ~1e-7.
TorchScript needs LibTorch on the other side; `.sdfw` is a dependency-free
container any C++ program can read:

  bytes 0..3   magic  "SDFW"
  bytes 4..7   version (u32 LE)
  bytes 8..11  header length H (u32 LE)
  bytes 12..   JSON header (arch + tensor directory), then raw tensor bytes
               (float32 LE, row-major, in directory order)

JSON header:
  {"arch": {"d_in":3, "hidden_dims":[...], "skip_in":[...], "beta":100.0},
   "tensors": [{"name":"layers.0.w", "shape":[3,512]}, ...]}
"""

from __future__ import annotations

import json
import struct
from typing import Tuple

import numpy as np

MAGIC = b"SDFW"
VERSION = 1


def save_sdfw(path: str, model, params) -> str:
    """Serialise an ImplicitNet (+params) to .sdfw."""
    params = model.export_params(params) if hasattr(model, "export_params") else params
    tensors = []
    blobs = []
    for i, layer in enumerate(params["layers"]):
        for key in ("w", "b"):
            arr = np.ascontiguousarray(np.asarray(layer[key], dtype=np.float32))
            tensors.append({"name": f"layers.{i}.{key}", "shape": list(arr.shape)})
            blobs.append(arr.tobytes())
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
        f.write(struct.pack("<I", VERSION))
        f.write(struct.pack("<I", len(hjson)))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)
    return path


def load_sdfw(path: str) -> Tuple[dict, dict]:
    """Returns (arch dict, params pytree) — the Python-side reader used for
    round-trip tests and by tools."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC:
        raise ValueError(f"Not an SDFW file: {path}")
    version, hlen = struct.unpack("<II", data[4:12])
    if version != VERSION:
        raise ValueError(f"Unsupported SDFW version {version}")
    header = json.loads(data[12 : 12 + hlen].decode("utf-8"))
    off = 12 + hlen
    layers: list = []
    for t in header["tensors"]:
        shape = tuple(t["shape"])
        size = int(np.prod(shape)) * 4
        arr = np.frombuffer(data, dtype="<f4", count=int(np.prod(shape)), offset=off)
        arr = arr.reshape(shape).copy()
        off += size
        li = int(t["name"].split(".")[1])
        key = t["name"].split(".")[2]
        while len(layers) <= li:
            layers.append({})
        layers[li][key] = arr
    return header["arch"], {"layers": layers}
