"""Import reference (PyTorch) checkpoints into this framework.

Migration path for users of the reference implementation: its Executor
pickles dicts holding torch ``state_dict``s with keys ``lin{i}.weight`` /
``lin{i}.bias`` (ImplicitNet, reference model/networks.py:77) or
``layers.{i}.weight`` (ImplicitNetCompatible, :114-179), optionally prefixed
``module.`` by DataParallel (reference executor.py:301-345 strips it).

``import_torch_state_dict`` maps those tensors onto our params pytree
(weights transposed: torch Linear stores (out, in), we store (in, out));
``load_reference_checkpoint`` unpickles a reference best_model.pkl /
model_epoch*.pkl directly (requires torch, present in the image as CPU).
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np


def _to_numpy(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def import_torch_state_dict(state_dict: Dict) -> Dict:
    """torch state_dict -> {"layers": [{"w", "b"}, ...]} params pytree."""
    layers: Dict[int, Dict[str, np.ndarray]] = {}
    pat = re.compile(r"^(?:module\.)?(?:lin(\d+)|layers\.(\d+))\.(weight|bias)$")
    for key, tensor in state_dict.items():
        m = pat.match(key)
        if not m:
            continue
        idx = int(m.group(1) if m.group(1) is not None else m.group(2))
        kind = m.group(3)
        arr = _to_numpy(tensor).astype(np.float32)
        entry = layers.setdefault(idx, {})
        if kind == "weight":
            entry["w"] = arr.T  # torch (out, in) -> ours (in, out)
        else:
            entry["b"] = arr
    if not layers:
        raise ValueError(
            "No lin{i}/layers.{i} weight keys found; not an ImplicitNet "
            f"state_dict (keys: {sorted(state_dict)[:8]}...)"
        )
    n = max(layers) + 1
    out = []
    for i in range(n):
        if i not in layers or "w" not in layers[i] or "b" not in layers[i]:
            raise ValueError(f"Layer {i} incomplete in state_dict")
        out.append({"w": layers[i]["w"], "b": layers[i]["b"]})
    return {"layers": out}


def infer_architecture(params: Dict, d_in: int = 3):
    """Recover (hidden_dims, skip_in) from imported layer shapes: a layer
    whose fan_out is d_in short of the next fan_in feeds a skip."""
    layers = params["layers"]
    hidden = []
    skip = []
    for i, layer in enumerate(layers[:-1]):
        fan_out = layer["w"].shape[1]
        next_in = layers[i + 1]["w"].shape[0]
        if next_in == fan_out + d_in:
            skip.append(i + 1)
            hidden.append(fan_out + d_in)
        else:
            hidden.append(fan_out)
    return tuple(hidden), tuple(skip)


def load_reference_checkpoint(path: str, map_key: Optional[str] = None):
    """Unpickle a reference checkpoint file and import its model weights.

    Reference formats (executor.py:237-257):
      best_model.pkl     {"epoch", "model_state_dict", "optimizer_state_dict",
                          "loss", "val_loss", ...}
      model_epoch{E}.pkl {"epoch", "model_state_dict"}

    Returns (params, epoch). CUDA-tensor storages load onto CPU (the role of
    the reference's CPU_Unpickler, utils/pickling.py:7-11, is played by
    torch.load(map_location="cpu")).

    Format note: the reference writes model_epoch{E}.pkl with torch.save
    (zip archive) but best_model.pkl with PLAIN pickle.dump
    (executor.py:248-257) — its own loader uses pickle.load/CPU_Unpickler
    (executor.py:261-267). torch.load rejects the plain-pickle form
    ("invalid magic number"), so fall back to pickle.load for it
    (caught live by the round-5 head-to-head run).
    """
    import pickle

    import torch

    try:
        blob = torch.load(path, map_location="cpu", weights_only=False)
    except (RuntimeError, pickle.UnpicklingError):
        with open(path, "rb") as fh:
            blob = pickle.load(fh)
    if isinstance(blob, dict) and not any(
        hasattr(v, "detach") for v in blob.values()
    ):
        epoch = int(blob.get("epoch", 0))
        key = map_key or "model_state_dict"
        state = blob.get(key)
        if state is None:
            for k, v in blob.items():
                if isinstance(v, dict) and any("weight" in kk for kk in v):
                    state = v
                    break
        if state is None:
            raise ValueError(f"No state_dict found in {path}")
    else:
        state, epoch = blob, 0
    return import_torch_state_dict(state), epoch
