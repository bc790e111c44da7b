"""Device-agnostic checkpointing.

Replaces the reference's pickle checkpoints (reference executor/executor.py:
237-300, utils/pickling.py CPU_Unpickler, module.-prefix surgery
executor.py:301-345) with msgpack-serialised pytrees (flax.serialization):
arrays are stored as plain numpy so checkpoints restore onto any backend or
mesh layout without unpickling hacks. Optimizer state IS saved and restored —
the reference recreated Adam after resume and silently discarded its moments
(executor.py:160); regression-tested here.

Layout (mirrors the reference cadence, executor.py:209-234):
  best_model.ckpt           on every validation improvement
  model_epoch{E}.ckpt       every `checkpointing` epochs
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """state: arbitrary pytree dict (params / opt_state / aux / histories)."""
    data = serialization.to_bytes(_to_host(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _align_to_template(template, raw, path="state"):
    """Recursively shape `raw` (a msgpack_restore'd tree) into `template`'s
    structure: extra dict keys in the checkpoint are dropped with a warning
    (e.g. the legacy KAN "adaptive_grid" marker), missing keys raise."""
    if isinstance(template, dict):
        if not isinstance(raw, dict):
            raise ValueError(f"{path}: checkpoint has {type(raw).__name__}, "
                             f"template expects dict")
        extra = set(raw) - set(template)
        if extra:
            print(f"[checkpoint] {path}: ignoring extra keys {sorted(extra)}",
                  flush=True)
        return {
            k: _align_to_template(template[k], raw[k], f"{path}.{k}")
            for k in template
        }
    if isinstance(template, (list, tuple)):
        fields = getattr(template, "_fields", None)  # namedtuple (e.g.
        # optax ScaleByAdamState — flax serializes these as field-name
        # dicts, so align by field when possible)
        if isinstance(raw, dict):
            if fields is not None and set(fields) <= set(raw):
                vals = [raw[f] for f in fields]
            else:
                vals = list(raw.values())
        else:
            vals = list(raw)
        if len(vals) != len(template):
            raise ValueError(f"{path}: length {len(vals)} != template "
                             f"{len(template)}")
        out = [
            _align_to_template(t, v, f"{path}[{i}]")
            for i, (t, v) in enumerate(zip(template, vals))
        ]
        if fields is not None:
            return type(template)(*out)
        return type(template)(out) if isinstance(template, tuple) else out
    return raw


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure of `template` (shapes/dtypes validated by
    flax.serialization). Checkpoints whose dicts carry EXTRA keys relative
    to the template (older formats) are aligned by dropping the extras."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        return serialization.from_bytes(template, data)
    except (ValueError, KeyError):
        raw = serialization.msgpack_restore(data)
        aligned = _align_to_template(template, raw)
        # round-trip through from_bytes for flax's shape/dtype validation
        return serialization.from_bytes(
            template, serialization.to_bytes(aligned)
        )


def latest_epoch_checkpoint(model_dir: str) -> Optional[Tuple[str, int]]:
    """Newest model_epoch*.ckpt by epoch number (the reference used file
    mtime, executor.py:277-287; epoch number is deterministic)."""
    candidates = glob.glob(os.path.join(model_dir, "model_epoch*.ckpt"))
    best = None
    for c in candidates:
        m = re.search(r"model_epoch(\d+)\.ckpt$", c)
        if m:
            e = int(m.group(1))
            if best is None or e > best[1]:
                best = (c, e)
    return best
