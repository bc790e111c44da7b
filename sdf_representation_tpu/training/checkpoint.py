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


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure of `template` (shapes/dtypes validated by
    flax.serialization)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


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
