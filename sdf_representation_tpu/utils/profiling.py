"""Tracing / profiling helpers — first-class observability the reference
lacked (its only timing was wall-clock spans in post_process.py:44,192;
SURVEY.md §5).

  * trace(dir): jax.profiler context (view in TensorBoard / Perfetto)
  * StepTimer: per-step wall times with jax execution forced, summary stats
  * debug_nans(): the jax_debug_nans switch replacing the reference's
    unconditional torch.autograd.set_detect_anomaly (executor.py:159)
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force(x) -> None:
    """Force execution of a pytree (axon-safe: fetches a scalar reduction —
    block_until_ready can return early on the experimental platform)."""
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "dtype") and not isinstance(leaf, np.ndarray):
            jax.device_get(jnp.sum(leaf))
            return


class StepTimer:
    """Accumulates per-step wall times; `summary()` gives mean/p50/p90/min."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "n": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "min_s": float(arr.min()),
            "total_s": float(arr.sum()),
        }


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
