"""Dense voxel-grid SDF evaluation — the 512^3-in-seconds path.

Rebuild of the reference's batched no-grad grid eval
(reference executor/executor.py:346-400 `reconstruct_only`,
evaluations/post_process.py:50-53,84): instead of materialising a cubesize^3x3
coordinate tensor on host and shipping it batch-by-batch, coordinates are
GENERATED on-device from the chunk index (iota arithmetic), so the only HBM
traffic is weights + the output volume. One jitted lax.map covers the whole
grid; optional bfloat16 compute doubles MXU throughput (f32 output).

Grid convention matches the reference: linspace(-1, 1, n) per axis, 'ij'
indexing, i.e. flat index = x * n^2 + y * n + z (executor.py:353-356).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def grid_axis(n: int) -> np.ndarray:
    return np.linspace(-1.0, 1.0, n, dtype=np.float64)


def grid_coords(n: int) -> np.ndarray:
    """(n^3, 3) float32 coordinates in reference ordering (host-side helper
    for metrics code; the evaluator itself never materialises this)."""
    ax = grid_axis(n).astype(np.float32)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), axis=-1)
    return g.reshape(-1, 3)


@partial(jax.jit, static_argnames=("apply_fn", "n", "chunk", "compute_dtype"))
def _eval_grid_device(params, apply_fn, n: int, chunk: int, compute_dtype):
    total = n * n * n
    n_chunks = -(-total // chunk)
    step = 2.0 / (n - 1)

    if compute_dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )

    def one_chunk(c):
        flat = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]
        z = flat % n
        y = (flat // n) % n
        x = flat // (n * n)
        coords = jnp.stack(
            [
                -1.0 + step * x.astype(jnp.float32),
                -1.0 + step * y.astype(jnp.float32),
                -1.0 + step * z.astype(jnp.float32),
            ],
            axis=-1,
        ).astype(compute_dtype)
        return apply_fn(params, coords).astype(jnp.float32)

    vals = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    return vals.reshape(-1)[:total].reshape(n, n, n)


def evaluate_grid(
    apply_fn: Callable,
    params,
    n: int,
    chunk: int = 262144,
    compute_dtype=jnp.float32,
) -> np.ndarray:
    """Evaluate the field on the dense n^3 grid. Returns (n, n, n) float32."""
    chunk = min(chunk, n * n * n)
    vol = _eval_grid_device(params, apply_fn, n, chunk, compute_dtype)
    return np.asarray(vol)


def evaluate_points(
    apply_fn: Callable,
    params,
    points: np.ndarray,
    chunk: int = 262144,
    compute_dtype=jnp.float32,
) -> np.ndarray:
    """Chunked evaluation of arbitrary points (post_process path).

    If a chunk does not fit in device memory (models with large per-point
    intermediates — e.g. KAN's (chunk, in, coeff) spline bases at grid 256 —
    can exceed HBM at the default chunk), the chunk is quartered and the
    sweep retried instead of surfacing the allocation error to the caller."""
    pts = np.asarray(points, dtype=np.float32)
    N = len(pts)
    chunk = min(chunk, max(N, 1))

    if compute_dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            params,
        )

    @jax.jit
    def f(p, x):
        return apply_fn(p, x.astype(compute_dtype)).astype(jnp.float32)

    while True:
        n_chunks = -(-N // chunk)
        padded = n_chunks * chunk
        pts_pad = (
            np.concatenate([pts, np.zeros((padded - N, 3), np.float32)])
            if padded != N
            else pts
        )
        try:
            out = np.empty(padded, np.float32)
            for i in range(n_chunks):
                out[i * chunk : (i + 1) * chunk] = np.asarray(
                    f(params, jnp.asarray(pts_pad[i * chunk : (i + 1) * chunk]))
                )
            return out[:N]
        except Exception as exc:  # jax raises backend-specific error types
            msg = str(exc).lower()
            oom = "memory" in msg or "resource exhausted" in msg
            if not oom or chunk <= 4096:
                raise
            chunk //= 4
            print(
                f"evaluate_points: chunk OOM, retrying with chunk={chunk}",
                flush=True,
            )
