"""Benchmark entry point — prints ONE JSON line.

Headline metric: 512^3 dense-grid SDF evaluation wall time on the flagship
ImplicitNet (8x512 skip-in), the BASELINE.md north-star ("512^3 grid SDF
extraction < 2 s" on v5e-8; this runs on however many chips are attached —
usually one). vs_baseline = 2.0 / seconds, so > 1.0 beats the target.

Extras: training throughput (points/sec) for the jitted whole-epoch loop and
bf16 grid-eval time.

Env:
  BENCH_QUICK=1  -> 128^3 + tiny train loop (CI smoke)
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    """Force execution AND result materialisation: on the experimental axon
    platform block_until_ready can return before the computation lands, so we
    fetch a scalar reduction to host."""
    return float(jax.device_get(jnp.sum(jax.tree_util.tree_leaves(out)[0])))


def time_fn(fn, *args, repeats=3):
    _force(fn(*args))  # warmup/compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    quick = os.environ.get("BENCH_QUICK") == "1"

    from sdf_representation_tpu.models import ImplicitNet
    from sdf_representation_tpu.ops.grid_eval import _eval_grid_device

    model = ImplicitNet(d_in=3, hidden_dims=(512,) * 8, skip_in=(4,), beta=100.0)
    params = model.init(jax.random.PRNGKey(0))

    n = 128 if quick else 512
    chunk = 262144

    def grid(params):
        return _eval_grid_device(params, model.apply, n, chunk, jnp.float32)

    t_f32 = time_fn(grid, params, repeats=2 if quick else 3)

    def grid_bf16(params):
        return _eval_grid_device(params, model.apply, n, chunk, jnp.bfloat16)

    t_bf16 = time_fn(grid_bf16, params, repeats=2 if quick else 3)

    # training throughput: whole-epoch jitted loop, WeightedSmoothL2 on random data
    import optax

    from sdf_representation_tpu.losses import WeightedSmoothL2Loss
    from sdf_representation_tpu.training.trainer import make_epoch_fn

    n_points = 2**17 if quick else 2**21
    batch = 4096 if quick else 65536
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-1, 1, (n_points, 3)).astype(np.float32))
    Y = jnp.asarray(rng.uniform(-1, 1, (n_points, 4)).astype(np.float32))
    optimizer = optax.adam(1e-4)
    trainable = {"params": params, "aux": {}}
    opt_state = optimizer.init(trainable)
    epoch_fn = make_epoch_fn(
        model, WeightedSmoothL2Loss(), optimizer, batch, n_points
    )

    def run_epoch(tr, st):
        tr, st, lv = epoch_fn(tr, st, X, Y, jax.random.PRNGKey(0), 0)
        return lv

    t_epoch = time_fn(run_epoch, trainable, opt_state, repeats=2)
    pts_per_epoch = (n_points // batch) * batch
    train_pps = pts_per_epoch / t_epoch

    # scale quick grid time to the 512 workload for comparability
    t_at_512 = t_f32 if not quick else t_f32 * (512 / n) ** 3
    result = {
        "metric": "sdf_grid_512_eval_seconds",
        "value": round(t_at_512, 4),
        "unit": "s",
        "vs_baseline": round(2.0 / t_at_512, 3),
        "extras": {
            "grid_n": n,
            "grid_eval_f32_s": round(t_f32, 4),
            "grid_eval_bf16_s": round(t_bf16, 4),
            "grid_points_per_sec_f32": round(n**3 / t_f32),
            "train_points_per_sec": round(train_pps),
            "train_batch": batch,
            "device": str(jax.devices()[0]),
            "n_devices": len(jax.devices()),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
