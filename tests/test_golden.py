"""Golden-value regression tests (SURVEY.md §4: 'golden grid-eval tests').

A fixed-seed tiny ImplicitNet evaluated on a fixed grid must keep producing
the same values across refactors of the model/grid code. The goldens were
computed with the initial verified implementation (f64-checked against a
manual numpy forward)."""

import jax
import numpy as np

from sdf_representation_tpu.models import ImplicitNet
from sdf_representation_tpu.ops.grid_eval import evaluate_grid, grid_coords


def _model():
    m = ImplicitNet(d_in=3, hidden_dims=(16,) * 2, skip_in=(1,), beta=100.0)
    return m, m.init(jax.random.PRNGKey(42))


def _manual_forward(params, pts):
    """Independent float64 numpy forward — the golden oracle."""
    import math

    h = pts.astype(np.float64)
    inp = h.copy()
    layers = params["layers"]
    n = len(layers)
    for i, lw in enumerate(layers):
        if i == 1:
            h = np.concatenate([h, inp], axis=1) / math.sqrt(2.0)
        h = h @ np.asarray(lw["w"], np.float64) + np.asarray(lw["b"], np.float64)
        if i < n - 1:
            z = 100.0 * h
            h = np.where(z > 30, h, np.log1p(np.exp(np.minimum(z, 30.0))) / 100.0)
    return h[:, 0]


def test_grid_eval_matches_independent_forward():
    model, params = _model()
    n = 8
    vol = evaluate_grid(model.apply, params, n, chunk=128)
    expected = _manual_forward(params, grid_coords(n)).reshape(n, n, n)
    np.testing.assert_allclose(vol, expected, rtol=2e-5, atol=1e-6)


def test_grid_ordering_is_reference_convention():
    """flat index = x*n^2 + y*n + z; volume[i,j,k] is at coords
    (lin[i], lin[j], lin[k])."""
    model, params = _model()
    n = 6
    vol = evaluate_grid(model.apply, params, n, chunk=36)
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    probe = np.asarray([[lin[1], lin[4], lin[2]]], np.float32)
    direct = float(np.asarray(model.apply(params, probe))[0])
    assert abs(vol[1, 4, 2] - direct) < 1e-5


def test_init_is_seed_deterministic():
    m1, p1 = _model()
    m2, p2 = _model()
    for a, b in zip(p1["layers"], p2["layers"]):
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))


def test_evaluate_points_oom_fallback(monkeypatch):
    """evaluate_points quarters its chunk and retries when the device
    reports an allocation failure (KAN-scale intermediates)."""
    import jax.numpy as jnp

    from sdf_representation_tpu.ops import grid_eval

    calls = []
    real_jit = grid_eval.jax.jit

    def fake_jit(fn):
        jf = real_jit(fn)

        def wrapper(p, x):
            calls.append(x.shape[0])
            if x.shape[0] > 8192:
                raise RuntimeError("RESOURCE EXHAUSTED: Out of memory")
            return jf(p, x)

        return wrapper

    monkeypatch.setattr(grid_eval.jax, "jit", fake_jit)
    pts = np.random.default_rng(0).uniform(-1, 1, (32768, 3)).astype(np.float32)
    out = grid_eval.evaluate_points(
        lambda p, x: jnp.linalg.norm(x, axis=-1) - 0.5, {}, pts, chunk=32768
    )
    expected = np.linalg.norm(pts, axis=1) - 0.5
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
    assert max(calls) == 32768 and min(calls) <= 8192  # retried smaller
