"""Fused Pallas MLP kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_representation_tpu.models import ImplicitNet
from sdf_representation_tpu.ops.pallas_mlp import fused_apply, fused_grid_eval
from sdf_representation_tpu.ops.grid_eval import evaluate_grid


@pytest.mark.parametrize(
    "skip,beta",
    [((2,), 100.0), ((), 100.0), ((), 0.0), ((2,), 0.0)],
)
def test_fused_apply_matches_reference_forward(skip, beta):
    model = ImplicitNet(d_in=3, hidden_dims=(64,) * 4, skip_in=skip, beta=beta)
    params = model.init(jax.random.PRNGKey(0))
    pts = np.random.default_rng(0).uniform(-1, 1, (300, 3)).astype(np.float32)
    ref = np.asarray(model.apply(params, jnp.asarray(pts)))
    out = np.asarray(
        fused_apply(model, params, pts, tile_p=128,
                    compute_dtype=jnp.float32, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_apply_bf16_close():
    model = ImplicitNet(d_in=3, hidden_dims=(64,) * 4, skip_in=(2,), beta=100.0)
    params = model.init(jax.random.PRNGKey(0))
    pts = np.random.default_rng(1).uniform(-1, 1, (256, 3)).astype(np.float32)
    ref = np.asarray(model.apply(params, jnp.asarray(pts)))
    out = np.asarray(
        fused_apply(model, params, pts, tile_p=128,
                    compute_dtype=jnp.bfloat16, interpret=True)
    )
    # bf16 weights: ~1e-2 relative is expected for an 8-layer chain
    assert np.abs(out - ref).max() < 0.05


def test_fused_grid_eval_matches_evaluate_grid():
    model = ImplicitNet(d_in=3, hidden_dims=(32,) * 3, skip_in=(), beta=100.0)
    params = model.init(jax.random.PRNGKey(0))
    n = 16
    ref = evaluate_grid(model.apply, params, n, chunk=1024)
    out = np.asarray(
        fused_grid_eval(model, params, n, tile_p=128,
                        compute_dtype=jnp.float32, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
