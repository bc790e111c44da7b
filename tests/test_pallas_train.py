"""Fused training-path (custom VJP) parity tests, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_representation_tpu.models import ImplicitNet
from sdf_representation_tpu.ops.pallas_train import make_fused_apply


@pytest.mark.parametrize(
    "skip,beta", [((2,), 100.0), ((), 100.0), ((), 0.0)]
)
def test_fused_vjp_matches_autodiff(skip, beta):
    model = ImplicitNet(d_in=3, hidden_dims=(64,) * 4, skip_in=skip, beta=beta)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (96, 3)).astype(np.float32)
    )
    y = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (96,)).astype(np.float32)
    )
    fused = make_fused_apply(model, tile_p=32, fwd_tile_p=32, compute_dtype=jnp.float32,
                             interpret=True)

    def loss_ref(p):
        return jnp.mean((model.apply(p, x) - y) ** 2)

    def loss_fused(p):
        return jnp.mean((fused(p, x) - y) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    v_fu, g_fu = jax.value_and_grad(loss_fused)(params)
    assert float(v_fu) == pytest.approx(float(v_ref), rel=1e-4)
    for lr, lf in zip(g_ref["layers"], g_fu["layers"]):
        np.testing.assert_allclose(
            np.asarray(lf["w"]), np.asarray(lr["w"]), rtol=5e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(lf["b"]), np.asarray(lr["b"]), rtol=5e-3, atol=1e-5
        )


def test_fused_input_gradients():
    model = ImplicitNet(d_in=3, hidden_dims=(32,) * 3, skip_in=(1,), beta=100.0)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (64, 3)).astype(np.float32)
    )
    fused = make_fused_apply(model, tile_p=32, fwd_tile_p=32, compute_dtype=jnp.float32,
                             interpret=True)

    g_ref = jax.grad(lambda xx: jnp.sum(model.apply(params, xx)))(x)
    g_fu = jax.grad(lambda xx: jnp.sum(fused(params, xx)))(x)
    np.testing.assert_allclose(
        np.asarray(g_fu), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )


def test_fused_training_converges():
    """A few optimisation steps through the fused VJP reduce the loss."""
    import optax

    model = ImplicitNet(d_in=3, hidden_dims=(32,) * 2, skip_in=(), beta=100.0)
    params = model.init(jax.random.PRNGKey(0))
    fused = make_fused_apply(model, tile_p=32, fwd_tile_p=32, compute_dtype=jnp.float32,
                             interpret=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (256, 3)).astype(np.float32))
    y = jnp.linalg.norm(x, axis=1) - 0.5
    opt = optax.adam(3e-3)
    st = opt.init(params)

    def loss(p):
        return jnp.mean((fused(p, x) - y) ** 2)

    l0 = float(loss(params))
    for _ in range(30):
        g = jax.grad(loss)(params)
        up, st = opt.update(g, st, params)
        import optax as _o

        params = _o.apply_updates(params, up)
    assert float(loss(params)) < l0 * 0.5
