"""Fused IGR (value, input-gradient) custom-VJP parity tests (interpret mode).

Checks the Pallas path against the XLA shared-matmul reference
(ops/diffops.implicitnet_value_and_grad) for both the forward outputs and —
the hard part — the PARAMETER gradients of losses built on (f, grad f),
i.e. the double backward of reference model/losses.py:283-296.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_representation_tpu.losses import IGRLOSS
from sdf_representation_tpu.models import ImplicitNet
from sdf_representation_tpu.ops.diffops import implicitnet_value_and_grad
from sdf_representation_tpu.ops.pallas_igr import make_fused_value_and_grad


def _setup(skip, beta, seed=0, n=200):
    model = ImplicitNet(d_in=3, hidden_dims=(64,) * 4, skip_in=skip, beta=beta)
    params = model.init(jax.random.PRNGKey(seed))
    x = jnp.asarray(
        np.random.default_rng(seed).uniform(-1, 1, (n, 3)).astype(np.float32)
    )
    vag = make_fused_value_and_grad(
        model, fwd_tile_p=128, bwd_tile_p=128,
        compute_dtype=jnp.float32, interpret=True,
    )
    return model, params, x, vag


@pytest.mark.parametrize("skip,beta", [((2,), 100.0), ((), 100.0), ((2,), 0.0)])
def test_forward_parity(skip, beta):
    model, params, x, vag = _setup(skip, beta)
    f_ref, g_ref = implicitnet_value_and_grad(model, params, x)
    f, g = vag(params, x)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("skip,beta", [((2,), 100.0), ((), 100.0), ((2,), 0.0)])
def test_param_grads_match_xla(skip, beta):
    """grad_theta of a loss using both f and grad_x f — exercises every
    term of the hand-written backward (dW from primal AND tangent paths)."""
    model, params, x, vag = _setup(skip, beta)

    def make_loss(fn):
        def loss(p):
            f, g = fn(p, x)
            gn = jnp.sum(g * g, axis=-1)
            return jnp.mean(jnp.sin(3.0 * f)) + jnp.mean((gn - 1.0) ** 2)
        return loss

    ref_fn = lambda p, xx: implicitnet_value_and_grad(model, p, xx)
    g_ref = jax.grad(make_loss(ref_fn))(params)
    g_fused = jax.grad(make_loss(vag))(params)
    for l, (a, b) in enumerate(zip(g_ref["layers"], g_fused["layers"])):
        np.testing.assert_allclose(
            np.asarray(b["w"]), np.asarray(a["w"]), rtol=1e-4, atol=1e-5,
            err_msg=f"dW layer {l}",
        )
        np.testing.assert_allclose(
            np.asarray(b["b"]), np.asarray(a["b"]), rtol=1e-4, atol=1e-5,
            err_msg=f"db layer {l}",
        )


def test_igrloss_value_and_grad_parity():
    """End-to-end: IGRLOSS param gradients via the _implicitnet_fast hook."""
    model, params, x, vag = _setup((2,), 100.0)
    y = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (x.shape[0], 4)).astype(np.float32)
    )
    loss = IGRLOSS()

    def run(fast):
        fn = lambda p, xx: model.apply(p, xx)
        fn._implicitnet_fast = fast
        return jax.value_and_grad(
            lambda p: loss(p, fn, x, y, 0)
        )(params)

    l_ref, g_ref = run(lambda p, xx: implicitnet_value_and_grad(model, p, xx))
    l_fused, g_fused = run(vag)
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    for a, b in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


def test_x_cotangent_is_zero_by_contract():
    """The VJP is params-only: grad w.r.t. x must come back zero (documented)."""
    model, params, x, vag = _setup((2,), 100.0)
    dx = jax.grad(lambda xx: jnp.sum(vag(params, xx)[0]))(x)
    assert float(jnp.abs(dx).max()) == 0.0
