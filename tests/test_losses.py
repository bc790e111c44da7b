"""Loss unit tests against analytic fields where exact values are known."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_representation_tpu.losses import (
    MSELoss,
    CustomSDFLoss,
    WeightedSmoothL2Loss,
    CombinedLoss,
    IGRLOSS,
    IGRLOSSPCD,
    RegularizedCustomSDFLoss,
    GaussBonnetLoss,
    get_loss_class,
)
from sdf_representation_tpu.ops import (
    compute_normal,
    compute_gradient,
    compute_hessian,
    compute_gaussian_curvature,
)


def sphere_apply(params, x):
    """Exact unit-sphere SDF: f(x) = |x| - 1. params is a dummy pytree."""
    return jnp.linalg.norm(x, axis=-1) - 1.0 + 0.0 * params["dummy"]


def linear_apply(params, x):
    """f(x) = x . w (params-dependent so grads flow)."""
    return x @ params["w"]


DUMMY = {"dummy": jnp.zeros(())}


def make_batch(n=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    sdf = np.linalg.norm(x, axis=1) - 1.0
    normal = x / np.linalg.norm(x, axis=1, keepdims=True)
    y = np.concatenate([sdf[:, None], normal], axis=1).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_mse_zero_on_exact_field():
    x, y = make_batch()
    assert float(MSELoss()(DUMMY, sphere_apply, x, y, 0)) == pytest.approx(0.0, abs=1e-10)


def test_mse_value():
    x, y = make_batch()
    y_shift = y.at[:, 0].add(0.5)
    assert float(MSELoss()(DUMMY, sphere_apply, x, y_shift, 0)) == pytest.approx(0.25, rel=1e-5)


def test_custom_sdf_clamp():
    x, y = make_batch()
    # a field offset by 10 clamps to delta on both sides within the band
    def off_apply(p, xx):
        return sphere_apply(p, xx) + 10.0

    loss = CustomSDFLoss(delta=0.1)
    val = float(loss(DUMMY, off_apply, x, y, 0))
    true_clamped = np.clip(np.asarray(y[:, 0]), -0.1, 0.1)
    expected = np.mean((0.1 - true_clamped) ** 2)
    assert val == pytest.approx(expected, rel=1e-5)


def test_weighted_smooth_l2_weighting():
    x, y = make_batch()
    loss = WeightedSmoothL2Loss(weight_factor=0.5, delta=0.1)

    def off_apply(p, xx):
        return sphere_apply(p, xx) + 0.05

    val = float(loss(DUMMY, off_apply, x, y, 0))
    yt = np.clip(np.asarray(y[:, 0]), -0.1, 0.1)
    yp = np.clip(np.asarray(y[:, 0]) + 0.05, -0.1, 0.1)
    w = 1 + 0.5 * np.exp(-np.abs(yt))
    assert val == pytest.approx(np.mean(w * (yt - yp) ** 2), rel=1e-4)


def test_combined_loss_finite_and_positive():
    x, y = make_batch()

    def off_apply(p, xx):
        return sphere_apply(p, xx) + 0.02

    val = float(CombinedLoss()(DUMMY, off_apply, x, y, 0))
    assert np.isfinite(val) and val > 0


def test_igr_loss_zero_on_exact_sphere():
    """On the exact sphere SDF: sdf term 0, normals match, |grad| = 1.
    Only the reference 1e-8 floors remain."""
    x, y = make_batch()
    loss = IGRLOSS(delta=0.1, tau=1.0, lambda_g=0.1, regularizer_threshold=1.0)
    val = float(loss(DUMMY, sphere_apply, x, y, 0))
    assert val < 1e-6


def test_igr_loss_penalises_wrong_scale():
    """f = 2(|x|-1) has |grad| = 2 -> eikonal term ~ lambda_g * 1."""
    x, y = make_batch()

    def scaled(p, xx):
        return 2.0 * sphere_apply(p, xx)

    loss = IGRLOSS(delta=10.0, tau=0.0, lambda_g=1.0, regularizer_threshold=10.0)
    val = float(loss(DUMMY, scaled, x, y, 0))
    y_np = np.asarray(y[:, 0])
    expected_sdf = np.mean(y_np**2)  # pred=2y vs y -> (y)^2
    assert val == pytest.approx(expected_sdf + 1.0, rel=1e-3)


def test_igrpcd_loss():
    x, y = make_batch()
    loss = IGRLOSSPCD(lambda_g=0.1)
    val = float(loss(DUMMY, sphere_apply, x, y, 0, rng=jax.random.PRNGKey(0)))
    # surface term = mean f(x)^2 over off-surface points; eikonal ~ 0 for exact SDF
    expected_surface = float(jnp.mean(sphere_apply(DUMMY, x) ** 2))
    assert val == pytest.approx(expected_surface, abs=1e-4)


def test_regularized_loss_runs():
    """The reference version raises NameError (losses.py:203); ours must work."""
    x, y = make_batch()
    val = float(RegularizedCustomSDFLoss(delta=0.1)(DUMMY, sphere_apply, x, y, 0))
    assert np.isfinite(val) and val >= 0
    # exact field: normals match -> only ~0
    assert val < 1e-6


def test_gauss_bonnet_loss_with_aux():
    x, y = make_batch(32)
    loss = GaussBonnetLoss(delta=0.1, gauss_bonnet_weight=0.0)
    val = float(
        loss(DUMMY, sphere_apply, x, y, 0, aux={"euler_characteristic": jnp.asarray(2.0)})
    )
    assert np.isfinite(val)
    assert val < 1e-6  # exact sphere, weight 0 on the GB term


def test_losses_differentiable_wrt_params():
    """The double-backward composition: grad over params of a loss that itself
    takes input gradients (the hard part called out in SURVEY.md §7)."""
    x, y = make_batch()
    params = {"w": jnp.asarray([0.5, -0.3, 0.8])}
    for loss in [IGRLOSS(), RegularizedCustomSDFLoss(), WeightedSmoothL2Loss()]:
        g = jax.grad(lambda p: loss(p, linear_apply, x, y, 0))(params)
        assert np.all(np.isfinite(np.asarray(g["w"])))


# ---- differential operators -------------------------------------------------

def test_compute_gradient_sphere():
    x, _ = make_batch()
    g = compute_gradient(sphere_apply, DUMMY, x)
    expected = np.asarray(x) / np.linalg.norm(np.asarray(x), axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-4)


def test_compute_normal_matches_gradient():
    x, _ = make_batch()
    np.testing.assert_allclose(
        np.asarray(compute_normal(sphere_apply, DUMMY, x)),
        np.asarray(compute_gradient(sphere_apply, DUMMY, x)),
        rtol=1e-6,
    )


def test_forward_mode_matches_reverse_mode():
    from sdf_representation_tpu.ops.diffops import sdf_and_gradient_fwd, sdf_and_gradient

    x, _ = make_batch()
    v1, g1 = sdf_and_gradient_fwd(sphere_apply, DUMMY, x)
    v2, g2 = sdf_and_gradient(sphere_apply, DUMMY, x)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)


def test_hessian_quadratic():
    def quad(p, x):
        return jnp.sum(x**2, axis=-1) + 0.0 * p["dummy"]

    x, _ = make_batch(8)
    h = compute_hessian(quad, DUMMY, x)
    expected = np.broadcast_to(2.0 * np.eye(3), (8, 3, 3))
    np.testing.assert_allclose(np.asarray(h), expected, atol=1e-4)


def test_gaussian_curvature_sphere():
    """For f = |x| - 1: det(H) = 0 (Hessian of |x| is rank-2), so K = 0 in
    this formula at any point."""
    x, _ = make_batch(16)
    k = compute_gaussian_curvature(sphere_apply, DUMMY, x)
    np.testing.assert_allclose(np.asarray(k), 0.0, atol=1e-3)


def test_registry_lookup():
    assert get_loss_class("IGRLOSS") is IGRLOSS
    with pytest.raises(ValueError):
        get_loss_class("NopeLoss")


def test_implicitnet_fast_path_matches_jvp():
    """The trainer-advertised shared-matmul forward gradient must equal the
    generic jvp path for every activation mode."""
    import jax
    from sdf_representation_tpu.models import ImplicitNet
    from sdf_representation_tpu.ops.diffops import (
        implicitnet_value_and_grad,
        sdf_and_gradient_fwd,
    )

    for skip, beta in [((2,), 100.0), ((), 100.0), ((), 0.0)]:
        model = ImplicitNet(d_in=3, hidden_dims=(32,) * 3, skip_in=skip, beta=beta)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (64, 3)).astype(np.float32)
        )
        v1, g1 = implicitnet_value_and_grad(model, params, x)
        v2, g2 = sdf_and_gradient_fwd(model.apply, params, x)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_trainer_binding_advertises_fast_path():
    from sdf_representation_tpu.models import ImplicitNet
    from sdf_representation_tpu.training.trainer import _bind_apply

    model = ImplicitNet(d_in=3, hidden_dims=(16,) * 2)
    fn = _bind_apply(model, None)
    assert hasattr(fn, "_implicitnet_fast")


def test_igr_global_norm_quirk_flag():
    """global_norm_quirk=1 reproduces the reference's batch-global normal
    normalisation (losses.py:129); default stays per-row."""
    x, y = make_batch()
    fixed = IGRLOSS(tau=1.0, lambda_g=0.0)
    quirky = IGRLOSS(tau=1.0, lambda_g=0.0, global_norm_quirk=1.0)
    v_fixed = float(fixed(DUMMY, sphere_apply, x, y, 0))
    v_quirk = float(quirky(DUMMY, sphere_apply, x, y, 0))
    # exact sphere: per-row cosine = 1 -> ~0; global-norm makes cos != 1
    assert v_fixed < 1e-6
    assert v_quirk > 1e-3
