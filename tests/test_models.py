"""Model unit tests: architecture shapes, geometric-init statistics, forward
semantics (skip/sqrt2, softplus-beta vs relu+tanh), jit/grad compatibility."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_representation_tpu.models import (
    ImplicitNet,
    ImplicitNetCompatible,
    FeedForwardNetwork,
    KAN,
    get_model_class,
)


def test_layer_shapes_with_skip():
    m = ImplicitNet(d_in=3, hidden_dims=(512,) * 8, skip_in=(4,))
    shapes = m.layer_shapes()
    assert len(shapes) == 9
    assert shapes[0] == (3, 512)
    assert shapes[3] == (512, 509)  # feeds the skip layer: out shrinks by d_in
    assert shapes[4] == (512, 512)  # skip layer input is concat'ed back to 512
    assert shapes[-1] == (512, 1)


def test_geometric_init_statistics():
    m = ImplicitNet(d_in=3, hidden_dims=(256,) * 4, skip_in=(), beta=100.0)
    params = m.init(jax.random.PRNGKey(0))
    # hidden layers: bias 0, weight std ~ sqrt(2)/sqrt(fan_out)
    w0 = np.asarray(params["layers"][0]["w"])
    assert np.allclose(np.asarray(params["layers"][0]["b"]), 0.0)
    assert abs(w0.std() - math.sqrt(2) / math.sqrt(256)) < 0.02
    assert abs(w0.mean()) < 0.02
    # final layer: mean sqrt(pi)/sqrt(fan_in), tiny std, bias = -radius_init
    wl = np.asarray(params["layers"][-1]["w"])
    assert abs(wl.mean() - math.sqrt(math.pi) / math.sqrt(256)) < 1e-3
    assert wl.std() < 1e-4
    assert np.allclose(np.asarray(params["layers"][-1]["b"]), -1.0)


def test_geometric_init_approximates_sphere():
    """Geometric init should make f(x) ~ |x| - r (the IGR property)."""
    m = ImplicitNet(d_in=3, hidden_dims=(512,) * 8, skip_in=(4,), beta=100.0)
    params = m.init(jax.random.PRNGKey(1))
    pts = np.random.default_rng(0).uniform(-1, 1, (256, 3)).astype(np.float32)
    vals = np.asarray(m.apply(params, jnp.asarray(pts)))
    expected = np.linalg.norm(pts, axis=1) - 1.0
    corr = np.corrcoef(vals, expected)[0, 1]
    assert corr > 0.95


def test_forward_shapes_and_jit():
    m = ImplicitNet(d_in=3, hidden_dims=(64,) * 3, skip_in=(2,), beta=100.0)
    params = m.init(jax.random.PRNGKey(0))
    x = jnp.ones((17, 3))
    out = m.apply(params, x)
    assert out.shape == (17,)
    out_jit = jax.jit(m.apply)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_jit), rtol=1e-6)


def test_relu_tanh_mode_bounded():
    """beta == 0 -> ReLU activations + tanh final output in (-1, 1)."""
    m = ImplicitNet(d_in=3, hidden_dims=(64,) * 3, skip_in=(), beta=0.0,
                    geometric_init=False)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (128, 3), minval=-5, maxval=5)
    out = np.asarray(m.apply(params, x))
    assert np.all(out > -1.0) and np.all(out < 1.0)


def test_skip_concat_scaling():
    """The skip layer concatenates the input and divides by sqrt(2)."""
    m = ImplicitNet(d_in=3, hidden_dims=(8, 8), skip_in=(1,), beta=100.0,
                    geometric_init=False)
    params = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray([[0.3, -0.2, 0.5]])

    # manual forward
    import numpy as onp
    h = onp.asarray(x)
    inp = h.copy()
    w0, b0 = (onp.asarray(params["layers"][0]["w"]), onp.asarray(params["layers"][0]["b"]))
    h = h @ w0 + b0
    h = onp.log1p(onp.exp(100.0 * h)) / 100.0  # softplus beta=100 (small values)
    h = onp.concatenate([h, inp], axis=-1) / onp.sqrt(2.0)
    w1, b1 = (onp.asarray(params["layers"][1]["w"]), onp.asarray(params["layers"][1]["b"]))
    h = h @ w1 + b1
    h = onp.log1p(onp.exp(100.0 * h)) / 100.0
    w2, b2 = (onp.asarray(params["layers"][2]["w"]), onp.asarray(params["layers"][2]["b"]))
    h = h @ w2 + b2
    np.testing.assert_allclose(
        np.asarray(m.apply(params, x)), h[:, 0], rtol=1e-4, atol=1e-5
    )


def test_compatible_alias():
    m = ImplicitNetCompatible(d_in=3, hidden_dims=(32,) * 2)
    assert isinstance(m, ImplicitNet)
    assert m.beta == 99.0


def test_ffn_forward():
    m = FeedForwardNetwork(d_in=3, hidden_dim=32, num_layers=2)
    params = m.init(jax.random.PRNGKey(0))
    x = jnp.ones((5, 3))
    out = m.apply(params, x)
    assert out.shape == (5,)
    assert np.all(np.abs(np.asarray(out)) < 1.0)  # tanh output
    # dropout changes output in train mode
    out_train = m.apply(params, x, rng=jax.random.PRNGKey(1), train=True)
    assert not np.allclose(np.asarray(out), np.asarray(out_train))


def test_kan_forward_and_reg():
    m = KAN(layers_hidden=(3, 16, 1), grid_size=8)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.9, maxval=0.9)
    out = m.apply(params, x)
    assert out.shape == (32,)
    assert np.all(np.isfinite(np.asarray(out)))
    reg = m.regularization_loss(params)
    assert np.isfinite(float(reg))


def test_kan_bspline_partition_of_unity():
    from sdf_representation_tpu.models.kan import KANLayerSpec, b_splines

    spec = KANLayerSpec(in_features=3, out_features=4, grid_size=8)
    x = jax.random.uniform(jax.random.PRNGKey(0), (64, 3), minval=-0.99, maxval=0.99)
    bases = b_splines(x, spec.default_grid(), spec.spline_order)
    # B-spline bases of any order sum to 1 inside the grid domain
    np.testing.assert_allclose(np.asarray(bases.sum(-1)), 1.0, atol=1e-5)


def test_kan_bspline_uniform_closed_form_matches_recursion():
    """The closed-form cardinal-B-spline fast path must reproduce the
    Cox-de Boor recursion on the default uniform grid — including points
    outside the domain, on the boundaries, and exactly on interior knots —
    for every supported order."""
    from sdf_representation_tpu.models.kan import (
        KANLayerSpec,
        b_splines,
        b_splines_uniform,
    )

    rng = np.random.default_rng(0)
    for k in (1, 2, 3):
        for G in (5, 8, 256):
            spec = KANLayerSpec(
                in_features=3, out_features=4, grid_size=G, spline_order=k
            )
            grid = spec.default_grid()
            x = rng.uniform(-1.3, 1.3, (129, 3)).astype(np.float32)
            x[0, :] = -1.0
            x[1, :] = 1.0
            x[2, :] = float(grid[0, k + 1])  # exactly on a knot
            a = np.asarray(b_splines(jnp.asarray(x), grid, k))
            b = np.asarray(
                b_splines_uniform(jnp.asarray(x), -1.0, 2.0 / G, G + k, k)
            )
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=2e-5)


def test_kan_apply_adaptive_grid_dispatch():
    """apply dispatches on the grid VALUES: after update_grid it must follow
    the (non-uniform) stored knots, not the static default grid — without
    changing the params pytree structure (checkpoint templates stay valid)."""
    import jax.tree_util as jtu

    from sdf_representation_tpu.models.kan import KAN, b_splines

    m = KAN(layers_hidden=(3, 8, 1), grid_size=8)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (64, 3), minval=-0.5, maxval=0.5
    )
    params2 = m.update_grid(params, x)
    # structure unchanged: adapted params restore into the init template
    assert (jtu.tree_structure(params2) == jtu.tree_structure(params))
    out = np.asarray(jax.jit(m.apply)(params2, x))
    assert np.all(np.isfinite(out))
    # apply must equal the hand-computed general-recursion path on the
    # STORED knots (i.e. the fast uniform branch must NOT have been taken)
    h = x
    for spec, p in zip(m.layer_specs, params2["layers"]):
        bases = b_splines(h, p["grid"], spec.spline_order)
        spline = jnp.einsum("bic,ico->bo", bases, spec.scaled_spline_w(p))
        h = jax.nn.silu(h) @ p["base_w"] + spline
    np.testing.assert_allclose(out, np.asarray(h[..., 0]), atol=1e-5)
    # and the grids really did leave the default (the branch is exercised)
    assert any(
        not np.array_equal(np.asarray(p["grid"]),
                           np.asarray(spec.default_grid()))
        for spec, p in zip(m.layer_specs, params2["layers"])
    )


def test_kan_checkpoint_roundtrip_after_update_grid(tmp_path):
    """Regression: saving adapted params and restoring through the
    init-derived template must work AND keep evaluating on the adapted
    knots (legacy marker checkpoints broke both)."""
    from sdf_representation_tpu.models.kan import KAN
    from sdf_representation_tpu.training.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    m = KAN(layers_hidden=(3, 8, 1), grid_size=8)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (64, 3), minval=-0.5, maxval=0.5
    )
    params2 = m.update_grid(params, x)
    path = str(tmp_path / "kan.ckpt")
    save_checkpoint(path, {"params": params2})
    restored = load_checkpoint(path, {"params": params})["params"]
    np.testing.assert_allclose(
        np.asarray(m.apply(restored, x)),
        np.asarray(m.apply(params2, x)), atol=1e-6,
    )


def test_kan_legacy_marker_checkpoint_restores(tmp_path):
    """Checkpoints written by the round-3 format (extra 'adaptive_grid'
    key per layer) restore through the alignment fallback and evaluate on
    the stored adapted knots."""
    from sdf_representation_tpu.models.kan import KAN
    from sdf_representation_tpu.training.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    m = KAN(layers_hidden=(3, 8, 1), grid_size=8)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (64, 3), minval=-0.5, maxval=0.5
    )
    params2 = m.update_grid(params, x)
    legacy = {
        "layers": [
            dict(p, adaptive_grid=np.zeros((), np.bool_))
            for p in params2["layers"]
        ]
    }
    path = str(tmp_path / "kan_legacy.ckpt")
    save_checkpoint(path, {"params": legacy})
    restored = load_checkpoint(path, {"params": params})["params"]
    np.testing.assert_allclose(
        np.asarray(m.apply(restored, x)),
        np.asarray(m.apply(params2, x)), atol=1e-6,
    )


def test_kan_update_grid_preserves_function():
    m = KAN(layers_hidden=(3, 8, 1), grid_size=8)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=-0.9, maxval=0.9)
    before = np.asarray(m.apply(params, x))
    params2 = m.update_grid(params, x)
    after = np.asarray(m.apply(params2, x))
    # re-fitting coefficients on the new grid should approximately preserve f
    assert np.abs(before - after).mean() < 0.05


def test_registry():
    assert get_model_class("ImplicitNet") is ImplicitNet
    with pytest.raises(ValueError):
        get_model_class("DoesNotExist")


def test_hash_mlp_forward_and_grad():
    from sdf_representation_tpu.models import HashMLP

    m = HashMLP(n_levels=4, log2_table_size=12, max_resolution=64)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.9, maxval=0.9)
    out = m.apply(params, x)
    assert out.shape == (64,)
    assert np.all(np.isfinite(np.asarray(out)))
    # differentiable w.r.t. tables and inputs
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    assert np.isfinite(float(jnp.sum(jnp.abs(g["tables"][0]))))
    gx = jax.grad(lambda xx: jnp.sum(m.apply(params, xx)))(x)
    assert np.all(np.isfinite(np.asarray(gx)))


def test_hash_mlp_fits_sphere_fast():
    """The hash grid should fit the sphere SDF far faster per step than a
    same-step-budget MLP — the Instant-NGP selling point."""
    import optax
    from sdf_representation_tpu.models import HashMLP

    m = HashMLP(n_levels=6, log2_table_size=13, max_resolution=128)
    params = m.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (8192, 3)).astype(np.float32))
    y = jnp.linalg.norm(x, axis=1) - 0.5
    opt = optax.adam(1e-2)
    st = opt.init(params)

    @jax.jit
    def step(p, st):
        def loss(p):
            return jnp.mean((m.apply(p, x) - y) ** 2)
        l, g = jax.value_and_grad(loss)(p)
        up, st = opt.update(g, st, p)
        return optax.apply_updates(p, up), st, l

    for _ in range(150):
        params, st, l = step(params, st)
    assert float(l) < 1e-4  # MLPs need thousands of steps for this


class TestLipschitz:
    """Working version of the reference's dead Lipschitz option
    (networks.py:54,97-98,109-112; method of arXiv:2202.08345)."""

    def _models(self):
        from sdf_representation_tpu.models import ImplicitNet

        kw = dict(d_in=3, hidden_dims=(32,) * 3, skip_in=(2,), beta=100.0)
        return ImplicitNet(**kw), ImplicitNet(lipschitz=True, **kw)

    def test_identity_at_init(self):
        """c is initialised so the row scaling starts at exactly 1: the
        Lipschitz net equals the plain net on the same weights."""
        import jax
        import jax.numpy as jnp

        plain, lip = self._models()
        params = lip.init(jax.random.PRNGKey(0))
        pparams = {"layers": [{"w": l["w"], "b": l["b"]}
                              for l in params["layers"]]}
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1)
        np.testing.assert_allclose(
            lip.apply(params, x), plain.apply(pparams, x), rtol=1e-6, atol=1e-6
        )

    def test_bound_enforced(self):
        """Shrinking c clamps the empirical gradient norm under the bound
        prod softplus(c_i) (within the sqrt(2)-skip bookkeeping slack)."""
        import jax
        import jax.numpy as jnp

        _, lip = self._models()
        params = lip.init(jax.random.PRNGKey(0))
        # force small per-layer bounds
        params["layers"] = [
            {**l, "c": jnp.asarray(0.2)} for l in params["layers"]
        ]
        bound = float(lip.lipschitz_bound(params))
        g = jax.vmap(jax.grad(lambda p: lip.apply(params, p[None])[0]))(
            jax.random.uniform(jax.random.PRNGKey(2), (256, 3), minval=-1)
        )
        # L2 grad norm <= sqrt(d_in) * Linf bound; use the safe inequality
        assert float(jnp.abs(g).max()) <= bound + 1e-5

    def test_trains_and_regularizes(self, tmp_path):
        """End-to-end through the Trainer: loss decreases AND the trainable
        Lipschitz bound shrinks under the prod-softplus regularizer."""
        from tests.test_trainer import sphere_dataset, tiny_config
        from sdf_representation_tpu.training import Trainer

        cfg = tiny_config(tmp_path, epochs=10)
        text = open(str(tmp_path / "c.ini")).read().replace(
            "geometric_init = False",
            "geometric_init = False\nlipschitz = True\nlipschitz_weight = 0.001",
        )
        (tmp_path / "lip.ini").write_text(text)
        from sdf_representation_tpu.configgen import Configuration

        cfg = Configuration(str(tmp_path / "lip.ini"))
        assert cfg.lipschitz is True
        trainer = Trainer(cfg)
        assert trainer.model.lipschitz
        b0 = float(trainer.model.lipschitz_bound(
            trainer.model.init(__import__("jax").random.PRNGKey(0))
        ))
        res = trainer.train(dataset=sphere_dataset(2000))
        assert res["train_losses"][-1] < res["train_losses"][0]
        tr, _ = trainer.load_model(best=False)
        b1 = float(trainer.model.lipschitz_bound(tr["params"]))
        assert b1 < b0  # the regularizer actually pulls the bound down

    def test_export_bakes_scaling(self, tmp_path):
        """Exported artifacts must carry the EFFECTIVE (scaled) weights: the
        .sdfw round-trip evaluated as a plain net equals the Lipschitz net."""
        import jax
        import jax.numpy as jnp
        from sdf_representation_tpu.export.native_format import save_sdfw
        from sdf_representation_tpu.export.quantize import load_sdfw_any
        from sdf_representation_tpu.models import ImplicitNet

        plain, lip = self._models()
        params = lip.init(jax.random.PRNGKey(0))
        params["layers"] = [
            {**l, "c": jnp.asarray(1.0)} for l in params["layers"]
        ]  # non-trivial scaling
        path = save_sdfw(str(tmp_path / "m.sdfw"), lip, params)
        _meta, loaded = load_sdfw_any(path)
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1)
        np.testing.assert_allclose(
            plain.apply(loaded, x), lip.apply(params, x), rtol=1e-5, atol=1e-5
        )


def test_kan_grid_is_frozen_buffer():
    """The knot grid must receive exactly zero gradient (the reference
    registers it as a buffer): trained knots eventually cross and the
    Cox-de Boor divisions produce NaN (regression for a real divergence
    observed after ~100 Adam epochs)."""
    import jax
    import jax.numpy as jnp

    from sdf_representation_tpu.models import KAN

    model = KAN(layers_hidden=(3, 16, 1), grid_size=8)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-1)

    def loss(p):
        return jnp.sum(model.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    for layer in g["layers"]:
        assert float(jnp.abs(layer["grid"]).max()) == 0.0
        assert float(jnp.abs(layer["base_w"]).max()) > 0.0
        assert float(jnp.abs(layer["spline_w"]).max()) > 0.0


class TestSiren:
    def test_init_preactivation_statistics(self):
        """Sitzmann init: hidden pre-activations ~N(0,1) through depth."""
        import jax
        import jax.numpy as jnp

        from sdf_representation_tpu.models.siren import Siren

        m = Siren(d_in=3, hidden_dims=(256,) * 4)
        p = m.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (4096, 3), minval=-1,
                               maxval=1)
        w0 = m.omega_0
        h = jnp.sin(w0 * (x @ p["layers"][0]["w"]))
        for layer in p["layers"][1:-1]:
            pre = w0 * (h @ layer["w"])
            std = float(jnp.std(pre))
            assert 0.5 < std < 2.0  # stays O(1), no blow-up/collapse
            h = jnp.sin(pre)

    def test_fits_sphere_sdf(self):
        """A tiny Siren fits an analytic sphere SDF fast (the paper's
        selling point: rapid convergence on implicit fields)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from sdf_representation_tpu.models.siren import Siren

        m = Siren(d_in=3, hidden_dims=(64,) * 3)
        p = m.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.uniform(-1, 1, (8192, 3)).astype(np.float32))
        Y = jnp.linalg.norm(X, axis=1) - 0.5
        opt = optax.adam(1e-4)
        st = opt.init(p)

        @jax.jit
        def step(p, st):
            l, g = jax.value_and_grad(
                lambda p: jnp.mean((m.apply(p, X) - Y) ** 2)
            )(p)
            u, st = opt.update(g, st)
            return optax.apply_updates(p, u), st, l

        for _ in range(300):
            p, st, l = step(p, st)
        pred = m.apply(p, X)
        acc = float(jnp.mean(jnp.sign(pred) == jnp.sign(Y)))
        assert float(l) < 1e-3 and acc > 0.97, (float(l), acc)

    def test_config_builds_siren(self, tmp_path):
        from tests.test_trainer import tiny_config

        cfg = tiny_config(tmp_path, epochs=1)
        cfg.config.set("Model", "model", "Siren")
        cfg.config.set("Model", "omega_0", "20")
        cfg.model_name = "Siren"
        model = cfg.make_model()
        assert model.omega_0 == 20.0
        import jax

        p = model.init(jax.random.PRNGKey(0))
        out = model.apply(p, jax.numpy.zeros((4, 3)))
        assert out.shape == (4,)
