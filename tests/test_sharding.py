"""Multi-device data-parallel tests on the 8-device virtual CPU mesh —
the TPU answer to "test multi-node without a cluster" (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sdf_representation_tpu.losses import IGRLOSS, WeightedSmoothL2Loss
from sdf_representation_tpu.models import ImplicitNet
from sdf_representation_tpu.parallel.mesh import (
    data_sharding,
    get_mesh,
    replicated_sharding,
)
from sdf_representation_tpu.training.trainer import make_epoch_fn, make_train_step


def setup(n=512, seed=0):
    model = ImplicitNet(d_in=3, hidden_dims=(32,) * 2, skip_in=(1,), beta=100.0)
    params = model.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    sdf = np.linalg.norm(x, axis=1) - 0.5
    nrm = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-9)
    y = np.column_stack([sdf, nrm]).astype(np.float32)
    return model, params, jnp.asarray(x), jnp.asarray(y)


def test_eight_devices_available():
    assert jax.device_count() == 8


@pytest.mark.parametrize("loss", [WeightedSmoothL2Loss(), IGRLOSS()])
def test_sharded_step_matches_single_device(loss):
    """The data-parallel step must be numerically equivalent to single-device
    (XLA inserts the gradient psum; params stay replicated)."""
    model, params, x, y = setup()
    optimizer = optax.adam(1e-3)
    trainable = {"params": params, "aux": {}}
    opt_state = optimizer.init(trainable)

    step_single = jax.jit(make_train_step(model, loss, optimizer, mesh=None))
    t1, _, l1 = step_single(trainable, opt_state, x, y, jax.random.PRNGKey(0), 0)

    mesh = get_mesh(8)
    tr_r = jax.device_put(trainable, replicated_sharding(mesh))
    os_r = jax.device_put(opt_state, replicated_sharding(mesh))
    xs = jax.device_put(x, data_sharding(mesh))
    ys = jax.device_put(y, data_sharding(mesh))
    step_dp = jax.jit(make_train_step(model, loss, optimizer, mesh=mesh))
    t8, _, l8 = step_dp(tr_r, os_r, xs, ys, jax.random.PRNGKey(0), 0)

    assert float(l1) == pytest.approx(float(l8), rel=1e-5)
    w1 = np.asarray(t1["params"]["layers"][0]["w"])
    w8 = np.asarray(t8["params"]["layers"][0]["w"])
    np.testing.assert_allclose(w1, w8, rtol=1e-4, atol=1e-6)


def test_epoch_fn_with_mesh():
    model, params, x, y = setup(n=1024)
    optimizer = optax.adam(1e-3)
    trainable = {"params": params, "aux": {}}
    opt_state = optimizer.init(trainable)
    mesh = get_mesh(8)
    epoch_fn = make_epoch_fn(
        model, WeightedSmoothL2Loss(), optimizer, batch_size=256,
        n_points=1024, mesh=mesh,
    )
    trainable, opt_state, loss_val = epoch_fn(
        trainable, opt_state, x, y, jax.random.PRNGKey(0), 0
    )
    assert np.isfinite(float(loss_val))


def test_mesh_subsets():
    for nd in (1, 2, 4, 8):
        mesh = get_mesh(nd)
        assert mesh.devices.size == nd


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
