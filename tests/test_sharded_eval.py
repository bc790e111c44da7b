"""Sharded (multi-device) grid evaluation on the 8-virtual-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_representation_tpu.models import ImplicitNet
from sdf_representation_tpu.ops.grid_eval import evaluate_grid
from sdf_representation_tpu.ops.sharded_eval import sharded_grid_eval
from sdf_representation_tpu.parallel.mesh import get_mesh


@pytest.fixture(scope="module")
def model_params():
    model = ImplicitNet(d_in=3, hidden_dims=(32,) * 3, skip_in=(2,), beta=100.0)
    return model, model.init(jax.random.PRNGKey(0))


def test_sharded_matches_single_device_xla(model_params):
    model, params = model_params
    n = 24
    ref = evaluate_grid(model.apply, params, n, chunk=4096)
    mesh = get_mesh(8)
    out = np.asarray(
        sharded_grid_eval(
            model, params, n, mesh, tile_p=128, use_pallas=False,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-5)


def test_sharded_pallas_interpret(model_params):
    model, params = model_params
    n = 16
    ref = evaluate_grid(model.apply, params, n, chunk=4096)
    mesh = get_mesh(4)
    out = np.asarray(
        sharded_grid_eval(
            model, params, n, mesh, tile_p=128, use_pallas=True,
            interpret=True, compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_device_counts(model_params, n_dev):
    model, params = model_params
    n = 16
    ref = evaluate_grid(model.apply, params, n, chunk=4096)
    out = np.asarray(
        sharded_grid_eval(
            model, params, n, get_mesh(n_dev), tile_p=128, use_pallas=False,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_non_divisible_tiles(model_params, use_pallas):
    """n^3 not divisible by tile_p or by n_dev*tile_p: the tile count is
    rounded up to a device multiple and the flat output truncated, so the
    padded tail (garbage coords past n^3) must never leak into the volume."""
    model, params = model_params
    n = 15  # 3375 points -> 26.4 tiles of 128 -> 27 -> padded to 32 for 8 dev
    ref = evaluate_grid(model.apply, params, n, chunk=4096)
    out = np.asarray(
        sharded_grid_eval(
            model, params, n, get_mesh(8), tile_p=128, use_pallas=use_pallas,
            interpret=use_pallas, compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Sharded SPARSE evaluation
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sdf_model_params():
    # geometric init => f ~ |x| - 0.5: a realistic sparse-friendly field
    model = ImplicitNet(
        d_in=3, hidden_dims=(32,) * 3, skip_in=(2,), beta=100.0,
        radius_init=0.5,
    )
    return model, model.init(jax.random.PRNGKey(0))


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sparse_sharded_matches_single_device(sdf_model_params, n_dev):
    """Sharded-sparse == single-device sparse, elementwise (VERDICT r2 #4)."""
    from sdf_representation_tpu.ops.sharded_eval import sparse_sharded_grid_eval
    from sdf_representation_tpu.ops.sparse_grid import sparse_grid_eval

    model, params = sdf_model_params
    n = 64  # nb = 8 splits over 1/2/8 devices
    ref, count_ref = sparse_grid_eval(
        model, params, n, compute_dtype=jnp.float32, interpret=True,
        eps=1e-4, return_count=True,
    )
    out, count = sparse_sharded_grid_eval(
        model, params, n, get_mesh(n_dev), compute_dtype=jnp.float32,
        use_pallas=False, eps=1e-4, return_count=True,
    )
    assert count == count_ref
    assert 0 < count < (n // 8) ** 3  # genuinely sparse
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sparse_sharded_pallas_interpret(sdf_model_params):
    from sdf_representation_tpu.ops.sharded_eval import sparse_sharded_grid_eval
    from sdf_representation_tpu.ops.sparse_grid import sparse_grid_eval

    model, params = sdf_model_params
    n = 32  # nb = 4 over 4 devices: one block-plane each
    ref = sparse_grid_eval(
        model, params, n, compute_dtype=jnp.float32, interpret=True, eps=1e-4,
    )
    out = sparse_sharded_grid_eval(
        model, params, n, get_mesh(4), compute_dtype=jnp.float32,
        use_pallas=True, interpret=True, eps=1e-4,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sparse_sharded_budget_overflow_retries(sdf_model_params):
    from sdf_representation_tpu.ops.sharded_eval import sparse_sharded_grid_eval
    from sdf_representation_tpu.ops.sparse_grid import sparse_grid_eval

    model, params = sdf_model_params
    n = 64
    ref = sparse_grid_eval(
        model, params, n, compute_dtype=jnp.float32, interpret=True, eps=1e-4,
    )
    out = sparse_sharded_grid_eval(
        model, params, n, get_mesh(2), k_max_frac=0.01,
        compute_dtype=jnp.float32, use_pallas=False, eps=1e-4,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sparse_sharded_rejects_indivisible_block_grid(sdf_model_params):
    from sdf_representation_tpu.ops.sharded_eval import sparse_sharded_grid_eval

    model, params = sdf_model_params
    with pytest.raises(ValueError):
        # nb = 3 does not split over 2 devices
        sparse_sharded_grid_eval(model, params, 24, get_mesh(2))


def test_sharded_steep_field_exact_by_construction():
    """The sharded sparse path must apply the same adaptive per-block
    margin as the single-device one: the steep plane (L ~ 20, which used to
    trip the certificate) is selected outright — on_violation='error' does
    not raise and the zero shell matches the dense sharded eval exactly."""
    import jax.numpy as jnp

    from sdf_representation_tpu.ops.sharded_eval import (
        sharded_grid_eval,
        sparse_sharded_grid_eval,
    )
    from sdf_representation_tpu.parallel.mesh import get_mesh
    from tests.test_sparse_grid import _steep_plane_params

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = get_mesh()
    model = ImplicitNet(d_in=3, hidden_dims=(8,), skip_in=(), beta=100.0)
    params = _steep_plane_params(model)
    vol = sparse_sharded_grid_eval(
        model, params, 64, mesh, compute_dtype=jnp.float32,
        interpret=True, use_pallas=False, on_violation="error",
    )
    ref = sharded_grid_eval(
        model, params, 64, mesh, compute_dtype=jnp.float32,
        interpret=True, use_pallas=False,
    )
    vol = np.asarray(vol).reshape(-1)
    ref = np.asarray(ref).reshape(-1)
    shell = np.abs(ref) < 20.0 * (2.0 / 63) * 2
    assert shell.any()
    np.testing.assert_array_equal(vol[shell], ref[shell])
