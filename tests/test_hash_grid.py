"""Separable HashMLP grid evaluation == pointwise apply (CPU).

The separable path (ops/hash_grid_eval.py) replaces per-point corner
gathers with per-level corner volumes + banded interpolation matmuls; it
must agree with models/hash_mlp.HashMLP.apply on the same grid coordinates
to f32 rounding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_representation_tpu.models.hash_mlp import HashMLP
from sdf_representation_tpu.ops.hash_grid_eval import hash_grid_eval


def _grid_coords(n):
    step = np.float32(2.0 / (n - 1))
    ax = (-1.0 + step * np.arange(n, dtype=np.float32)).astype(np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def _pointwise(model, params, n, chunk=65536):
    pts = _grid_coords(n)
    out = np.empty(len(pts), np.float32)
    for s in range(0, len(pts), chunk):
        out[s : s + chunk] = np.asarray(
            model.apply(params, jnp.asarray(pts[s : s + chunk]))
        )
    return out.reshape(n, n, n)


@pytest.mark.parametrize(
    "n,slab_d",
    [(17, 8), (32, 32), (24, 7)],  # divisible, single-slab, ragged tail
)
def test_separable_matches_pointwise(n, slab_d):
    model = HashMLP(
        n_levels=4, log2_table_size=10, base_resolution=4, max_resolution=48,
        hidden_dim=32, num_layers=2,
    )
    params = model.init(jax.random.PRNGKey(0))
    ref = _pointwise(model, params, n)
    out = np.asarray(hash_grid_eval(model, params, n, slab_d=slab_d))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_separable_hashed_levels():
    """max_resolution large enough that the finest levels exceed the table
    and use the spatial hash — the volume build must hash identically."""
    model = HashMLP(
        n_levels=4, log2_table_size=8, base_resolution=4, max_resolution=40,
        hidden_dim=16, num_layers=2,
    )
    # (res+1)^3 > 256 for res >= 7: levels 2, 3 are hashed
    assert (model.level_resolution(3) + 1) ** 3 > model.table_size
    params = model.init(jax.random.PRNGKey(1))
    n = 21
    ref = _pointwise(model, params, n)
    out = np.asarray(hash_grid_eval(model, params, n, slab_d=8))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_separable_no_xyz():
    model = HashMLP(
        n_levels=3, log2_table_size=10, base_resolution=4, max_resolution=16,
        hidden_dim=16, num_layers=3, include_xyz=False,
    )
    params = model.init(jax.random.PRNGKey(2))
    n = 16
    ref = _pointwise(model, params, n)
    out = np.asarray(hash_grid_eval(model, params, n, slab_d=16))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_fused_encode_matches_per_level():
    """encode() is a single stacked-table gather; must equal the per-level
    reference encoder bit-for-bit (same corner-accumulation order)."""
    import jax
    import jax.numpy as jnp

    from sdf_representation_tpu.models.hash_mlp import HashMLP

    m = HashMLP()
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2048, 3), minval=-1,
                           maxval=1)
    fused = m.encode(params, x)
    x01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
    ref = jnp.concatenate(
        [m._encode_level(t, x01, m.level_resolution(l))
         for l, t in enumerate(params["tables"])] + [x], axis=-1)
    assert float(jnp.abs(fused - ref).max()) < 1e-6
