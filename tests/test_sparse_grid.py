"""Sparse hierarchical grid eval: proves sparse == dense on the zero-crossing
shell — the extracted mesh must be IDENTICAL (interpret mode on CPU).

This is the on-device analog of the reference's octree refinement
(reference ops/DeepTrace/src/deeptrace.cpp:59-81)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_representation_tpu.models import ImplicitNet
from sdf_representation_tpu.ops.marching import marching_cubes
from sdf_representation_tpu.ops.pallas_mlp import fused_grid_eval
from sdf_representation_tpu.ops.sparse_grid import (
    active_threshold,
    sparse_grid_eval,
)


def _model_and_params(skip=(2,), radius=0.5, seed=0):
    # geometric init => f ~ |x| - radius, Lipschitz ~ 1: a realistic SDF field
    model = ImplicitNet(
        d_in=3, hidden_dims=(64,) * 4, skip_in=skip, beta=100.0,
        radius_init=radius,
    )
    return model, model.init(jax.random.PRNGKey(seed))


@pytest.mark.parametrize("skip", [(2,), ()])
def test_sparse_matches_dense_on_shell_and_mesh(skip):
    model, params = _model_and_params(skip=skip)
    n, block = 64, 8
    dense = np.asarray(
        fused_grid_eval(model, params, n, tile_p=1024,
                        compute_dtype=jnp.float32, interpret=True)
    )
    sparse, count = sparse_grid_eval(
        model, params, n, block=block, k_max_frac=0.5,
        compute_dtype=jnp.float32, interpret=True, eps=1e-4,
        return_count=True,
    )
    sparse = np.asarray(sparse)
    nb = n // block
    assert 0 < count < nb**3  # genuinely sparse

    # every block whose coarse value is under threshold holds EXACT dense vals
    tau = active_threshold(n, block, safety=1.5, eps=1e-4)  # the default
    blocked_d = dense.reshape(nb, block, nb, block, nb, block)
    blocked_s = sparse.reshape(nb, block, nb, block, nb, block)
    # recompute coarse mask the same way the evaluator does
    s = 2.0 / (n - 1)
    half = (block - 1) / 2.0
    ax = -1.0 + s * (np.arange(nb) * block + half)
    cx, cy, cz = np.meshgrid(ax, ax, ax, indexing="ij")
    centers = np.stack([cx, cy, cz], -1).reshape(-1, 3).astype(np.float32)
    coarse = np.asarray(model.apply(params, jnp.asarray(centers))).reshape(
        nb, nb, nb
    )
    active = np.abs(coarse) <= tau
    for bx, by, bz in np.argwhere(active):
        np.testing.assert_array_equal(
            blocked_s[bx, :, by, :, bz, :], blocked_d[bx, :, by, :, bz, :]
        )

    # inactive fill keeps the correct sign everywhere
    assert np.all(np.sign(sparse[dense != 0]) * np.sign(dense[dense != 0]) >= 0)

    # the extracted meshes are IDENTICAL (vertices and faces)
    sp = 2.0 / (n - 1)
    vd, fd = marching_cubes(dense, 0.0, (sp,) * 3, (-1.0,) * 3)
    vs, fs = marching_cubes(sparse, 0.0, (sp,) * 3, (-1.0,) * 3)
    assert len(fd) > 100  # a real surface was extracted
    np.testing.assert_array_equal(fs, fd)
    np.testing.assert_allclose(vs, vd, rtol=0, atol=0)


def test_sparse_budget_overflow_retries():
    model, params = _model_and_params()
    n, block = 32, 8
    # absurdly small budget: must transparently retry with a bigger one
    vol, count = sparse_grid_eval(
        model, params, n, block=block, k_max_frac=0.02,
        compute_dtype=jnp.float32, interpret=True, return_count=True,
    )
    dense = np.asarray(
        fused_grid_eval(model, params, n, tile_p=512,
                        compute_dtype=jnp.float32, interpret=True)
    )
    sp = 2.0 / (n - 1)
    vd, fd = marching_cubes(dense, 0.0, (sp,) * 3, (-1.0,) * 3)
    vs, fs = marching_cubes(np.asarray(vol), 0.0, (sp,) * 3, (-1.0,) * 3)
    np.testing.assert_array_equal(fs, fd)
    np.testing.assert_allclose(vs, vd, rtol=0, atol=0)


def test_sparse_rejects_indivisible_n():
    model, params = _model_and_params()
    with pytest.raises(ValueError):
        sparse_grid_eval(model, params, 60, block=8)


def test_budget_cache_oversize_is_harmless():
    """The settled-budget cache can leave k_max larger than a later call
    needs (different params, fewer active blocks); the in-kernel early exit
    plus drop-scatter must keep the result identical to a fresh run."""
    import jax
    import jax.numpy as jnp

    from sdf_representation_tpu.models import ImplicitNet
    from sdf_representation_tpu.ops.pallas_mlp import fused_grid_eval
    from sdf_representation_tpu.ops.sparse_grid import (
        _KMAX_CACHE,
        sparse_grid_eval,
    )

    model = ImplicitNet(d_in=3, hidden_dims=(16,) * 2, skip_in=(1,),
                        beta=100.0, radius_init=0.5)
    n = 32
    p1 = model.init(jax.random.PRNGKey(0))
    v1, c1 = sparse_grid_eval(
        model, p1, n, interpret=True, compute_dtype=jnp.float32,
        return_count=True,
    )
    # different params -> different (typically smaller/other) active set,
    # same cache key
    p2 = jax.tree_util.tree_map(lambda a: a * 0.5, p1)
    v2, c2 = sparse_grid_eval(
        model, p2, n, interpret=True, compute_dtype=jnp.float32,
        return_count=True,
    )
    ref2 = fused_grid_eval(model, p2, n, compute_dtype=jnp.float32,
                           interpret=True)
    # active blocks must match the dense eval exactly despite the reused
    # (potentially oversized) budget
    import numpy as np

    v2 = np.asarray(v2).reshape(-1)
    ref2 = np.asarray(ref2).reshape(-1)
    mask = np.abs(ref2) < 0.05  # near-shell values are from refined blocks
    np.testing.assert_array_equal(v2[mask], ref2[mask])


def _steep_plane_params(model, slope=20.0, offset=4.0):
    """Hand-built params realizing f(x) = slope * x0 (local Lipschitz =
    slope >> safety): unit 0 computes softplus_beta(x0 + offset) = x0 +
    offset exactly (beta=100 saturates linear), the head rescales and
    recenters. All other units are dead (zero weights/bias)."""
    params = model.init(jax.random.PRNGKey(0))
    w0 = np.zeros(params["layers"][0]["w"].shape, np.float32)
    b0 = np.zeros(params["layers"][0]["b"].shape, np.float32)
    w0[0, 0] = 1.0
    b0[0] = offset
    w1 = np.zeros(params["layers"][1]["w"].shape, np.float32)
    b1 = np.zeros(params["layers"][1]["b"].shape, np.float32)
    w1[0, 0] = slope
    b1[0] = -slope * offset
    params["layers"][0] = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    params["layers"][1] = {"w": jnp.asarray(w1), "b": jnp.asarray(b1)}
    return params


def test_adaptive_margin_selects_steep_field_by_construction():
    """A field whose local Lipschitz exceeds the historical constant margin
    (f = 20*x0) must be handled WITHOUT tripping the certificate: the
    adaptive per-block margin measures L ~ 20 from the coarse neighbour
    differences and widens the selection accordingly (round-5 upgrade from
    detect-and-fall-back to exact-by-construction)."""
    model = ImplicitNet(d_in=3, hidden_dims=(8,), skip_in=(), beta=100.0)
    params = _steep_plane_params(model)
    # sanity: the engineered field really is f = 20*x0
    probe = jnp.asarray([[0.1, 0.3, -0.2], [-0.4, 0.0, 0.9]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model.apply(params, probe)), [2.0, -8.0], atol=1e-4
    )
    # on_violation="error": must NOT raise — selection is now sufficient
    vol = sparse_grid_eval(
        model, params, 32, compute_dtype=jnp.float32, interpret=True,
        on_violation="error",
    )
    dense = fused_grid_eval(model, params, 32, compute_dtype=jnp.float32,
                            interpret=True)
    vol = np.asarray(vol).reshape(-1)
    dense = np.asarray(dense).reshape(-1)
    # every near-crossing value (the whole zero shell) is refined = exact
    shell = np.abs(dense) < 20.0 * (2.0 / 31) * 2
    assert shell.any()
    np.testing.assert_array_equal(vol[shell], dense[shell])


def test_certificate_counts_sub_block_misses():
    """The certificate backstop itself: a synthetic coarse field whose
    adjacent INACTIVE centers straddle zero must be counted as a violation
    (unit test of the counting rule — adaptive selection makes such fields
    hard to realise through a real net, which is the point)."""
    from sdf_representation_tpu.ops.sparse_grid import (
        certificate_violations)

    nb = 4
    coarse = np.full((nb, nb, nb), 5.0, np.float32)
    coarse[2:] = -5.0  # sign flip between x-planes 1 and 2
    mask = np.zeros((nb, nb, nb), bool)  # nothing selected
    viol = int(certificate_violations(
        jnp.asarray(coarse.reshape(-1)), jnp.asarray(mask.reshape(-1)), nb
    ))
    assert viol == nb * nb  # one bad pair per (y, z) column
    # selecting one side of every straddling pair clears the certificate
    mask[1] = True
    viol = int(certificate_violations(
        jnp.asarray(coarse.reshape(-1)), jnp.asarray(mask.reshape(-1)), nb
    ))
    assert viol == 0


def test_certificate_no_false_positive_on_sdf_like_field():
    """The certificate must stay silent on realistic (Lipschitz ~ 1)
    fields: on_violation='error' must not raise for the geometric-init
    net the mesh-equality tests use."""
    model, params = _model_and_params()
    vol = sparse_grid_eval(
        model, params, 32, compute_dtype=jnp.float32, interpret=True,
        on_violation="error",
    )
    assert np.all(np.isfinite(np.asarray(vol)))
