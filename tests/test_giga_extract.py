"""Slab-streamed giga extraction: the merged slab meshes must be IDENTICAL
(vertex set, t values, face topology) to a single-dispatch extraction of the
same field — the slab tiling is an implementation detail, not an
approximation. Role match: the out-of-core octree consumer of reference
ops/DeepTrace/src/deeptrace.cpp:59-81 at reference executor/executor.py's
reconstruction contract (executor.py:346-400)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_representation_tpu.models import ImplicitNet
from sdf_representation_tpu.ops.giga_extract import (
    _slab_plan,
    default_slab,
    extract_mesh_giga,
)
from sdf_representation_tpu.ops.marching_device import marching_cubes_device
from sdf_representation_tpu.ops.sparse_grid import sparse_grid_eval


def _model_and_params(radius=0.5, seed=0):
    model = ImplicitNet(
        d_in=3, hidden_dims=(32,) * 3, skip_in=(), beta=100.0,
        radius_init=radius,
    )
    return model, model.init(jax.random.PRNGKey(seed))


def _dense_volume(model, params, n):
    s = 2.0 / (n - 1)
    ax = -1.0 + s * np.arange(n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    vals = np.asarray(model.apply(params, jnp.asarray(pts)), np.float32)
    return vals.reshape(n, n, n)


def _canon(verts, faces):
    """Canonical orientation-preserving triangle soup: each face as its 3
    vertex coordinates rotated so the lexicographically smallest vertex is
    first, all faces sorted."""
    tri = verts[faces]  # (T, 3, 3)
    best = tri.reshape(len(tri), -1)
    for r in (1, 2):
        rot = np.roll(tri, -r, axis=1).reshape(len(tri), -1)
        best = np.where(_lex_less(rot, best)[:, None], rot, best)
    order = np.lexsort(best.T[::-1])
    return best[order]


def _lex_less(a, b):
    """Row-wise lexicographic a < b for 2-D float arrays."""
    out = np.zeros(len(a), bool)
    decided = np.zeros(len(a), bool)
    for c in range(a.shape[1]):
        lt = a[:, c] < b[:, c]
        gt = a[:, c] > b[:, c]
        out |= ~decided & lt
        decided |= lt | gt
    return out


def _assert_same_mesh(vf_a, vf_b):
    va, fa = vf_a
    vb, fb = vf_b
    assert len(fa) == len(fb)
    ca, cb = _canon(va, fa), _canon(vb, fb)
    np.testing.assert_allclose(ca, cb, rtol=0, atol=0)


def test_slab_plan_partitions_cube_layers():
    for n, slab in [(40, 16), (33, 16), (64, 8), (17, 16)]:
        plan = _slab_plan(n, slab)
        layers = []
        for x0, sx in plan:
            assert sx >= 2
            layers.extend(range(x0, x0 + sx - 1))
        assert layers == list(range(n - 1))  # disjoint and complete


def test_default_slab_respects_slot_space():
    for n in (512, 648, 1024, 2048):
        slab = default_slab(n)
        assert slab % 8 == 0
        assert (slab + 1) * n * n * 7 < 2**31


@pytest.mark.parametrize("wire", ["exact", "packed"])
def test_giga_dense_volfn_matches_single_shot(wire):
    """Slab-merged extraction of a dense volume == one-dispatch extraction:
    same triangles, same vertex positions, no seam artifacts at the slab
    planes (slab=16 puts two interior seams through the r=0.5 sphere)."""
    model, params = _model_and_params()
    n = 40
    vol = _dense_volume(model, params, n)
    s = 2.0 / (n - 1)
    ref = marching_cubes_device(jnp.asarray(vol), 0.0, (s,) * 3,
                                (-1.0,) * 3, wire=wire)
    assert len(ref[1]) > 100

    giga = extract_mesh_giga(
        None, None, n, slab=16, wire=wire,
        vol_fn=lambda x0, sx: jnp.asarray(vol[x0:x0 + sx]),
    )
    _assert_same_mesh(giga, ref)


def test_giga_sparse_refine_matches_full_sparse_eval():
    """The default (sparse-refinement) slab evaluator produces the same
    mesh as marching the full sparse_grid_eval volume — the slab offset
    machinery changes nothing about which blocks refine or their values."""
    model, params = _model_and_params()
    n = 32
    vol = sparse_grid_eval(model, params, n, compute_dtype=jnp.float32,
                           interpret=True, on_violation="error")
    s = 2.0 / (n - 1)
    ref = marching_cubes_device(vol, 0.0, (s,) * 3, (-1.0,) * 3,
                                wire="exact")
    assert len(ref[1]) > 50

    giga = extract_mesh_giga(
        model, params, n, slab=16, wire="exact",
        compute_dtype=jnp.float32, interpret=True, on_violation="error",
    )
    _assert_same_mesh(giga, ref)


def test_giga_hash_mlp_separable_slabs():
    """HashMLP fields route to the separable x-slab evaluator: the slab-
    merged mesh equals marching the full separable volume, and planes
    shared by adjacent slab dispatches are BITWISE equal (row-independent
    contractions — the seam-exactness precondition)."""
    from sdf_representation_tpu.models.hash_mlp import HashMLP
    from sdf_representation_tpu.ops.hash_grid_eval import (
        hash_grid_eval,
        hash_grid_eval_x_slab,
    )

    model = HashMLP(n_levels=4, log2_table_size=9, base_resolution=4,
                    max_resolution=32)
    params = model.init(jax.random.PRNGKey(2))
    # make the field cross zero: bias the head so ~half the box is inside
    probe = jax.random.uniform(jax.random.PRNGKey(3), (4096, 3),
                               minval=-1.0, maxval=1.0)
    med = float(jnp.median(model.apply(params, probe)))
    params["mlp"][-1]["b"] = params["mlp"][-1]["b"] - med

    n = 32
    # single-shot baseline from the SAME evaluator (the z-slab evaluator
    # contracts axes in a different order -> last-ulp differences are
    # legitimate; cross-checked with tolerance below)
    vol = hash_grid_eval_x_slab(model, params, 0, n, n, sub=8)
    np.testing.assert_allclose(np.asarray(vol),
                               np.asarray(hash_grid_eval(model, params, n)),
                               rtol=1e-5, atol=1e-6)
    s = 2.0 / (n - 1)
    ref = marching_cubes_device(vol, 0.0, (s,) * 3, (-1.0,) * 3,
                                wire="exact")
    assert len(ref[1]) > 50

    # bitwise seam check across independent dispatches
    a = np.asarray(hash_grid_eval_x_slab(model, params, 0, 17, n, sub=8))
    b = np.asarray(hash_grid_eval_x_slab(model, params, 16, 16, n, sub=8))
    np.testing.assert_array_equal(a[16], b[0])

    giga = extract_mesh_giga(model, params, n, slab=16, wire="exact")
    _assert_same_mesh(giga, ref)

    if len(jax.devices()) >= 2:  # multi-device round-robin, same mesh
        multi = extract_mesh_giga(model, params, n, slab=8, wire="exact",
                                  devices=jax.devices()[:2])
        _assert_same_mesh(multi, ref)


def test_giga_multi_device_round_robin_identical():
    """Slabs round-robined over several devices (weights replicated, each
    device refining + marching its own slabs) must merge to the identical
    mesh — device placement is a throughput knob, never a result change.
    Runs on the virtual 8-CPU mesh (conftest)."""
    devs = jax.devices()
    if len(devs) < 3:
        pytest.skip("needs >=3 virtual devices")
    model, params = _model_and_params()
    n = 32
    ref = extract_mesh_giga(
        model, params, n, slab=8, wire="exact",
        compute_dtype=jnp.float32, interpret=True, on_violation="error",
    )
    multi = extract_mesh_giga(
        model, params, n, slab=8, wire="exact",
        compute_dtype=jnp.float32, interpret=True, on_violation="error",
        devices=devs[:3],
    )
    assert len(ref[1]) > 50
    _assert_same_mesh(multi, ref)


def test_default_slab_device_aware():
    """default_slab must never leave a device without a slab: the int32
    slot space alone yields only 4 slabs at 1024^3, idling half a v5e-8 —
    with n_devices it shrinks (block-aligned) until every device owns one.
    Single-device behavior is unchanged."""
    from sdf_representation_tpu.ops.giga_extract import (
        _slab_plan, default_slab)

    assert default_slab(1024) == default_slab(1024, n_devices=1)
    for n in (512, 1024):
        for nd in (2, 4, 8):
            slab = default_slab(n, n_devices=nd)
            plan = _slab_plan(n, slab)
            assert len(plan) >= min(nd, n // 8), (n, nd, slab, len(plan))
            assert slab % 8 == 0
            # still within the int32 slot space
            assert (slab + 1) * n * n * 7 < 2**31


def test_giga_steep_field_exact_by_construction():
    """The steep plane (L ~ 20) used to trip the certificate; the adaptive
    per-block margin (ops/sparse_grid.adaptive_threshold) now selects its
    crossing shell outright — giga extraction must equal marching the dense
    volume with on_violation='error' (no fallback taken)."""
    from tests.test_sparse_grid import _steep_plane_params

    model = ImplicitNet(d_in=3, hidden_dims=(8,), skip_in=(), beta=100.0)
    params = _steep_plane_params(model)
    giga = extract_mesh_giga(
        model, params, 32, slab=16, compute_dtype=jnp.float32,
        interpret=True, on_violation="error", wire="exact",
    )
    vol = _dense_volume(model, params, 32)
    s = 2.0 / 31
    ref = marching_cubes_device(jnp.asarray(vol), 0.0, (s,) * 3,
                                (-1.0,) * 3, wire="exact")
    _assert_same_mesh(giga, ref)
    # on_violation="dense" (refine everything) must agree as well
    giga_d = extract_mesh_giga(
        model, params, 32, slab=16, compute_dtype=jnp.float32,
        interpret=True, on_violation="dense", wire="exact",
    )
    _assert_same_mesh(giga_d, ref)


def test_giga_validates_inputs():
    model, params = _model_and_params()
    with pytest.raises(ValueError, match="divisible"):
        extract_mesh_giga(model, params, 33, slab=16)
    with pytest.raises(ValueError, match="divisible"):
        extract_mesh_giga(model, params, 32, slab=12)
    with pytest.raises(ValueError, match="slot space"):
        extract_mesh_giga(None, None, 1024, slab=1024,
                          vol_fn=lambda x0, sx: None)


def test_giga_nonzero_level_selects_the_right_shell():
    """Extraction at level != 0 must select/refine blocks around f=level,
    not f=0 (regression: the coarse mask used |coarse| <= tau, producing a
    silently wrong mesh for offset surfaces)."""
    from sdf_representation_tpu.ops.pallas_mlp import fused_grid_eval

    model, params = _model_and_params()
    n, level = 32, 0.3
    vol = fused_grid_eval(model, params, n, compute_dtype=jnp.float32,
                          interpret=True)
    s = 2.0 / (n - 1)
    ref = marching_cubes_device(jnp.asarray(vol), level, (s,) * 3,
                                (-1.0,) * 3, wire="exact")
    assert len(ref[1]) > 50
    giga = extract_mesh_giga(
        model, params, n, slab=16, level=level, wire="exact",
        compute_dtype=jnp.float32, interpret=True, on_violation="error",
    )
    _assert_same_mesh(giga, ref)


def test_sparse_grid_eval_nonzero_level():
    """sparse_grid_eval(level=L) fills exactly on the f=L shell — the
    extracted offset surface equals the dense volume's."""
    from sdf_representation_tpu.ops.marching import marching_cubes
    from sdf_representation_tpu.ops.pallas_mlp import fused_grid_eval

    model, params = _model_and_params()
    n, level = 32, 0.3
    dense = np.asarray(fused_grid_eval(model, params, n,
                                       compute_dtype=jnp.float32,
                                       interpret=True))
    sparse = np.asarray(sparse_grid_eval(
        model, params, n, compute_dtype=jnp.float32, interpret=True,
        on_violation="error", level=level,
    ))
    s = 2.0 / (n - 1)
    vd, fd = marching_cubes(dense, level, (s,) * 3, (-1.0,) * 3)
    vs, fs = marching_cubes(sparse, level, (s,) * 3, (-1.0,) * 3)
    assert len(fd) > 50
    np.testing.assert_array_equal(fs, fd)
    np.testing.assert_allclose(vs, vd, rtol=0, atol=0)


def test_giga_seam_fuzz_random_fields():
    """Random smooth-ish volumes put arbitrary crossing configurations ON
    the slab planes (including vertices exactly on seam edges and cells
    straddling two slabs) — the merged mesh must still equal the
    single-dispatch mesh exactly."""
    rng = np.random.default_rng(7)
    n = 24
    s = 2.0 / (n - 1)
    for trial in range(4):
        # band-limited noise: random coarse grid, trilinearly upsampled,
        # plus a bias so both signs occur; crossings land everywhere
        coarse = rng.standard_normal((7, 7, 7)).astype(np.float32)
        ax = np.linspace(0, 6, n)
        ix = np.minimum(ax.astype(np.int32), 5)
        fx = (ax - ix).astype(np.float32)

        def lerp(a, idx, frac, axis):
            lo = np.take(a, idx, axis=axis)
            hi = np.take(a, np.minimum(idx + 1, 6), axis=axis)
            sh = [1, 1, 1]
            sh[axis] = -1
            return lo + (hi - lo) * frac.reshape(sh)

        vol = lerp(lerp(lerp(coarse, ix, fx, 0), ix, fx, 1), ix, fx, 2)
        ref = marching_cubes_device(jnp.asarray(vol), 0.0, (s,) * 3,
                                    (-1.0,) * 3, wire="exact")
        giga = extract_mesh_giga(
            None, None, n, slab=8, wire="exact",
            vol_fn=lambda x0, sx: jnp.asarray(vol[x0:x0 + sx]),
        )
        assert len(ref[1]) > 0
        _assert_same_mesh(giga, ref)


def test_giga_vertex_cap_overflow_retries_with_halved_slabs(monkeypatch,
                                                            capsys):
    """A slab overflowing the per-dispatch 2^24-vertex cap triggers an
    automatic retry at half the slab size (result identical)."""
    from sdf_representation_tpu.ops import giga_extract as ge

    model, params = _model_and_params()
    n = 40
    vol = _dense_volume(model, params, n)
    s = 2.0 / (n - 1)
    ref = marching_cubes_device(jnp.asarray(vol), 0.0, (s,) * 3,
                                (-1.0,) * 3, wire="exact")

    real = ge.marching_tets_device

    def fussy(v, level=0.0):
        if v.shape[0] > 9:  # pretend big slabs overflow the packed word
            raise ValueError("vertices overflow the packed core-word budget")
        return real(v, level)

    monkeypatch.setattr(ge, "marching_tets_device", fussy)
    giga = ge.extract_mesh_giga(
        None, None, n, slab=16, wire="exact",
        vol_fn=lambda x0, sx: jnp.asarray(vol[x0:x0 + sx]),
    )
    assert "retrying with slab=8" in capsys.readouterr().out
    _assert_same_mesh(giga, ref)


def test_giga_empty_level_set():
    model, params = _model_and_params()
    verts, faces = extract_mesh_giga(
        None, None, 24, slab=8,
        vol_fn=lambda x0, sx: jnp.ones((sx, 24, 24), jnp.float32),
    )
    assert len(verts) == 0 and len(faces) == 0
