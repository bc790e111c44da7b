"""Marching-tetrahedra isosurface tests against analytic fields."""

import os

import numpy as np
import pytest

from sdf_representation_tpu.ops.marching import marching_cubes
from sdf_representation_tpu.geometry.mesh_io import Mesh


def sphere_volume(n, radius=0.5):
    ax = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(x**2 + y**2 + z**2) - radius


def test_sphere_surface_extraction():
    n = 48
    vol = sphere_volume(n)
    spacing = 2.0 / (n - 1)
    verts, faces = marching_cubes(vol, 0.0, (spacing,) * 3, (-1, -1, -1))
    assert len(verts) > 100 and len(faces) > 100
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii, 0.5, atol=spacing)


def test_mesh_is_closed():
    """Every edge of the extracted surface is shared by exactly two faces."""
    n = 24
    vol = sphere_volume(n)
    _, faces = marching_cubes(vol, 0.0)
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)


def test_orientation_outward():
    """Normals point toward positive field values (outside)."""
    n = 32
    vol = sphere_volume(n)
    spacing = 2.0 / (n - 1)
    verts, faces = marching_cubes(vol, 0.0, (spacing,) * 3, (-1, -1, -1))
    mesh = Mesh(verts, faces)
    fn = mesh.face_normals()
    centers = mesh.triangles.mean(axis=1)
    dots = np.einsum("ij,ij->i", fn, centers / np.linalg.norm(centers, axis=1, keepdims=True))
    assert (dots > 0).mean() > 0.99


def test_volume_estimate():
    """Enclosed volume approximates the analytic sphere volume."""
    n = 48
    vol = sphere_volume(n)
    spacing = 2.0 / (n - 1)
    verts, faces = marching_cubes(vol, 0.0, (spacing,) * 3, (-1, -1, -1))
    v = Mesh(verts, faces).volume
    expected = 4.0 / 3.0 * np.pi * 0.5**3
    assert v == pytest.approx(expected, rel=0.02)


def test_nonzero_level():
    n = 32
    vol = sphere_volume(n)
    spacing = 2.0 / (n - 1)
    verts, _ = marching_cubes(vol, 0.2, (spacing,) * 3, (-1, -1, -1))
    np.testing.assert_allclose(np.linalg.norm(verts, axis=1), 0.7, atol=spacing)


def test_empty_level_set():
    vol = sphere_volume(16) + 10.0
    verts, faces = marching_cubes(vol, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_grid_world_mapping():
    """origin/spacing map index space to world space correctly."""
    n = 16
    ax = np.linspace(0, 3, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = x - 1.5  # plane x = 1.5
    spacing = 3.0 / (n - 1)
    verts, _ = marching_cubes(vol, 0.0, (spacing,) * 3, (0, 0, 0))
    np.testing.assert_allclose(verts[:, 0], 1.5, atol=1e-9)


# ---------------------------------------------------------------------------
# Device path (ops/marching_device): full on-device extraction
# ---------------------------------------------------------------------------

def _canon_soup(verts, faces):
    """Canonicalize a mesh to a sorted triangle soup for exact comparison
    (device and host paths order vertices/faces differently)."""
    tris = verts[faces]  # (F, 3, 3)
    # sort the 3 vertices within each triangle lexicographically
    flat = tris.reshape(len(tris), 3, 3)
    order = np.lexsort((flat[:, :, 2], flat[:, :, 1], flat[:, :, 0]), axis=1)
    flat = np.take_along_axis(flat, order[:, :, None], axis=1)
    arr = flat.reshape(len(tris), 9)
    return arr[np.lexsort(arr.T[::-1])]


def _device_and_host(vol, level=0.0, spacing=(1.0, 1.0, 1.0),
                     origin=(0.0, 0.0, 0.0)):
    import jax.numpy as jnp

    vh, fh = marching_cubes(np.asarray(vol, np.float32), level, spacing, origin)
    vd, fd = marching_cubes(jnp.asarray(vol, jnp.float32), level, spacing, origin)
    return (vh, fh), (vd, fd)


def test_device_matches_host_sphere():
    """Device extraction produces the EXACT same triangle soup as the host
    path (same tet decomposition, case tables, f32 interpolation)."""
    n = 40
    vol = sphere_volume(n)
    spacing = 2.0 / (n - 1)
    (vh, fh), (vd, fd) = _device_and_host(vol, 0.0, (spacing,) * 3,
                                          (-1, -1, -1))
    assert len(fh) == len(fd) and len(vh) == len(vd)
    np.testing.assert_array_equal(_canon_soup(vh, fh), _canon_soup(vd, fd))


def test_device_matches_host_noncubic_and_level():
    rng = np.random.default_rng(3)
    vol = rng.normal(size=(13, 21, 9)).astype(np.float32)
    # smooth it so the surface is not pathological
    for ax in range(3):
        vol = (np.roll(vol, 1, ax) + vol + np.roll(vol, -1, ax)) / 3
    (vh, fh), (vd, fd) = _device_and_host(vol, 0.1)
    assert len(fh) > 0
    np.testing.assert_array_equal(_canon_soup(vh, fh), _canon_soup(vd, fd))


def test_device_matches_host_exact_zero_values():
    """Field values EXACTLY at the level (plane through grid points): the
    <= predicate must agree between prefilter, live edges and emission on
    both paths."""
    n = 12
    ax = np.arange(n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = x - 5.0  # zero exactly on the x=5 grid plane
    (vh, fh), (vd, fd) = _device_and_host(vol, 0.0)
    assert len(fh) > 0
    np.testing.assert_array_equal(_canon_soup(vh, fh), _canon_soup(vd, fd))
    # all vertices on the plane
    np.testing.assert_allclose(vd[:, 0], 5.0, atol=0)


def test_device_empty_level_set():
    import jax.numpy as jnp

    vol = jnp.asarray(sphere_volume(16) + 10.0, jnp.float32)
    verts, faces = marching_cubes(vol, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_device_budget_growth():
    """A deliberately tiny initial budget must grow transparently and still
    produce the right mesh."""
    import jax.numpy as jnp
    from sdf_representation_tpu.ops import marching_device as md

    n = 32
    vol = sphere_volume(n)
    md._BUDGET_CACHE.pop((n, n, n), None)
    md._BUDGET_CACHE[(n, n, n)] = (8, 8, 8, 8, 8)  # absurdly small
    spacing = 2.0 / (n - 1)
    vd, fd = marching_cubes(jnp.asarray(vol, jnp.float32), 0.0,
                            (spacing,) * 3, (-1, -1, -1))
    vh, fh = marching_cubes(vol, 0.0, (spacing,) * 3, (-1, -1, -1))
    np.testing.assert_array_equal(_canon_soup(vh, fh), _canon_soup(vd, fd))
    # settled budgets cached for the next call
    b, c, m, v, t = md._BUDGET_CACHE[(n, n, n)]
    assert v >= len(vd) and t >= len(fd)


def test_device_closed_and_oriented():
    import jax.numpy as jnp

    n = 28
    vol = jnp.asarray(sphere_volume(n), jnp.float32)
    spacing = 2.0 / (n - 1)
    verts, faces = marching_cubes(vol, 0.0, (spacing,) * 3, (-1, -1, -1))
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)
    mesh = Mesh(verts, faces)
    fn = mesh.face_normals()
    centers = mesh.triangles.mean(axis=1)
    dots = np.einsum("ij,ij->i", fn,
                     centers / np.linalg.norm(centers, axis=1, keepdims=True))
    assert (dots > 0).mean() > 0.99


def _packed_vs_unpacked(vol, level=0.0):
    import jax.numpy as jnp

    from sdf_representation_tpu.ops.marching_device import (
        marching_tets_device,
        marching_tets_device_packed,
    )

    volj = jnp.asarray(vol, jnp.float32)
    vs_u, t_u, f_u = marching_tets_device(volj, level)
    vs_p, t_p, f_p, wire = marching_tets_device_packed(volj, level)
    return (vs_u, t_u, f_u), (vs_p, t_p, f_p), wire


def test_packed_wire_topology_identical():
    """The packed wire rebuilds EXACTLY the same vertex ids and faces as
    the device emission (topology is a pure function of the sign bits);
    t differs only by the u16 quantum."""
    n = 40
    vol = sphere_volume(n)
    (vs_u, t_u, f_u), (vs_p, t_p, f_p), wire = _packed_vs_unpacked(vol)
    np.testing.assert_array_equal(vs_p, vs_u)
    np.testing.assert_array_equal(f_p, f_u)
    np.testing.assert_allclose(t_p, t_u, atol=1.0 / 65535)
    # the wire really is small: < 1/4 of the unpacked payload
    unpacked = vs_u.size * 4 + t_u.size * 4 + f_u.size * 4
    assert wire < unpacked / 4, (wire, unpacked)


def test_packed_wire_noncubic_and_level():
    rng = np.random.default_rng(5)
    vol = rng.normal(size=(13, 21, 9)).astype(np.float32)
    for ax in range(3):
        vol = (np.roll(vol, 1, ax) + vol + np.roll(vol, -1, ax)) / 3
    (vs_u, t_u, f_u), (vs_p, t_p, f_p), _ = _packed_vs_unpacked(vol, 0.1)
    np.testing.assert_array_equal(vs_p, vs_u)
    np.testing.assert_array_equal(f_p, f_u)
    np.testing.assert_allclose(t_p, t_u, atol=1.0 / 65535)


def test_packed_wire_frontend_mesh_quality():
    """marching_cubes_device(wire='packed') produces a mesh equal to the
    exact wire up to the t quantum in world coordinates."""
    import jax.numpy as jnp

    from sdf_representation_tpu.ops.marching_device import (
        marching_cubes_device,
    )

    n = 32
    vol = sphere_volume(n)
    sp = 2.0 / (n - 1)
    volj = jnp.asarray(vol, jnp.float32)
    ve, fe = marching_cubes_device(volj, 0.0, (sp,) * 3, (-1,) * 3)
    vp, fp = marching_cubes_device(volj, 0.0, (sp,) * 3, (-1,) * 3,
                                   wire="packed")
    np.testing.assert_array_equal(fp, fe)
    np.testing.assert_allclose(vp, ve, atol=sp / 65535 + 1e-12)


def test_packed_wire_empty_level_set():
    vol = np.full((16, 16, 16), 2.0, np.float32)
    (_, _, f_u), (vs_p, t_p, f_p), _ = _packed_vs_unpacked(vol)
    assert len(f_p) == 0 and len(vs_p) == 0 and len(f_u) == 0


def test_compact_mode_scatter_matches_host():
    """The legacy input-sized scatter compaction (MARCH_COMPACT=scatter,
    kept for hardware A/B against the round-4 packed-word enumeration)
    must extract the exact same triangle soup as the host path. Runs in a
    subprocess because the mode is bound at module import."""
    import subprocess
    import sys

    code = r"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from sdf_representation_tpu.ops import marching_device as md
assert md._COMPACT_MODE == "scatter", md._COMPACT_MODE
from sdf_representation_tpu.ops.marching import marching_cubes
ax = np.linspace(-1, 1, 24)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
vol = (np.sqrt(x**2 + y**2 + z**2) - 0.5).astype(np.float32)
vh, fh = marching_cubes(vol, 0.0)
vd, fd = marching_cubes(jnp.asarray(vol), 0.0)
assert len(fh) == len(fd) and len(vh) == len(vd), (len(fh), len(fd))
def canon(verts, faces):
    tris = verts[faces].reshape(len(faces), 3, 3)
    order = np.lexsort((tris[:, :, 2], tris[:, :, 1], tris[:, :, 0]), axis=1)
    arr = np.take_along_axis(tris, order[:, :, None], axis=1).reshape(-1, 9)
    return arr[np.lexsort(arr.T[::-1])]
np.testing.assert_array_equal(canon(vh, fh), canon(vd, fd))
print("SCATTER_MODE_OK")
"""
    env = dict(os.environ, MARCH_COMPACT="scatter", JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=600)
    assert "SCATTER_MODE_OK" in r.stdout, r.stdout + r.stderr


def test_wire_decode_native_matches_numpy(native_build, monkeypatch):
    """The C++ packed-wire decoder (native/src/wire_decode.cpp) is
    np.array_equal with the numpy reference decode — vertex ids, vertex
    ORDER, faces, face order — across cubic / non-cubic / boundary-straddle
    shapes, random smoothed-noise fields, and level != 0. The C++ pass is
    what production runs (the numpy decode dominated single-core field->mesh
    wall-clock ~73:1 over device work at 512^3)."""
    import jax.numpy as jnp

    from sdf_representation_tpu.ops import marching_device as md
    from sdf_representation_tpu.ops.marching_device import (
        marching_tets_device_packed,
    )

    monkeypatch.setenv(
        "SDF_WIRE_LIB", os.path.join(native_build, "libsdfnet_c.so")
    )
    rng_l = np.random.default_rng(11)
    cases = [((40, 40, 40), 0.0), ((13, 21, 9), 0.1), ((24, 33, 16), -0.05),
             ((8, 8, 8), 0.0)]
    try:
        for shape, level in cases:
            vol = rng_l.normal(size=shape).astype(np.float32)
            for ax in range(3):
                vol = (np.roll(vol, 1, ax) + vol + np.roll(vol, -1, ax)) / 3
            volj = jnp.asarray(vol)

            monkeypatch.setenv("SDF_WIRE_DECODE", "numpy")
            md._WIRE_LIB = None
            vs_n, t_n, f_n, _ = marching_tets_device_packed(volj, level)

            monkeypatch.setenv("SDF_WIRE_DECODE", "native")
            md._WIRE_LIB = None
            assert md._get_wire_lib() is not None, "native decoder not loaded"
            # outputs must be identical at ANY thread count (contiguous row
            # ranges + exact cvbase offsets make the parallelism invisible)
            for n_threads in ("1", "5"):
                monkeypatch.setenv("SDF_WIRE_THREADS", n_threads)
                vs_c, t_c, f_c, _ = marching_tets_device_packed(volj, level)
                np.testing.assert_array_equal(vs_c, vs_n)
                np.testing.assert_array_equal(f_c, f_n)
                np.testing.assert_array_equal(t_c, t_n)
            assert len(vs_n) > 0 and len(f_n) > 0, (shape, level)
    finally:
        # later tests must re-resolve the decoder against the default path
        md._WIRE_LIB = None
