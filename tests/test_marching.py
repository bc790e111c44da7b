"""Marching-tetrahedra isosurface tests against analytic fields."""

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
