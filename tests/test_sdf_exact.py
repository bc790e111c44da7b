"""Exact signed-distance tests against analytic oracles (box, sphere, torus)."""

import numpy as np
import pytest

from sdf_representation_tpu.geometry.primitives import (
    make_box,
    box_sdf,
    make_icosphere,
    make_torus,
    torus_sdf,
)
from sdf_representation_tpu.ops.sdf_exact import (
    signed_distance,
    winding_number,
    closest_point_on_triangles,
)


def test_box_signed_distance_matches_analytic():
    mesh = make_box()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (2000, 3))
    sdf, normals = signed_distance(pts, mesh, point_chunk=512, tri_chunk=16)
    expected = box_sdf(pts)
    np.testing.assert_allclose(sdf, expected, atol=1e-6)
    assert normals.shape == (2000, 3)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-6)


def test_box_normals_outside_point_away():
    mesh = make_box()
    pts = np.array([[0.9, 0.0, 0.0], [0.0, -0.9, 0.0], [0.0, 0.0, 0.25]])
    sdf, normals = signed_distance(pts, mesh, point_chunk=8, tri_chunk=16)
    np.testing.assert_allclose(normals[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(normals[1], [0, -1, 0], atol=1e-6)
    # inside point: gradient points toward nearest face (+z here, dist 0.25)
    assert sdf[2] == pytest.approx(-0.25, abs=1e-6)
    np.testing.assert_allclose(normals[2], [0, 0, 1], atol=1e-6)


def test_sphere_signed_distance():
    mesh = make_icosphere(subdivisions=3, radius=0.5)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.9, 0.9, (1000, 3))
    sdf, _ = signed_distance(pts, mesh, point_chunk=512, tri_chunk=256)
    expected = np.linalg.norm(pts, axis=1) - 0.5
    # icosphere is a polyhedral approximation: tolerance ~ facet sag
    np.testing.assert_allclose(sdf, expected, atol=5e-3)
    # signs must agree except within the sag band
    far = np.abs(expected) > 5e-3
    assert np.all(np.sign(sdf[far]) == np.sign(expected[far]))


def test_torus_signed_distance():
    mesh = make_torus()
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, (500, 3))
    sdf, _ = signed_distance(pts, mesh, point_chunk=512, tri_chunk=512)
    expected = torus_sdf(pts)
    np.testing.assert_allclose(sdf, expected, atol=2e-2)


def test_winding_number_inside_outside():
    mesh = make_box()
    pts = np.array(
        [[0, 0, 0], [0.49, 0.49, 0.49], [0.51, 0, 0], [2, 2, 2], [0, 0, -0.7]]
    )
    w = winding_number(pts, mesh, point_chunk=8, tri_chunk=16)
    np.testing.assert_allclose(w[:2], 1.0, atol=1e-4)
    np.testing.assert_allclose(w[2:], 0.0, atol=1e-4)


def test_closest_point_oracle():
    """Verify the Eberly implementation against dense barycentric sampling."""
    rng = np.random.default_rng(3)
    tri = rng.normal(size=(50, 3, 3))
    pts = rng.normal(size=(50, 3)) * 2
    closest = closest_point_on_triangles(pts, tri)
    d_exact = np.linalg.norm(pts - closest, axis=1)

    # brute-force: dense (s, t) grid per triangle
    s = np.linspace(0, 1, 200)
    t = np.linspace(0, 1, 200)
    ss, tt = np.meshgrid(s, t)
    mask = ss + tt <= 1.0
    ss, tt = ss[mask], tt[mask]
    for i in range(50):
        v0, v1, v2 = tri[i]
        grid = v0 + ss[:, None] * (v1 - v0) + tt[:, None] * (v2 - v0)
        d_brute = np.linalg.norm(grid - pts[i], axis=1).min()
        assert d_exact[i] <= d_brute + 1e-4


def test_large_point_count_chunking():
    """Point counts that do not divide the chunk size are padded correctly."""
    mesh = make_box()
    rng = np.random.default_rng(4)
    pts = rng.uniform(-1, 1, (1037, 3))
    sdf, _ = signed_distance(pts, mesh, point_chunk=256, tri_chunk=16)
    np.testing.assert_allclose(sdf, box_sdf(pts), atol=1e-6)


def test_on_surface_points_get_face_normals():
    mesh = make_box()
    pts = np.array([[0.5, 0.1, 0.2], [-0.5, -0.3, 0.1]])  # exactly on +x/-x faces
    sdf, normals = signed_distance(pts, mesh, point_chunk=8, tri_chunk=16)
    np.testing.assert_allclose(np.abs(sdf), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.abs(normals[:, 0]), 1.0, atol=1e-6)
