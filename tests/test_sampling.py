"""Sampler tests: label correctness vs analytic SDFs, distribution shape,
2D polygon pipeline, distributed resume log, mismatch augmentation."""

import os

import numpy as np
import pandas as pd
import pytest

from sdf_representation_tpu.geometry.mesh_io import save_mesh
from sdf_representation_tpu.geometry.primitives import box_sdf, make_box, make_icosphere
from sdf_representation_tpu.sampling import (
    compute_min_max,
    generate_analytical_sphere,
    generate_points_circle,
    generate_signed_distance_2D_msh,
    generate_signed_distance_data,
    polygon_sdf,
    write_signed_distance_distributed,
    write_signed_distance_mismatch,
)
from sdf_representation_tpu.sampling.sampler import (
    sample_narrow_band_points,
    sample_surface_points,
)


def test_surface_points_on_surface():
    mesh = make_box()
    rng = np.random.default_rng(0)
    pts = sample_surface_points(mesh, 5, rng)
    assert pts.shape == (len(mesh.faces) * 5, 3)
    np.testing.assert_allclose(np.abs(box_sdf(pts)), 0.0, atol=1e-12)


def test_narrow_band_within_width():
    mesh = make_box()
    rng = np.random.default_rng(0)
    pts = sample_narrow_band_points(mesh, 5, 3, 0.07, rng)
    # zip-truncation quirk: count = min(5, 3) per triangle
    assert pts.shape == (len(mesh.faces) * 3, 3)
    assert np.abs(box_sdf(pts)).max() <= 0.07 + 1e-9


def test_generate_signed_distance_data_labels():
    mesh = make_box()
    df_u, df_s, df_n = generate_signed_distance_data(mesh, 500, 2, 2, 0.05)
    assert list(df_u.columns) == ["x", "y", "z", "S", "nx", "ny", "nz"]
    pts = df_u[["x", "y", "z"]].to_numpy()
    np.testing.assert_allclose(df_u["S"].to_numpy(), box_sdf(pts), atol=1e-6)
    np.testing.assert_allclose(df_s["S"].to_numpy(), 0.0, atol=1e-6)
    assert np.abs(df_n["S"]).max() <= 0.05 + 1e-6


def test_sampling_deterministic():
    mesh = make_box()
    a = generate_signed_distance_data(mesh, 100, 1, 1)[0]
    b = generate_signed_distance_data(mesh, 100, 1, 1)[0]
    pd.testing.assert_frame_equal(a, b)


def test_analytical_sphere(tmp_path):
    df_u, df_n, df_s = generate_analytical_sphere(500, 200, 300, str(tmp_path))
    r = np.linalg.norm(df_s[["x", "y", "z"]].to_numpy(), axis=1)
    np.testing.assert_allclose(r, 0.5, atol=1e-9)
    np.testing.assert_allclose(df_s["S"], 0.0, atol=1e-9)
    # normals are unit
    nn = np.linalg.norm(df_u[["nx", "ny", "nz"]].to_numpy(), axis=1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-9)
    assert (tmp_path / "uniform.csv").exists()
    # 10% extra axis points
    assert len(df_s) == 300 + 6 * 30


def test_circle_2d(tmp_path):
    df_u, df_n, df_s = generate_points_circle(400, 200, 100, 0.1, str(tmp_path))
    radius = np.sqrt(2 / np.pi)
    r = np.linalg.norm(df_s[["x", "y"]].to_numpy(), axis=1)
    np.testing.assert_allclose(r, radius, atol=1e-9)
    np.testing.assert_allclose(df_u["z"], 0.0)
    expected = np.linalg.norm(df_u[["x", "y"]].to_numpy(), axis=1) - radius
    np.testing.assert_allclose(df_u["S"], expected, atol=1e-12)


# ---- 2D polygon -----------------------------------------------------------

SQUARE = np.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]])


def square_sdf(p):
    q = np.abs(p) - 0.5
    outside = np.linalg.norm(np.maximum(q, 0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0)
    return outside + inside


def test_polygon_sdf_square():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (500, 2))
    sdf, normals = polygon_sdf(pts, SQUARE)
    np.testing.assert_allclose(sdf, square_sdf(pts), atol=1e-12)
    nn = np.linalg.norm(normals, axis=1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-9)


def test_polygon_sdf_concave():
    """L-shape: the reference's 2-NN midpoint heuristic breaks on concave
    polygons; the exact all-segments version must not."""
    L = np.array([[0, 0], [1, 0], [1, 0.5], [0.5, 0.5], [0.5, 1], [0, 1]])
    # point in the notch (outside), close to the inner corner
    sdf, _ = polygon_sdf(np.array([[0.75, 0.75], [0.25, 0.25]]), L)
    assert sdf[0] > 0  # notch is outside
    assert sdf[0] == pytest.approx(0.25, abs=1e-9)
    assert sdf[1] < 0  # inside the L


def test_2d_msh_pipeline(tmp_path):
    from sdf_representation_tpu.geometry.msh_io import (
        extract_polygon_from_msh,
        write_msh_polygon,
    )

    msh = str(tmp_path / "square.msh")
    write_msh_polygon(msh, SQUARE)
    poly = extract_polygon_from_msh(msh)
    assert len(poly) == 5  # closed
    np.testing.assert_allclose(poly[:4], SQUARE)

    df_u, df_n, df_s = generate_signed_distance_2D_msh(
        300, 100, 200, 0.05, msh, str(tmp_path)
    )
    np.testing.assert_allclose(
        df_u["S"], square_sdf(df_u[["x", "y"]].to_numpy()), atol=1e-9
    )
    np.testing.assert_allclose(df_s["S"], 0.0, atol=1e-9)
    assert np.abs(df_n["S"]).max() <= 0.05 + 1e-6
    assert (tmp_path / "narrow.csv").exists()


# ---- distributed ----------------------------------------------------------

def test_distributed_sampling_resume(tmp_path):
    geo = tmp_path / "shards"
    geo.mkdir()
    for i in range(3):
        save_mesh(make_icosphere(0, radius=0.3 + 0.1 * i), str(geo / f"part{i}.ply"))

    out = tmp_path / "out"
    csv = write_signed_distance_distributed(str(geo), str(out))
    n_first = len(pd.read_csv(csv))
    log = (out / "processed_files.log").read_text().strip().splitlines()
    assert len(log) == 3

    # resume: no duplicates appended
    write_signed_distance_distributed(str(geo), str(out))
    assert len(pd.read_csv(csv)) == n_first

    # new shard appears -> only it is processed
    save_mesh(make_icosphere(0, radius=0.7), str(geo / "part3.ply"))
    write_signed_distance_distributed(str(geo), str(out))
    assert len(pd.read_csv(csv)) > n_first
    assert len((out / "processed_files.log").read_text().strip().splitlines()) == 4


def test_compute_min_max_order(tmp_path):
    """Regression: the reference returned (max, min) while the caller
    unpacked (min, max) (data_generator.py:390 vs :702)."""
    geo = tmp_path / "g"
    geo.mkdir()
    save_mesh(make_box(half_extents=(0.2, 0.3, 0.4)), str(geo / "b.ply"))
    lo, hi = compute_min_max(str(geo))
    assert lo == pytest.approx(-0.4)
    assert hi == pytest.approx(0.4)
    assert lo < hi
    # cached second call
    lo2, hi2 = compute_min_max(str(geo))
    assert (lo2, hi2) == (lo, hi)


def test_mismatch_write(tmp_path):
    mesh = make_box()
    pts = np.random.default_rng(0).uniform(-1, 1, (50, 3))
    path = write_signed_distance_mismatch(pts, mesh, str(tmp_path))
    df = pd.read_csv(path)
    np.testing.assert_allclose(df["S"], box_sdf(pts), atol=1e-6)


def test_generate_occupancy_box():
    """Occupancy grid sign agrees with the analytic box SDF everywhere off
    the surface (cf. reference data_generator.py:307-350)."""
    from sdf_representation_tpu.geometry.primitives import box_sdf, make_box
    from sdf_representation_tpu.sampling.sampler import generate_occupancy

    n = 16
    df = generate_occupancy(n, make_box((0.4, 0.3, 0.2)))
    assert list(df.columns) == ["x", "y", "z", "occupancy"]
    assert len(df) == n**3
    pts = df[["x", "y", "z"]].to_numpy()
    analytic = box_sdf(pts, (0.4, 0.3, 0.2))
    occ = df["occupancy"].to_numpy()
    off_surface = np.abs(analytic) > 1e-6
    assert np.array_equal(
        occ[off_surface] < 0, analytic[off_surface] < 0
    )
    # grid is the reference linspace(-1,1,n) 'ij' ordering
    ax = np.linspace(-1, 1, n)
    assert np.allclose(pts[:n, 2], ax)  # z fastest
    assert np.allclose(pts[::n * n, 0], ax)  # x slowest
