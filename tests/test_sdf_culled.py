"""Culled + fast-winding exact SDF vs the all-pairs oracle.

The culling is conservative (sphere lower bounds), so distances must match
the dense path exactly; only the far-field winding is approximate, and the
tests bound its effect on sign and on the returned values."""

import numpy as np
import pytest

from sdf_representation_tpu.geometry.primitives import (
    box_sdf,
    make_box,
    make_icosphere,
    make_torus,
)
from sdf_representation_tpu.ops.sdf_culled import (
    _cull,
    _morton_order,
    signed_distance_culled,
)
from sdf_representation_tpu.ops.sdf_exact import signed_distance


def test_matches_allpairs_on_subdivided_icosphere():
    # 20k faces, enough chunks for real culling at tri_chunk=256
    mesh = make_icosphere(subdivisions=4, radius=0.6)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (4096, 3))
    ref, ref_n = signed_distance(pts, mesh, point_chunk=4096, tri_chunk=256)
    got, got_n = signed_distance_culled(
        pts, mesh, point_chunk=512, tri_chunk=256
    )
    # exact distances, approximate far-field sign: VERDICT bar is <=1e-4
    np.testing.assert_allclose(got, ref, atol=1e-4)
    assert np.all(np.sign(got) == np.sign(ref))
    # same winner => same gradient (up to f32 noise); allow equal-distance
    # ties to pick different but equally valid normals off the surface
    dots = np.einsum("ij,ij->i", got_n, ref_n)
    assert np.mean(dots > 0.999) > 0.99


def test_torus_genus_and_inside_far_field():
    """Deep-inside / deep-outside points exercise the pure-dipole path."""
    mesh = make_torus()
    # points on the torus axis are far from every chunk -> outside, and
    # points in the tube core are inside
    axis_pts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.9], [0.9, 0.9, 0.9]])
    core_pts = np.array([[0.6, 0.0, 0.0], [0.0, 0.6, 0.0]])
    pts = np.vstack([axis_pts, core_pts])
    sdf, _ = signed_distance_culled(pts, mesh, point_chunk=256, tri_chunk=128)
    assert np.all(sdf[:3] > 0)
    assert np.all(sdf[3:] < 0)


def test_box_analytic_with_culling():
    mesh = make_box()
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (2000, 3))
    sdf, normals = signed_distance_culled(
        pts, mesh, point_chunk=256, tri_chunk=4
    )
    np.testing.assert_allclose(sdf, box_sdf(pts), atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-6)


def test_grid_ordered_points():
    """Grid queries (the post_process pattern) survive sort/unsort."""
    mesh = make_icosphere(subdivisions=3, radius=0.5)
    n = 24
    ax = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    ref, _ = signed_distance(pts, mesh, point_chunk=8192, tri_chunk=256)
    got, _ = signed_distance_culled(pts, mesh, point_chunk=2048, tri_chunk=256)
    np.testing.assert_allclose(got, ref, atol=1e-4)
    assert np.all(np.sign(got) == np.sign(ref))


def test_cull_is_conservative():
    """Brute-force check: every point's nearest chunk (by sphere lower
    bound) is kept for its block — the winner can never be culled."""
    rng = np.random.default_rng(2)
    chunk_c = rng.uniform(-1, 1, (40, 3))
    chunk_r = rng.uniform(0.01, 0.2, 40)
    P_blocks = rng.uniform(-1, 1, (4, 64, 3)).astype(np.float32)
    beta = 2.0
    UB = np.full(P_blocks.shape[:2], np.inf, np.float32)
    kd, kw = _cull(P_blocks, UB, chunk_c, chunk_r, beta)
    for b in range(len(P_blocks)):
        kept = set(np.nonzero(kd[b])[0].tolist())
        d = np.linalg.norm(
            P_blocks[b][:, None, :] - chunk_c[None], axis=2
        )  # (M, C)
        lb = d - chunk_r[None, :]
        ub = (d + chunk_r[None, :]).min(axis=1)  # per-point upper bound
        must_keep = np.unique(np.nonzero(lb <= ub[:, None])[1])
        assert set(must_keep.tolist()) <= kept
        # every beta-near chunk must be in the exact-winding set
        wind_near = np.unique(np.nonzero(d <= beta * chunk_r[None, :])[1])
        assert set(wind_near.tolist()) <= set(np.nonzero(kw[b])[0].tolist())


def test_morton_order_locality():
    pts = np.random.default_rng(3).uniform(-1, 1, (1000, 3))
    order = _morton_order(pts)
    assert sorted(order.tolist()) == list(range(1000))
    # consecutive Morton points are closer on average than random pairs
    sorted_pts = pts[order]
    consec = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1).mean()
    rand = np.linalg.norm(pts[:-1] - pts[1:], axis=1).mean()
    assert consec < rand * 0.5


def test_coarse_upper_bound_exactness():
    """The coarse-field upper bound must tighten culling WITHOUT changing a
    single distance (conservative by the triangle inequality)."""
    mesh = make_icosphere(subdivisions=4, radius=0.6)
    rng = np.random.default_rng(5)
    pts = rng.uniform(-1, 1, (4096, 3))
    ref, _ = signed_distance_culled(
        pts, mesh, point_chunk=512, tri_chunk=256, coarse_bound=False
    )
    got, _ = signed_distance_culled(
        pts, mesh, point_chunk=512, tri_chunk=256, coarse_bound=True
    )
    np.testing.assert_array_equal(got, ref)


def test_coarse_upper_bound_is_valid():
    """ub >= true distance for every query point."""
    import jax.numpy as jnp

    from sdf_representation_tpu.ops.sdf_culled import _coarse_upper_bound
    from sdf_representation_tpu.ops.sdf_exact import _triangle_tables

    mesh = make_icosphere(subdivisions=3, radius=0.5)
    rng = np.random.default_rng(6)
    pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
    tables_np, _ = _triangle_tables(mesh.vertices, mesh.faces, 128)
    tables = {k: jnp.asarray(v) for k, v in tables_np.items()}
    ub = _coarse_upper_bound(pts, tables, 128)
    true, _ = signed_distance(pts, mesh)
    assert np.all(ub >= np.abs(true) - 1e-5)


def test_sphere_coarse_bound_is_valid():
    """The O(C)-per-node sphere variant (used past _COARSE_EXACT_MAX_PAIRS,
    i.e. 10M+ face meshes) must also be a true upper bound."""
    from sdf_representation_tpu.ops.sdf_culled import (
        _chunk_geometry,
        _coarse_upper_bound_spheres,
    )

    mesh = make_icosphere(subdivisions=3, radius=0.5)
    rng = np.random.default_rng(8)
    pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
    centers, radii, _, _ = _chunk_geometry(mesh.vertices, mesh.faces, 128)
    ub = _coarse_upper_bound_spheres(pts, centers, radii)
    true, _ = signed_distance(pts, mesh)
    assert np.all(ub >= np.abs(true) - 1e-5)


def test_sphere_coarse_bound_distances_stay_exact(monkeypatch):
    """Force the huge-mesh dispatch branch and check end-to-end distances
    still match the dense oracle exactly (the bound only loosens culling,
    never correctness)."""
    from sdf_representation_tpu.ops import sdf_culled

    monkeypatch.setattr(sdf_culled, "_COARSE_EXACT_MAX_PAIRS", 0.0)
    mesh = make_icosphere(subdivisions=4, radius=0.6)
    rng = np.random.default_rng(9)
    pts = rng.uniform(-1, 1, (2048, 3))
    ref, _ = signed_distance(pts, mesh, point_chunk=2048, tri_chunk=256)
    got, _ = signed_distance_culled(pts, mesh, point_chunk=512, tri_chunk=256)
    np.testing.assert_allclose(got, ref, atol=1e-4)
    assert np.all(np.sign(got) == np.sign(ref))


def test_large_coordinate_scale_exactness():
    """Culling slacks are scene-scale-relative: a mesh with coordinates in
    the thousands must still return exactly the dense-path distances (f32
    rounding there is ~1e-4 absolute, which would defeat unit-scale
    slacks)."""
    mesh = make_icosphere(subdivisions=3, radius=500.0)
    rng = np.random.default_rng(7)
    pts = rng.uniform(-1000, 1000, (2048, 3))
    ref, _ = signed_distance(pts, mesh, point_chunk=2048, tri_chunk=128)
    got, _ = signed_distance_culled(pts, mesh, point_chunk=256, tri_chunk=128)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-3)
    assert np.all(np.sign(got) == np.sign(ref))


def test_streamed_slabs_match_culled():
    """Host-streamed face slabs (meshes past HBM residency) must reproduce
    the resident culled path: same distances, same signs, even with the
    mesh split into many slabs and the running-min-tightened bounds."""
    from sdf_representation_tpu.ops.sdf_culled import signed_distance_streamed

    mesh = make_icosphere(subdivisions=4, radius=0.6)  # 20480 faces
    rng = np.random.default_rng(10)
    pts = rng.uniform(-1, 1, (2048, 3))
    ref, ref_n = signed_distance_culled(
        pts, mesh, point_chunk=512, tri_chunk=256
    )
    got, got_n = signed_distance_streamed(
        pts, mesh, point_chunk=512, tri_chunk=256, slab_faces=4096  # 5 slabs
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert np.all(np.sign(got) == np.sign(ref))
    dots = np.einsum("ij,ij->i", got_n, ref_n)
    assert np.mean(dots > 0.999) > 0.99


def test_fine_distance_granularity_matches_default():
    """dist_tri_chunk (finer distance-side culling) must not change a
    single distance or sign — only the amount of stream work."""
    mesh = make_icosphere(subdivisions=4, radius=0.6)
    rng = np.random.default_rng(12)
    pts = rng.uniform(-1, 1, (2048, 3))
    ref, _ = signed_distance_culled(pts, mesh, point_chunk=512,
                                    tri_chunk=512)
    got, _ = signed_distance_culled(pts, mesh, point_chunk=512,
                                    tri_chunk=512, dist_tri_chunk=64)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert np.all(np.sign(got) == np.sign(ref))
    # and through the pallas kernels too
    got_p, _ = signed_distance_culled(pts, mesh, point_chunk=512,
                                      tri_chunk=512, dist_tri_chunk=64,
                                      use_pallas=True)
    np.testing.assert_allclose(got_p, ref, rtol=1e-5, atol=1e-6)


def test_beyond_residency_auto_delegates_to_streamed(monkeypatch):
    """signed_distance_culled transparently streams face slabs when the
    mesh exceeds the residency cap — same distances and signs."""
    from sdf_representation_tpu.ops import sdf_culled

    mesh = make_icosphere(subdivisions=4, radius=0.6)  # 20480 faces
    rng = np.random.default_rng(13)
    pts = rng.uniform(-1, 1, (1024, 3))
    ref, _ = signed_distance_culled(pts, mesh, point_chunk=256,
                                    tri_chunk=256)
    monkeypatch.setattr(sdf_culled, "_RESIDENT_MAX_FACES", 8192)  # 3 slabs
    got, _ = signed_distance_culled(pts, mesh, point_chunk=256,
                                    tri_chunk=256)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert np.all(np.sign(got) == np.sign(ref))


def test_triangle_soup_distances_exact():
    """Non-watertight random soup: no winding structure to lean on, but
    DISTANCES must still match the dense oracle exactly through the culled
    and streamed paths (sign is winding-defined and matches dense since
    both integrate the same solid angles)."""
    rng = np.random.default_rng(14)
    centers = rng.uniform(-0.5, 0.5, (100, 1, 3))
    tris = centers + rng.normal(scale=0.08, size=(100, 3, 3))
    verts = tris.reshape(-1, 3)
    faces = np.arange(300).reshape(100, 3)
    pts = rng.uniform(-1, 1, (1500, 3))
    ref, _ = signed_distance(pts, verts, faces, method="dense")
    got, _ = signed_distance_culled(pts, verts, faces, point_chunk=256,
                                    tri_chunk=16)
    np.testing.assert_allclose(np.abs(got), np.abs(ref), rtol=1e-5,
                               atol=1e-6)
    from sdf_representation_tpu.ops.sdf_culled import (
        signed_distance_streamed,
    )

    got_s, _ = signed_distance_streamed(pts, verts, faces, point_chunk=256,
                                        tri_chunk=16, slab_faces=32)
    np.testing.assert_allclose(np.abs(got_s), np.abs(ref), rtol=1e-5,
                               atol=1e-6)


def test_sharded_files_match_resident(tmp_path):
    """signed_distance_files: a watertight surface partitioned across
    mesh FILES (each with its own reindexed vertex subset, loaded one at
    a time) must reproduce the resident culled labeling exactly —
    distances via the cross-shard running min, signs via summed winding."""
    from sdf_representation_tpu.geometry.mesh_io import Mesh, save_mesh
    from sdf_representation_tpu.ops.sdf_culled import signed_distance_files

    mesh = make_icosphere(subdivisions=3, radius=0.6)  # 5120 faces
    rng = np.random.default_rng(21)
    # shuffle faces so shards are NOT spatially coherent pieces
    perm = rng.permutation(len(mesh.faces))
    paths = []
    for s, part in enumerate(np.array_split(perm, 3)):
        f = mesh.faces[part]
        used, inv = np.unique(f, return_inverse=True)
        shard = Mesh(mesh.vertices[used], inv.reshape(-1, 3))
        p = tmp_path / f"shard{s}.ply"
        save_mesh(shard, str(p))
        paths.append(p)
    pts = rng.uniform(-1, 1, (1024, 3))
    ref, ref_n = signed_distance_culled(pts, mesh, point_chunk=256,
                                        tri_chunk=128)
    got, got_n = signed_distance_files(pts, paths, point_chunk=256,
                                       tri_chunk=128, slab_faces=1024)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert np.all(np.sign(got) == np.sign(ref))
    dots = np.einsum("ij,ij->i", got_n, ref_n)
    assert np.mean(dots > 0.999) > 0.99


def test_sharded_files_union_of_components(tmp_path):
    """Two disjoint closed components in separate files: the union's SDF
    is the min of distances with winding-summed signs — inside either
    sphere must come out negative, outside both positive."""
    from sdf_representation_tpu.geometry.mesh_io import Mesh, save_mesh
    from sdf_representation_tpu.ops.sdf_culled import signed_distance_files

    a = make_icosphere(subdivisions=3, radius=0.25)
    b = make_icosphere(subdivisions=3, radius=0.25)
    av = a.vertices + np.array([-0.5, 0.0, 0.0])
    bv = b.vertices + np.array([0.5, 0.0, 0.0])
    pa = tmp_path / "a.ply"
    pb = tmp_path / "b.ply"
    save_mesh(Mesh(av, a.faces), str(pa))
    save_mesh(Mesh(bv, b.faces), str(pb))
    rng = np.random.default_rng(22)
    pts = rng.uniform(-1, 1, (2048, 3))
    got, _ = signed_distance_files(pts, [pa, pb], point_chunk=256,
                                   tri_chunk=128)
    # oracle: union of the two analytic spheres (facet error ~2e-3 at lvl 3)
    da = np.linalg.norm(pts - [-0.5, 0, 0], axis=1) - 0.25
    db = np.linalg.norm(pts - [0.5, 0, 0], axis=1) - 0.25
    ana = np.minimum(da, db)
    band = np.abs(ana) > 5e-3  # skip points within facet error of surface
    assert np.all(np.sign(got[band]) == np.sign(ana[band]))
    np.testing.assert_allclose(got, ana, atol=5e-3)
