"""Auto-dispatch from signed_distance to the culled path."""

import numpy as np

from sdf_representation_tpu.geometry.primitives import make_icosphere
from sdf_representation_tpu.ops import sdf_exact


def test_auto_dispatch_threshold(monkeypatch):
    calls = {}

    def fake_culled(points, vertices, faces, **kw):
        calls["culled"] = True
        return np.zeros(len(points)), np.zeros((len(points), 3))

    monkeypatch.setattr(
        "sdf_representation_tpu.ops.sdf_culled.signed_distance_culled",
        fake_culled,
    )
    mesh = make_icosphere(subdivisions=2, radius=0.5)
    pts = np.zeros((64, 3), np.float32)
    # small: stays dense (no fake call)
    sdf, _ = sdf_exact.signed_distance(pts, mesh, point_chunk=64,
                                       tri_chunk=16)
    assert "culled" not in calls
    # forced: routes to culled
    sdf, _ = sdf_exact.signed_distance(pts, mesh, method="culled")
    assert calls.get("culled")


def test_forced_culled_matches_dense():
    mesh = make_icosphere(subdivisions=3, radius=0.5)
    rng = np.random.default_rng(5)
    pts = rng.uniform(-1, 1, (1500, 3))
    ref, _ = sdf_exact.signed_distance(pts, mesh, method="dense",
                                       point_chunk=2048, tri_chunk=256)
    got, _ = sdf_exact.signed_distance(pts, mesh, method="culled",
                                       tri_chunk=256)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_point_chunk_forwarded_to_culled(monkeypatch):
    """ADVICE r2: an explicit point_chunk must reach signed_distance_culled
    instead of being silently replaced by its default."""
    seen = {}

    def fake_culled(points, vertices, faces, **kw):
        seen.update(kw)
        return np.zeros(len(points)), np.zeros((len(points), 3))

    monkeypatch.setattr(
        "sdf_representation_tpu.ops.sdf_culled.signed_distance_culled",
        fake_culled,
    )
    mesh = make_icosphere(subdivisions=2, radius=0.5)
    pts = np.zeros((8, 3), np.float32)
    sdf_exact.signed_distance(pts, mesh, method="culled", point_chunk=777)
    assert seen.get("point_chunk") == 777
    # default: no explicit chunk -> culled keeps its own default
    seen.clear()
    sdf_exact.signed_distance(pts, mesh, method="culled")
    assert "point_chunk" not in seen


def test_empty_mesh_far_field_both_paths():
    """ADVICE r2: an empty mesh (0 faces) must not crash the culled path;
    both paths return +inf far-field distances and zero normals."""
    from sdf_representation_tpu.ops.sdf_culled import signed_distance_culled

    pts = np.random.default_rng(0).uniform(-1, 1, (16, 3)).astype(np.float32)
    empty_v = np.zeros((0, 3))
    empty_f = np.zeros((0, 3), dtype=np.int64)
    for fn in (
        lambda: sdf_exact.signed_distance(pts, empty_v, empty_f, method="dense"),
        lambda: sdf_exact.signed_distance(pts, empty_v, empty_f, method="culled"),
        lambda: signed_distance_culled(pts, empty_v, empty_f),
    ):
        d, g = fn()
        assert d.shape == (16,) and g.shape == (16, 3)
        assert np.all(np.isinf(d)) and np.all(d > 0)
        assert np.all(g == 0)
