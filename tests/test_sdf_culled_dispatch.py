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
