"""Pallas stream kernels vs the XLA segmented streams (interpret mode).

The kernels must reproduce the XLA `_dist_stream`/`_wind_stream` results
bit-for-bit in distance ordering terms: same winning triangles (identical
tie-breaking: first minimal index) and windings within f32 tolerance.
Slab boundaries mid-segment are exercised explicitly."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdf_representation_tpu.geometry.primitives import make_icosphere
from sdf_representation_tpu.ops.pallas_streams import (
    dist_stream_pallas,
    wind_stream_pallas,
)
from sdf_representation_tpu.ops.sdf_culled import (
    _dist_stream,
    _morton_order,
    _stream_steps,
    _wind_stream,
)
from sdf_representation_tpu.ops.sdf_exact import _triangle_tables


def _setup(n_pts=1024, M=256, tri_chunk=256, seed=0, keep_frac=0.6):
    mesh = make_icosphere(subdivisions=3, radius=0.6)  # 1280 faces
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    pts = pts[_morton_order(pts)]
    B = n_pts // M
    P_blocks = pts.reshape(B, M, 3)
    tables_np, F = _triangle_tables(
        mesh.vertices.astype(np.float64), mesh.faces, tri_chunk
    )
    C = tables_np["a"].shape[0]
    keep = rng.uniform(size=(B, C)) < keep_frac
    keep[:, 0] = True  # every block keeps at least one chunk
    sb, sc, S = _stream_steps(keep, B)
    return P_blocks, sb, sc, tables_np, tri_chunk, B, M, F


@pytest.mark.parametrize("slab", [1 << 20, 8])  # one call / many tiny slabs
def test_dist_stream_parity(slab):
    P_blocks, sb, sc, tables_np, tri_chunk, B, M, F = _setup()
    tables = {k: jnp.asarray(v) for k, v in tables_np.items()}
    ref_d2, ref_best = _dist_stream(P_blocks, sb, sc, tables, tri_chunk)
    got_d2, got_best = dist_stream_pallas(
        P_blocks, sb, sc, tables_np, tri_chunk, slab=slab, interpret=True
    )
    # compare visited rows only (row B is the padding sink)
    np.testing.assert_allclose(
        np.asarray(got_d2)[:B], np.asarray(ref_d2)[:B], rtol=1e-5, atol=1e-7
    )
    # winners may differ ONLY on genuine ties (broadcast-multiply vs matmul
    # rounding flips last-ulp-equidistant triangles); prove any differing
    # pair equidistant with the f64 oracle
    gb = np.asarray(got_best)[:B].reshape(-1)
    rb = np.asarray(ref_best)[:B].reshape(-1)
    diff = np.nonzero(gb != rb)[0]
    # icospheres are pathologically tie-heavy (symmetry): different-but-
    # equidistant winners are fine as long as the oracle proves the tie
    assert len(diff) < 0.08 * len(gb)
    if len(diff):
        from sdf_representation_tpu.ops.sdf_exact import (
            closest_point_on_triangles,
        )

        mesh = make_icosphere(subdivisions=3, radius=0.6)
        pts = P_blocks.reshape(-1, 3)[diff].astype(np.float64)
        tri = mesh.vertices[mesh.faces]
        ca = closest_point_on_triangles(pts, tri[gb[diff]])
        cb = closest_point_on_triangles(pts, tri[rb[diff]])
        da = np.linalg.norm(pts - ca, axis=1)
        db = np.linalg.norm(pts - cb, axis=1)
        np.testing.assert_allclose(da, db, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("slab", [1 << 20, 8])
def test_wind_stream_parity(slab):
    P_blocks, sb, sc, tables_np, tri_chunk, B, M, F = _setup(seed=1)
    tables = {k: jnp.asarray(v) for k, v in tables_np.items()}
    ref_w = _wind_stream(P_blocks, sb, sc, tables)
    got_w = wind_stream_pallas(
        P_blocks, sb, sc, tables_np, tri_chunk, slab=slab, interpret=True
    )
    # atol: the kernel's MXU dots (f32 3-pass) accumulate in a different
    # order than the XLA stream's mul/add chain; near plane-degenerate
    # (numer ~ 0) pairs the atan2 amplifies that last-ulp skew to ~3e-4.
    # The winding contract is SIGN at a 2*pi quantum margin — 1e-3 is four
    # orders below it.
    np.testing.assert_allclose(
        np.asarray(got_w)[:B], np.asarray(ref_w)[:B], rtol=1e-4, atol=1e-3
    )


def test_culled_end_to_end_with_pallas_streams():
    """Full signed_distance_culled through the kernels (interpret on CPU)
    vs the XLA-stream path: distances exact, signs identical."""
    from sdf_representation_tpu.ops.sdf_culled import signed_distance_culled

    mesh = make_icosphere(subdivisions=4, radius=0.6)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (2048, 3))
    ref, _ = signed_distance_culled(
        pts, mesh, point_chunk=512, tri_chunk=256, use_pallas=False
    )
    got, _ = signed_distance_culled(
        pts, mesh, point_chunk=512, tri_chunk=256, use_pallas=True
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert np.all(np.sign(got) == np.sign(ref))


def test_atan2_matches_numpy():
    from sdf_representation_tpu.ops.pallas_streams import _atan2

    rng = np.random.default_rng(2)
    y = rng.uniform(-5, 5, (1000,)).astype(np.float32)
    x = rng.uniform(-5, 5, (1000,)).astype(np.float32)
    # include axis/edge cases
    y = np.concatenate([y, [0.0, 0.0, 1.0, -1.0, 0.0]]).astype(np.float32)
    x = np.concatenate([x, [1.0, -1.0, 0.0, 0.0, 0.0]]).astype(np.float32)
    got = np.asarray(_atan2(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y, x)
    # atan2(0, -1): +pi vs -pi are the same winding contribution mod 2pi
    wrap = np.minimum(np.abs(got - ref), 2 * np.pi - np.abs(got - ref))
    assert wrap.max() < 1e-5


def test_dense_signed_distance_with_pallas_streams():
    """sdf_exact.signed_distance(method='dense', use_pallas=True) must
    match the XLA all-pairs path (interpret mode on CPU)."""
    from sdf_representation_tpu.ops.sdf_exact import signed_distance

    mesh = make_icosphere(subdivisions=3, radius=0.5)
    rng = np.random.default_rng(4)
    pts = rng.uniform(-1, 1, (3000, 3))
    ref, _ = signed_distance(pts, mesh, method="dense", use_pallas=False)
    got, _ = signed_distance(
        pts, mesh, method="dense", use_pallas=True, point_chunk=512,
        tri_chunk=256,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert np.all(np.sign(got) == np.sign(ref))


def test_culled_sharded_over_virtual_mesh():
    """Labeling streams sharded over the 8-virtual-device mesh must equal
    the single-device result (contiguous block ranges, replicated tables)."""
    import jax

    from sdf_representation_tpu.ops.sdf_culled import signed_distance_culled
    from sdf_representation_tpu.parallel.mesh import get_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = get_mesh()
    m = make_icosphere(subdivisions=4, radius=0.6)
    rng = np.random.default_rng(11)
    pts = rng.uniform(-1, 1, (4096, 3))
    ref, _ = signed_distance_culled(
        pts, m, point_chunk=512, tri_chunk=256, use_pallas=True
    )
    got, _ = signed_distance_culled(
        pts, m, point_chunk=512, tri_chunk=256, device_mesh=mesh
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert np.all(np.sign(got) == np.sign(ref))


def test_tiling_validation_raises_in_drivers():
    """The stream drivers must refuse tilings their strip loops cannot
    cover (tri_chunk not a multiple of 128 / too small, point_chunk with a
    lane remainder) instead of silently dropping triangles."""
    from sdf_representation_tpu.ops.pallas_streams import (
        dist_stream_pallas,
        stream_tiling_ok,
        wind_stream_pallas,
    )

    assert stream_tiling_ok(128, 256)
    assert stream_tiling_ok(1024, 2048)
    assert not stream_tiling_ok(1000, 256)   # tri remainder
    assert not stream_tiling_ok(64, 256)     # below one strip
    assert not stream_tiling_ok(256, 1500)   # lane remainder vs 1024
    P = np.zeros((1, 256, 3), np.float32)
    sb = np.zeros(1, np.int32)
    sc = np.zeros(1, np.int32)
    tables = {"a": np.zeros((1, 1000), np.float32)}
    with pytest.raises(ValueError):
        dist_stream_pallas(P, sb, sc, tables, tri_chunk=1000)
    with pytest.raises(ValueError):
        wind_stream_pallas(P, sb, sc, tables, tri_chunk=64)


def test_culled_nontileable_tri_chunk_stays_exact():
    """signed_distance_culled(use_pallas=True, tri_chunk=1000) must divert
    to the XLA streams and return exact results (regression: the kernels
    previously auto-shrank 1000 -> 7*128 and returned garbage)."""
    from sdf_representation_tpu.ops.sdf_culled import signed_distance_culled

    mesh = make_icosphere(subdivisions=3, radius=0.6)
    rng = np.random.default_rng(7)
    pts = rng.uniform(-1, 1, (2000, 3))
    ref, _ = signed_distance_culled(
        pts, mesh, point_chunk=512, tri_chunk=256, use_pallas=False
    )
    got, _ = signed_distance_culled(
        pts, mesh, point_chunk=512, tri_chunk=1000, use_pallas=True
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
