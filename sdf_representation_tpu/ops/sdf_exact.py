"""Exact mesh signed distance + normals, computed ON the accelerator.

TPU-native replacement for the reference's host-side
``igl.signed_distance(points, V, F, return_normals=True)``
(reference datagenerator/data_generator.py:880-906, evaluations/post_process.py:91).

Design (see SURVEY.md §7 "Hard parts"): the all-pairs point/triangle work is
reformulated so the heavy terms are *matmuls* that ride the MXU:

  every pairwise dot product needed by both the Eberly closest-point test and
  the van Oosterom–Strackee solid angle decomposes as

      (vi - P) . (vj - P) = vi.vj - P.vi - P.vj + |P|^2
      det(v0-P, v1-P, v2-P) = det(v0,v1,v2) - P . (v0xv1 + v1xv2 + v2xv0)

  so a (points x triangles) tile needs only FOUR matmuls
  (P @ [v0 v1 v2 K]^T) plus per-triangle precomputed scalars; the region
  logic / sqrt / atan2 are elementwise VPU work on the tile.

Sign is the **generalized winding number** (Jacobson et al. 2013): the summed
solid angle of all triangles, > 2*pi  => inside. Exact for watertight meshes,
gracefully degrading for soup — and unlike libigl's pseudonormal test it
needs no combinatorial structure, so it vectorises perfectly.

Precision: everything runs in float32 on device. The tile pass picks the
winning triangle; a per-point device refinement recomputes its closest point
via the DIRECT (P - closest) difference, so the narrow band carries only
coordinate-epsilon error (~1e-7 relative). float64 host refinement was
dropped: it took minutes at 256^3 scale on the relay VM's single core, for
accuracy the labels never needed (closest_point_on_triangles remains as the
float64 test oracle).

Normal convention: the returned normal is the SDF *gradient*
sign * (P - closest)/|P - closest|, falling back to the face normal of the
winning triangle for on-surface points (|d| < eps). (libigl returns the
closest-primitive pseudonormal instead; for training labels the gradient is
the quantity the eikonal/normal-consistency losses actually constrain —
documented divergence.)
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.mesh_io import Mesh

__all__ = ["signed_distance", "winding_number", "closest_point_on_triangles"]


def _round_up_8k(x: int) -> int:
    return max(8192, -(-x // 8192) * 8192)


# ---------------------------------------------------------------------------
# Per-triangle precomputation (host, then shipped to device once)
# ---------------------------------------------------------------------------

def _triangle_tables(vertices: np.ndarray, faces: np.ndarray, tri_chunk: int):
    """Pack per-triangle constants into (C, T, ...) arrays, padded with
    far-away degenerate triangles that cannot win the min or bias the sign."""
    tri = vertices[faces].astype(np.float64)  # (F, 3, 3)
    F = len(tri)
    C = max(1, -(-F // tri_chunk))
    pad = C * tri_chunk - F
    if pad:
        far = np.full((pad, 3, 3), 1e9, dtype=np.float64)
        tri = np.concatenate([tri, far], axis=0)
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    e0, e1 = v1 - v0, v2 - v0
    n = np.cross(e0, e1)
    n_len = np.linalg.norm(n, axis=1, keepdims=True)
    valid = np.zeros(C * tri_chunk, dtype=np.float32)
    valid[:F] = 1.0

    def dots(a, b):
        return np.einsum("ij,ij->i", a, b)

    tables = {
        "v0": v0, "v1": v1, "v2": v2, "E0": e0, "E1": e1,
        "a": dots(e0, e0), "b": dots(e0, e1), "c": dots(e1, e1),
        "e0v0": dots(e0, v0), "e1v0": dots(e1, v0),
        "n00": dots(v0, v0), "n11": dots(v1, v1), "n22": dots(v2, v2),
        "n01": dots(v0, v1), "n12": dots(v1, v2), "n20": dots(v2, v0),
        "d0": dots(v0, np.cross(v1, v2)),
        "K": np.cross(v0, v1) + np.cross(v1, v2) + np.cross(v2, v0),
        "N": n / np.maximum(n_len, 1e-300),
        "valid": valid,
    }
    out = {}
    for k, v in tables.items():
        v32 = np.asarray(v, dtype=np.float32)
        out[k] = v32.reshape(C, tri_chunk, *v32.shape[1:])
    return out, F


# ---------------------------------------------------------------------------
# Eberly point-triangle closest point, tile-vectorised
# ---------------------------------------------------------------------------

def _eberly_st(a, b, c, d, e):
    """Clamped minimiser (s, t) of Q(s,t) = a s^2 + 2b st + c t^2 + 2d s + 2e t.

    a,b,c are per-triangle (broadcastable), d,e are per-pair. All operations
    elementwise, so the same code serves the (M, T) f32 device tile and the
    (N,) f64 host refinement pass.
    """
    xp = jnp if isinstance(d, jnp.ndarray) else np
    eps = 1e-30
    det = xp.maximum(a * c - b * b, eps)
    s = b * e - c * d
    t = b * d - a * e

    clamp01 = lambda x: xp.clip(x, 0.0, 1.0)
    inv_a = 1.0 / xp.maximum(a, eps)
    inv_c = 1.0 / xp.maximum(c, eps)
    denom_ac = xp.maximum(a - 2.0 * b + c, eps)

    in_lower = (s + t) <= det
    # region 0
    s0, t0 = s / det, t / det
    # edges
    s_edge_t0 = clamp01(-d * inv_a)        # t = 0 edge
    t_edge_s0 = clamp01(-e * inv_c)        # s = 0 edge
    # region 4 (s<0, t<0)
    r4_s = xp.where(d < 0, s_edge_t0, 0.0)
    r4_t = xp.where(d < 0, 0.0, t_edge_s0)
    # region 3 (s<0, t>=0): s=0, t on edge
    # region 5 (t<0, s>=0): t=0, s on edge
    lower_s = xp.where(
        s < 0, xp.where(t < 0, r4_s, 0.0), xp.where(t < 0, s_edge_t0, s0)
    )
    lower_t = xp.where(
        s < 0, xp.where(t < 0, r4_t, t_edge_s0), xp.where(t < 0, 0.0, t0)
    )

    # upper triangle: s + t > det
    # region 2 (s<0): compare (b+d) vs (c+e)
    tmp0_2, tmp1_2 = b + d, c + e
    r2_s = xp.where(tmp1_2 > tmp0_2, clamp01((tmp1_2 - tmp0_2) / denom_ac), 0.0)
    r2_t = xp.where(tmp1_2 > tmp0_2, 1.0 - r2_s, t_edge_s0)
    # region 6 (t<0)
    tmp0_6, tmp1_6 = b + e, a + d
    r6_t = xp.where(tmp1_6 > tmp0_6, clamp01((tmp1_6 - tmp0_6) / denom_ac), 0.0)
    r6_s = xp.where(tmp1_6 > tmp0_6, 1.0 - r6_t, s_edge_t0)
    # region 1 (diagonal edge)
    r1_s = clamp01((c + e - b - d) / denom_ac)
    r1_t = 1.0 - r1_s

    upper_s = xp.where(s < 0, r2_s, xp.where(t < 0, r6_s, r1_s))
    upper_t = xp.where(s < 0, r2_t, xp.where(t < 0, r6_t, r1_t))

    s_out = xp.where(in_lower, lower_s, upper_s)
    t_out = xp.where(in_lower, lower_t, upper_t)
    return s_out, t_out


def closest_point_on_triangles(points: np.ndarray, tri: np.ndarray):
    """Exact (float64) closest point of points[i] on tri[i]. Host refinement
    pass + reusable test oracle. points: (N,3), tri: (N,3,3) -> (N,3)."""
    P = np.asarray(points, dtype=np.float64)
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    e0, e1 = v1 - v0, v2 - v0
    dvec = v0 - P
    a = np.einsum("ij,ij->i", e0, e0)
    b = np.einsum("ij,ij->i", e0, e1)
    c = np.einsum("ij,ij->i", e1, e1)
    d = np.einsum("ij,ij->i", e0, dvec)
    e = np.einsum("ij,ij->i", e1, dvec)
    s, t = _eberly_st(a, b, c, d, e)
    return v0 + s[:, None] * e0 + t[:, None] * e1


# ---------------------------------------------------------------------------
# Device tile pass
# ---------------------------------------------------------------------------

def _mm(A, B):
    return jnp.dot(
        A, B, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("tri_chunk",))
def _sdf_point_block(P, tables, tri_chunk: int):
    """All triangles vs one block of points. P: (M, 3) float32.

    Returns (min_d2 (M,), best_idx (M,) int32, winding_sum (M,)).

    Distance and winding run as SEPARATE scans: the fused variant keeps ~25
    (M, T) f32 temporaries live per chunk, which spills to HBM and is ~50x
    slower than two light passes (measured on v5e).
    """
    M = P.shape[0]
    P2 = jnp.sum(P * P, axis=1, keepdims=True)

    def dist_body(carry, chunk):
        min_d2, best_idx, cidx = carry
        Pv0 = _mm(P, chunk["v0"].T)
        Pv1 = _mm(P, chunk["v1"].T)
        Pv2 = _mm(P, chunk["v2"].T)
        d = chunk["e0v0"] - (Pv1 - Pv0)
        e = chunk["e1v0"] - (Pv2 - Pv0)
        s, t = _eberly_st(chunk["a"], chunk["b"], chunk["c"], d, e)
        d2 = jnp.zeros_like(Pv0)
        for k in range(3):
            ck = chunk["v0"][:, k] + s * chunk["E0"][:, k] + t * chunk["E1"][:, k]
            dk = P[:, k : k + 1] - ck
            d2 = d2 + dk * dk
        d2 = jnp.where(chunk["valid"] > 0, d2, jnp.inf)
        local_min = jnp.min(d2, axis=1)
        local_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + cidx * tri_chunk
        better = local_min < min_d2
        return (
            jnp.where(better, local_min, min_d2),
            jnp.where(better, local_arg, best_idx),
            cidx + 1,
        ), None

    (min_d2, best_idx, _), _ = jax.lax.scan(
        dist_body,
        (jnp.full((M,), jnp.inf, jnp.float32), jnp.zeros((M,), jnp.int32),
         jnp.int32(0)),
        tables,
    )

    def wind_body(acc, chunk):
        Pv0 = _mm(P, chunk["v0"].T)
        Pv1 = _mm(P, chunk["v1"].T)
        Pv2 = _mm(P, chunk["v2"].T)
        PK = _mm(P, chunk["K"].T)
        la = jnp.sqrt(jnp.maximum(chunk["n00"] - 2.0 * Pv0 + P2, 1e-30))
        lb = jnp.sqrt(jnp.maximum(chunk["n11"] - 2.0 * Pv1 + P2, 1e-30))
        lc = jnp.sqrt(jnp.maximum(chunk["n22"] - 2.0 * Pv2 + P2, 1e-30))
        ab = chunk["n01"] - Pv0 - Pv1 + P2
        bc = chunk["n12"] - Pv1 - Pv2 + P2
        ca = chunk["n20"] - Pv2 - Pv0 + P2
        numer = chunk["d0"] - PK
        denom = la * lb * lc + ab * lc + bc * la + ca * lb
        omega = 2.0 * jnp.arctan2(numer, denom) * chunk["valid"]
        return acc + jnp.sum(omega, axis=1), None

    omega, _ = jax.lax.scan(wind_body, jnp.zeros((M,), jnp.float32), tables)
    return min_d2, best_idx, omega


@partial(jax.jit, static_argnames=("tri_chunk",))
def _sdf_all_blocks(P_blocks, tables, tri_chunk: int):
    """lax.map over point blocks: ONE dispatch for the whole query set
    (each separate dispatch costs ~1s through the axon relay). Viable only
    with the two-scan _sdf_point_block — mapping the old fused variant
    spilled catastrophically."""
    return jax.lax.map(
        lambda blk: _sdf_point_block(blk, tables, tri_chunk), P_blocks
    )


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("on_surface_eps",))
def _refine_device(P_cols, tri_flat, best_idx, omega, on_surface_eps: float):
    """Per-point refinement on the winning triangle, entirely on device:
    gather -> Eberly closest point -> distance/sign/gradient. The direct
    (P - closest) difference keeps f32 error at coordinate epsilon even in
    the narrow band; the old host float64 pass took MINUTES at 256^3 scale
    on the relay VM's single slow core.

    Everything is computed on 1-D (N,) component arrays: any (N, 3)- or
    (N, 3, 3)-shaped intermediate gets tile-padded on its minor dims by the
    TPU layout (a (16.7M, 3, 3) gather materialises as 34 GB of HBM).

    P_cols: tuple of 3 (N,) arrays; tri_flat: (9F,) flattened triangles
    [v0x v0y v0z v1x ... v2z] per face. Returns (sdf (N,), grads tuple of 3
    (N,) arrays)."""
    px, py, pz = P_cols
    base = best_idx * 9

    def g(k):
        return jnp.take(tri_flat, base + k)

    v0 = (g(0), g(1), g(2))
    v1 = (g(3), g(4), g(5))
    v2 = (g(6), g(7), g(8))
    e0 = tuple(v1[k] - v0[k] for k in range(3))
    e1 = tuple(v2[k] - v0[k] for k in range(3))
    dvec = (v0[0] - px, v0[1] - py, v0[2] - pz)

    dot = lambda a, b: a[0] * b[0] + a[1] * b[1] + a[2] * b[2]
    s, t = _eberly_st(dot(e0, e0), dot(e0, e1), dot(e1, e1),
                      dot(e0, dvec), dot(e1, dvec))
    closest = tuple(v0[k] + s * e0[k] + t * e1[k] for k in range(3))
    diff = (px - closest[0], py - closest[1], pz - closest[2])
    dist = jnp.sqrt(jnp.maximum(dot(diff, diff), 0.0))
    sign = jnp.where(omega > (2.0 * math.pi), -1.0, 1.0)
    sdf = sign * dist

    # face normal (cross product, componentwise)
    nx = e0[1] * e1[2] - e0[2] * e1[1]
    ny = e0[2] * e1[0] - e0[0] * e1[2]
    nz = e0[0] * e1[1] - e0[1] * e1[0]
    nlen = jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-30)
    inv_d = sign / jnp.maximum(dist, 1e-30)
    on_surf = dist <= on_surface_eps
    grads = tuple(
        jnp.where(on_surf, nc / nlen, dc * inv_d)
        for nc, dc in ((nx, diff[0]), (ny, diff[1]), (nz, diff[2]))
    )
    return sdf, grads


def signed_distance(
    points: np.ndarray,
    mesh_or_vertices,
    faces: Optional[np.ndarray] = None,
    *,
    return_normals: bool = True,
    point_chunk: Optional[int] = None,
    tri_chunk: int = 1024,
    on_surface_eps: float = 1e-6,
    return_device: bool = False,
    method: str = "auto",
    use_pallas: Optional[bool] = None,
    device_mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Signed distance (negative inside) and SDF-gradient normals.

    Drop-in for the role of igl.signed_distance in the reference pipeline
    (data_generator.py:880-906). Accepts a Mesh or (vertices, faces).
    Handles arbitrary N by tiling; ALL math (tile sweep, winning-triangle
    refinement, sign, gradients) executes on the default JAX backend.

    method: "dense" = all-pairs O(N*F); "culled" = chunk-culled +
    fast-winding (ops/sdf_culled — superlinear, exact distances, dipole
    far-field sign); "auto" picks culled for big workloads (the igl AABB
    regime, data_generator.py:674-676 "DAVID with 1 billion triangles").

    return_device=True returns jnp arrays without fetching (for device-side
    consumers like compute_grid_metrics — D2H through the relay runs at a
    few MB/s, so avoid fetching 256^3-sized results you don't need on host).

    use_pallas: execute the tile sweeps with the fused VMEM stream kernels
    (ops/pallas_streams). None = auto: on for TPU backends, off on CPU.
    """
    if isinstance(mesh_or_vertices, Mesh):
        vertices, faces = mesh_or_vertices.vertices, mesh_or_vertices.faces
    else:
        vertices = mesh_or_vertices
        assert faces is not None
    culled_tc = tri_chunk
    if method == "auto":
        n_pts, n_faces = len(points), len(faces)
        # shrink the chunk so culling has >= 32 chunks of granularity
        # (grid-scale labeling of small meshes wants fine chunks)
        while culled_tc > 128 and n_faces < 32 * culled_tc:
            culled_tc //= 2
        method = (
            "culled"
            if n_faces >= 32 * culled_tc and n_pts * n_faces >= 1e10
            else "dense"
        )
    if method == "culled":
        from .sdf_culled import signed_distance_culled

        culled_kwargs = {}
        if point_chunk is not None:
            culled_kwargs["point_chunk"] = point_chunk
        return signed_distance_culled(
            points, vertices, faces, return_normals=return_normals,
            tri_chunk=culled_tc, on_surface_eps=on_surface_eps,
            return_device=return_device, use_pallas=use_pallas,
            device_mesh=device_mesh, **culled_kwargs,
        )
    points = np.ascontiguousarray(points, dtype=np.float32)
    N = len(points)
    if N == 0:
        return np.zeros(0), np.zeros((0, 3))
    if len(faces) == 0:
        # empty mesh: no surface → far field everywhere (+inf, outside)
        d = np.full(N, np.inf, dtype=np.float64)
        g = np.zeros((N, 3), dtype=np.float64)
        if return_device:
            return jnp.asarray(d), jnp.asarray(g)
        return d, g

    tables_np, F = _triangle_tables(vertices, faces, tri_chunk)
    tables = {k: jnp.asarray(v) for k, v in tables_np.items()}

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu", "gpu", "cuda")
    if point_chunk is None:
        # every dispatch costs ~0.1s through the relay: keep the block count
        # bounded while capping the (chunk x tri_chunk) tile memory. The
        # pallas streams cover all blocks in one call regardless of block
        # count, and smaller blocks keep the Mosaic program small
        if use_pallas:
            point_chunk = 8192
        else:
            point_chunk = int(min(65536, max(8192, _round_up_8k(N // 64))))
    M = point_chunk
    # round the block count up to a power of two: the remote compiler takes
    # minutes per (n_blocks, M) shape, so bound the variant space (padding
    # blocks compute garbage that the [:N] trims; <=2x waste worst case)
    n_blocks = -(-N // M)
    n_blocks = 1 << max(0, (n_blocks - 1).bit_length())
    P_pad = np.zeros((n_blocks * M, 3), dtype=np.float32)
    P_pad[:N] = points

    # ONE upload, ONE device dispatch chain — anything per-block round-trips
    # the relay at ~0.3-1s a pop
    if use_pallas:
        # run the all-pairs sweep through the fused VMEM stream kernels
        # (ops/pallas_streams): a dense keep matrix makes the segmented
        # streams exactly the all-pairs schedule, without the ~100 MB of
        # (M, T) intermediate HBM round-trips per tile the XLA scan pays
        try:
            from .pallas_streams import (
                dist_stream_pallas,
                wind_stream_pallas,
            )

            P_blocks_np = P_pad.reshape(n_blocks, M, 3)
            C = tables_np["a"].shape[0]
            from .sdf_culled import _stream_steps

            sb, sc, _ = _stream_steps(np.ones((n_blocks, C), bool),
                                      n_blocks)
            _, b = dist_stream_pallas(P_blocks_np, sb, sc, tables_np,
                                      tri_chunk)
            w = wind_stream_pallas(P_blocks_np, sb, sc, tables_np,
                                   tri_chunk)
            blocks = jnp.asarray(P_blocks_np)
            best_idx = jnp.clip(b[:n_blocks].reshape(-1)[:N], 0, F - 1)
            omega = w[:n_blocks].reshape(-1)[:N]
        except Exception as exc:  # pragma: no cover - compiler-dependent
            print(f"[sdf_exact] pallas streams unavailable ({exc!r}); "
                  "falling back to the XLA sweep", flush=True)
            use_pallas = False
    if not use_pallas:
        blocks = jnp.asarray(P_pad.reshape(n_blocks, M, 3))
        _, b, w = _sdf_all_blocks(blocks, tables, tri_chunk)
        best_idx = jnp.clip(b.reshape(-1)[:N], 0, F - 1)
        omega = w.reshape(-1)[:N]

    tri_flat = jnp.asarray(
        vertices[np.asarray(faces)].astype(np.float32).reshape(-1)
    )
    flat = blocks.reshape(-1, 3)
    P_cols = (flat[:N, 0], flat[:N, 1], flat[:N, 2])
    sdf, grads = _refine_device(P_cols, tri_flat, best_idx, omega, on_surface_eps)

    if return_device:
        return sdf, (jnp.stack(grads, axis=-1) if return_normals else None)
    if not return_normals:
        return np.asarray(sdf, dtype=np.float64), None
    grad = np.stack([np.asarray(gc) for gc in grads], axis=-1).astype(np.float64)
    return np.asarray(sdf, dtype=np.float64), grad


def winding_number(
    points: np.ndarray,
    mesh_or_vertices,
    faces: Optional[np.ndarray] = None,
    *,
    point_chunk: int = 8192,
    tri_chunk: int = 1024,
) -> np.ndarray:
    """Generalized winding number of each point w.r.t. the mesh (~1 inside)."""
    if isinstance(mesh_or_vertices, Mesh):
        vertices, faces = mesh_or_vertices.vertices, mesh_or_vertices.faces
    else:
        vertices = mesh_or_vertices
    points = np.ascontiguousarray(points, dtype=np.float64)
    N = len(points)
    tables_np, _ = _triangle_tables(vertices, faces, tri_chunk)
    tables = {k: jnp.asarray(v) for k, v in tables_np.items()}
    M = point_chunk
    n_blocks = -(-N // M)
    P_pad = np.zeros((n_blocks * M, 3), dtype=np.float32)
    P_pad[:N] = points.astype(np.float32)
    blocks = jnp.asarray(P_pad.reshape(n_blocks, M, 3))
    _, _, w = _sdf_all_blocks(blocks, tables, tri_chunk)
    return np.asarray(w).reshape(-1)[:N] / (4.0 * math.pi)
