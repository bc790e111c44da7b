"""Superlinear exact signed distance: chunk culling + fast winding numbers.

The all-pairs pass in ops/sdf_exact.py is O(N*F) — great at 100k faces,
unusable at the reference's "DAVID with 1 billion triangles" scale
(reference datagenerator/data_generator.py:674-676, which leans on libigl's
AABB tree at :880-906). This module keeps the labeling matmul-shaped for the
MXU but makes it superlinear:

  * **Spatial sort**: faces are Morton-ordered by centroid so each
    ``tri_chunk``-triangle chunk is spatially compact; query points are
    Morton-ordered into ``point_chunk`` blocks the same way (grid queries
    arrive coherent already and sort into perfect tiles).
  * **Distance culling** (exact, per point): a cheap O(N*C) device prepass
    (two matmuls per chunk group) computes every point's distance to every
    chunk's bounding sphere:  lb_pc = d_pc - r_c  and the upper bound
    u_p = min_c (d_pc + r_c).  Chunk c survives for a point block iff ANY
    of its points has lb_pc <= u_p (+f32 slack) — the winning triangle can
    never be culled, so distances (and the winner refinement that follows)
    stay EXACT. Per-point bounds are what make this work: block-level
    bounding spheres over thousands of points are far too loose to cull.
  * **Fast winding number** (Jacobson et al. 2018 dipole far-field): chunks
    with d_pc > beta*r_t for every point of a block contribute their
    first-order moment
        omega_t(P) ~= m_t . (cbar_t - P) / |cbar_t - P|^3,
        m_t = sum of triangle area vectors,  cbar_t = area-weighted centroid,
    which is TWO matmuls per chunk group (P @ cbar^T, P @ m^T). Beta-near
    chunks use the exact van Oosterom–Strackee sum from sdf_exact. The
    partition is exact — each chunk is counted once per block.

**Dispatch shape**: the (block, chunk) pairs surviving the cull are
flattened into segmented WORK STREAMS — one lax.scan for distance, one for
winding. Each step processes a (point_chunk x tri_chunk) tile; steps of a
block are contiguous, the running reduction re-initialises on segment
change and is written to the block's output row every step (last write of
the segment wins). Zero padding waste (work is exactly sum(kd) + sum(kw)
tile passes, unlike a fixed-K gather), ONE compile variant, and one device
dispatch per stream — which matters through the axon relay (per-dispatch
~0.3-1 s, remote compiles are minutes).

Cost: O(sum kd * tri_chunk) near-field + O(N * C) culling/dipole, vs
O(N * F) all-pairs. Culling quality is set by point-block coherence
(Morton) and chunk compactness (Morton); both improve as meshes grow.
Deep-interior points of near-spherical meshes are near-equidistant from
every chunk — nothing CAN be culled there without giving up exactness (an
AABB tree degrades to O(F) per point on the same input).
"""

from __future__ import annotations

import math
import os
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.mesh_io import Mesh
from .sdf_exact import _eberly_st, _mm, _refine_device, _triangle_tables

__all__ = ["signed_distance_culled"]

_DEBUG = os.environ.get("SDF_CULLED_DEBUG", "") not in ("", "0")

_DIP_GROUP = 1024  # chunks per dipole/cull scan step
_CULL_SLACK = 1e-3  # absorbs f32 rounding in the sphere-bound comparisons
# Exact coarse-field node sweep costs O(grid^3 * F) pairs; past this budget
# (~1M faces at grid=32) switch to the O(grid^3 * C) sphere-node bound.
_COARSE_EXACT_MAX_PAIRS = 3.2e10
# Past this many faces the triangle tables stop fitting HBM comfortably
# (~100 B/face x2 table sets + points + outputs on a 16 GB part);
# signed_distance_culled transparently delegates to the host-streamed
# face-slab path.
_RESIDENT_MAX_FACES = 1 << 25


def _dbg(t0, label):
    if _DEBUG:
        print(f"[sdf_culled] {label}: {time.time() - t0:.2f}s", flush=True)
    return time.time()


# ---------------------------------------------------------------------------
# Host-side spatial preprocessing
# ---------------------------------------------------------------------------

def _morton3(q: np.ndarray) -> np.ndarray:
    """Interleave 10-bit coords (N, 3) -> 30-bit Morton codes (N,)."""
    def spread(x):
        x = x.astype(np.int64)
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def _morton_order(points: np.ndarray) -> np.ndarray:
    """Argsort of points along a Morton curve over their own AABB."""
    lo = points.min(axis=0)
    span = np.maximum(points.max(axis=0) - lo, 1e-12)
    q = np.clip((points - lo) / span * 1023.0, 0, 1023).astype(np.int64)
    return np.argsort(_morton3(q), kind="stable")


def _chunk_geometry(vertices: np.ndarray, faces: np.ndarray, tri_chunk: int,
                    super_faces: int = 4_194_304):
    """Per-chunk bounding spheres + dipole moments (valid triangles only).

    Returns (centers (C,3), radii (C,), m (C,3) area-vector sums,
    cbar (C,3) area-weighted centroids) as float64.

    Fully vectorized over chunks (the round-2 per-chunk Python loop was
    ~100k iterations at 100M faces); memory is bounded by processing
    ``super_faces`` faces per sweep (~0.9 GB of f64 triangles at the
    default), so 10M+ face meshes stream through without a blow-up.
    """
    F = len(faces)
    C = max(1, -(-F // tri_chunk))
    centers = np.zeros((C, 3))
    radii = np.zeros(C)
    m = np.zeros((C, 3))
    cbar = np.zeros((C, 3))
    if F == 0:
        return centers, radii, m, cbar
    chunks_per_super = max(1, super_faces // tri_chunk)
    for c0 in range(0, C, chunks_per_super):
        c1 = min(C, c0 + chunks_per_super)
        f0, f1 = c0 * tri_chunk, min(F, c1 * tri_chunk)
        t = vertices[faces[f0:f1]].astype(np.float64)  # (n, 3, 3)
        nc = c1 - c0
        n = f1 - f0
        pad = nc * tri_chunk - n
        if pad:
            t = np.concatenate([t, np.repeat(t[-1:], pad, axis=0)])
        vm = np.ones((nc, tri_chunk), np.float64)
        if pad:
            vm.reshape(-1)[n:] = 0.0
        t4 = t.reshape(nc, tri_chunk, 3, 3)
        av = 0.5 * np.cross(
            t4[:, :, 1] - t4[:, :, 0], t4[:, :, 2] - t4[:, :, 0]
        ) * vm[..., None]  # (nc, tc, 3); pads contribute zero moment
        m[c0:c1] = av.sum(axis=1)
        w = np.linalg.norm(av, axis=2)
        wsum = np.maximum(w.sum(axis=1), 1e-300)
        cb = (t4.mean(axis=2) * w[..., None]).sum(axis=1) / wsum[:, None]
        # bounding sphere centered AT the dipole expansion point: the
        # Barnes-Hut nearness test d <= beta*r is then exact (no centroid
        # offset correction), and any enclosing sphere is valid for the
        # distance cull (r grows only marginally vs the AABB center)
        cbar[c0:c1] = cb
        centers[c0:c1] = cb
        d2 = ((t4.reshape(nc, -1, 3) - cb[:, None]) ** 2).sum(axis=-1)
        d2 *= np.repeat(vm, 3, axis=1)  # pads never set the radius
        radii[c0:c1] = np.sqrt(d2.max(axis=1))
    return centers, radii, m, cbar


# ---------------------------------------------------------------------------
# Device culling prepass
# ---------------------------------------------------------------------------

def _cull_block_device(P, ub0, sph, slack):
    """Per-point sphere bounds for one point block, OR-reduced to the block.

    P: (M, 3) f32; ub0: (M,) per-point upper bound on the true distance
    (inf, or the coarse-field bound — see _coarse_upper_bound); sph: dict of
    (G, Gc, ...) grouped chunk spheres (center, center^2, radius) plus the
    precomputed dipole-nearness threshold ``wthr`` (see _cull). ``slack``
    is geometry-scale-relative (f32 rounding is relative to coordinate
    magnitudes). Returns (keep_dist (Cp,), keep_wind (Cp,)) bools. Two
    scans over chunk groups: min-reduce for u_p, then the OR.
    """
    P2 = jnp.sum(P * P, axis=1, keepdims=True)

    def d_pc(group):
        Pc = _mm(P, group["c"].T)  # (M, Gc)
        return jnp.sqrt(jnp.maximum(group["c2"] - 2.0 * Pc + P2, 0.0))

    def ub_body(u_p, group):
        d = d_pc(group)
        lb_plus = jnp.min(d + group["r"] + 1e30 * (1.0 - group["valid"]),
                          axis=1)
        return jnp.minimum(u_p, lb_plus), None

    u_p, _ = jax.lax.scan(ub_body, ub0, sph)

    def keep_body(_, group):
        d = d_pc(group)
        kd = jnp.any(d - group["r"] <= u_p[:, None] + slack, axis=0)
        kw = jnp.any(d <= group["wthr"] + slack, axis=0)
        return None, (kd, kw)

    _, (kd, kw) = jax.lax.scan(keep_body, None, sph)
    return kd.reshape(-1), kw.reshape(-1)


@jax.jit
def _cull_all_blocks(P_blocks, UB_blocks, sph, slack):
    """ONE dispatch for the whole culling prepass."""
    return jax.lax.map(
        lambda xs: _cull_block_device(xs[0], xs[1], sph, slack),
        (P_blocks, UB_blocks),
    )


@jax.jit
def _coarse_dist_device(node_blocks, tables):
    """Distance-only Eberly sweep of ALL chunks vs the coarse node blocks
    (no winding, no refinement — only min d^2 is needed for the bound)."""

    def one(P):
        def dist_body(min_d2, chunk):
            Pv0 = _mm(P, chunk["v0"].T)
            Pv1 = _mm(P, chunk["v1"].T)
            Pv2 = _mm(P, chunk["v2"].T)
            d = chunk["e0v0"] - (Pv1 - Pv0)
            e = chunk["e1v0"] - (Pv2 - Pv0)
            s, t = _eberly_st(chunk["a"], chunk["b"], chunk["c"], d, e)
            d2 = jnp.zeros_like(Pv0)
            for k in range(3):
                ck = (chunk["v0"][:, k] + s * chunk["E0"][:, k]
                      + t * chunk["E1"][:, k])
                dk = P[:, k : k + 1] - ck
                d2 = d2 + dk * dk
            d2 = jnp.where(chunk["valid"] > 0, d2, jnp.inf)
            return jnp.minimum(min_d2, jnp.min(d2, axis=1)), None

        min_d2, _ = jax.lax.scan(
            dist_body, jnp.full((P.shape[0],), jnp.inf, jnp.float32), tables
        )
        return min_d2

    return jax.lax.map(one, node_blocks)


def _coarse_upper_bound(P_pad: np.ndarray, tables, tri_chunk: int,
                        grid: int = 32, eps: float = 1e-4) -> np.ndarray:
    """Tight per-point distance upper bound from an EXACT coarse field.

    Labels a grid^3 lattice over the query AABB with exact unsigned
    distances (distance-only tile sweep against the already-uploaded
    triangle tables: grid^3 * F pairs — seconds even at 1M+ faces), then
    bounds every query by the triangle inequality
        d(p) <= d(nearest node) + |p - nearest node|.
    This is what makes culling effective in the far field, where the
    sphere bound min_c(d_pc + r_c) barely separates chunks: sum_kd on a
    256^3 audit drops ~2-5x. Conservative by construction, so distances
    stay exact.
    """
    lo = P_pad.min(axis=0)
    hi = P_pad.max(axis=0)
    span = np.maximum(hi - lo, 1e-9)
    axes = [np.linspace(lo[k], hi[k], grid, dtype=np.float64)
            for k in range(3)]
    nodes = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    NB = 2048
    n_nb = -(-len(nodes) // NB)
    nodes_pad = np.zeros((n_nb * NB, 3), np.float32)
    nodes_pad[: len(nodes)] = nodes
    d2 = np.asarray(
        _coarse_dist_device(
            jnp.asarray(nodes_pad.reshape(n_nb, NB, 3)), tables
        )
    ).reshape(-1)[: len(nodes)]
    d_nodes = np.sqrt(d2).astype(np.float32).reshape(grid, grid, grid)
    cell = span / (grid - 1)
    # nearest node per query + exact residual |p - node|
    fidx = (P_pad - lo) / cell
    nidx = np.clip(np.rint(fidx), 0, grid - 1).astype(np.int64)
    node_xyz = lo + nidx * cell
    resid = np.sqrt(((P_pad - node_xyz) ** 2).sum(axis=1)).astype(np.float32)
    ub = d_nodes[nidx[:, 0], nidx[:, 1], nidx[:, 2]] + resid
    return ub + np.float32(eps)  # absorb f32 rounding of the coarse pass


def _coarse_upper_bound_spheres(P_pad: np.ndarray, centers: np.ndarray,
                                radii: np.ndarray, grid: int = 32,
                                eps: float = 1e-4) -> np.ndarray:
    """Per-point distance upper bound from CHUNK SPHERES at lattice nodes.

    Same lattice + triangle-inequality structure as _coarse_upper_bound,
    but each node is bounded by min_c(|node - c| + r_c) — O(grid^3 * C)
    instead of O(grid^3 * F). At 21M faces the exact node sweep measured
    624-977 s on one chip while this pass is ~0.7 G pair-ops total
    (compute-trivial; wall time through the axon relay is compile/drain
    dominated and run-to-run variable); the tightness loss is
    the winning chunk's radius, which for large meshes is far below the
    lattice residual term |p - node| that dominates the bound anyway.
    Still a true upper bound (every chunk triangle lies in its sphere), so
    culling stays conservative and distances exact."""
    lo = P_pad.min(axis=0)
    hi = P_pad.max(axis=0)
    span = np.maximum(hi - lo, 1e-9)
    axes = [np.linspace(lo[k], hi[k], grid, dtype=np.float64)
            for k in range(3)]
    nodes = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    c = jnp.asarray(centers, jnp.float32)
    c2 = jnp.sum(c * c, axis=1)
    r = jnp.asarray(radii, jnp.float32)

    def one(slab):
        s2 = jnp.sum(slab * slab, axis=1, keepdims=True)
        d2 = jnp.maximum(s2 - 2.0 * _mm(slab, c.T) + c2[None, :], 0.0)
        return jnp.min(jnp.sqrt(d2) + r[None, :], axis=1)

    NBs = 4096
    n_sl = -(-len(nodes) // NBs)
    nodes_pad = np.zeros((n_sl * NBs, 3), np.float32)
    nodes_pad[: len(nodes)] = nodes
    td = time.time()
    d_nodes = np.asarray(
        jax.lax.map(one, jnp.asarray(nodes_pad.reshape(n_sl, NBs, 3)))
    ).reshape(-1)[: len(nodes)].astype(np.float32).reshape(grid, grid, grid)
    td = _dbg(td, "  sphere-node device pass")
    cell = span / (grid - 1)
    fidx = (P_pad - lo) / cell
    nidx = np.clip(np.rint(fidx), 0, grid - 1).astype(np.int64)
    node_xyz = lo + nidx * cell
    resid = np.sqrt(((P_pad - node_xyz) ** 2).sum(axis=1)).astype(np.float32)
    ub = d_nodes[nidx[:, 0], nidx[:, 1], nidx[:, 2]] + resid
    return ub + np.float32(eps)


def _cull(P_blocks, UB_blocks, chunk_centers, chunk_radii, beta,
          cbar=None, slack=_CULL_SLACK, group=_DIP_GROUP):
    """Candidate chunk sets per point block.

    Returns (kd (B, C) bool distance candidates, kw (B, C) bool near-field
    winding chunks). Conservative: the winning chunk is always in kd; every
    chunk NOT in kw satisfies the beta dipole criterion for every point.
    The dipole is expanded about the area-weighted centroid cbar, which can
    be offset by delta from the bounding-sphere center — elements then lie
    within r + delta of cbar and |P - cbar| >= d - delta, so the sufficient
    nearness test in sphere-center distance is
        d <= beta*r + (beta + 1)*delta.
    """
    C = len(chunk_centers)
    Cp = max(group, -(-C // group) * group)
    delta = (
        np.linalg.norm(np.asarray(cbar) - chunk_centers, axis=1)
        if cbar is not None
        else np.zeros(C)
    )
    sph_np = {
        "c": np.zeros((Cp, 3), np.float32),
        "c2": np.zeros((Cp,), np.float32),
        "r": np.zeros((Cp,), np.float32),
        "wthr": np.zeros((Cp,), np.float32),
        "valid": np.zeros((Cp,), np.float32),
    }
    sph_np["c"][:C] = chunk_centers
    sph_np["c2"][:C] = np.einsum("ij,ij->i", chunk_centers, chunk_centers)
    sph_np["r"][:C] = chunk_radii
    sph_np["wthr"][:C] = beta * chunk_radii + (beta + 1.0) * delta
    sph_np["valid"][:C] = 1.0
    g = Cp // group
    sph = {k: jnp.asarray(v.reshape(g, group, *v.shape[1:]))
           for k, v in sph_np.items()}

    kd, kw = _cull_all_blocks(jnp.asarray(P_blocks), jnp.asarray(UB_blocks),
                              sph, jnp.float32(slack))
    return np.asarray(kd)[:, :C], np.asarray(kw)[:, :C]


# ---------------------------------------------------------------------------
# Segmented work streams
# ---------------------------------------------------------------------------

_STREAM_SLAB = 32768  # scan steps per dispatch: bounds single-program
# runtime (the relay kills multi-minute programs) and keeps compile variants
# to one per power-of-two size below the slab


@partial(jax.jit, static_argnames=("tri_chunk",), donate_argnums=(0,))
def _dist_stream_slab(carry, P_blocks, step_block, step_chunk, tables,
                      tri_chunk: int):
    """One slab of the segmented min-distance stream. carry = (out_d2,
    out_best, run_d2, run_best, prev_b); out rows B is the padding sink.
    Segments may span slab boundaries — the running state in the carry
    continues them exactly."""
    B = P_blocks.shape[0]

    def body(carry, xs):
        out_d2, out_best, run_d2, run_best, prev_b = carry
        b, c = xs
        newseg = b != prev_b
        run_d2 = jnp.where(newseg, jnp.inf, run_d2)
        run_best = jnp.where(newseg, 0, run_best)
        P = P_blocks[jnp.minimum(b, B - 1)]
        chunk = jax.tree_util.tree_map(lambda a: a[c], tables)
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
        local_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + c * tri_chunk
        better = local_min < run_d2
        run_d2 = jnp.where(better, local_min, run_d2)
        run_best = jnp.where(better, local_arg, run_best)
        out_d2 = jax.lax.dynamic_update_slice(out_d2, run_d2[None], (b, 0))
        out_best = jax.lax.dynamic_update_slice(out_best, run_best[None],
                                                (b, 0))
        return (out_d2, out_best, run_d2, run_best, b), None

    carry, _ = jax.lax.scan(body, carry, (step_block, step_chunk))
    return carry


def _dist_stream(P_blocks, step_block, step_chunk, tables, tri_chunk: int):
    """Segmented min-distance stream, slabbed into bounded dispatches.
    Returns (out_d2, out_best) of shape (B+1, M); row B is the sink."""
    B, M, _ = P_blocks.shape
    carry = (
        jnp.full((B + 1, M), jnp.inf, jnp.float32),
        jnp.zeros((B + 1, M), jnp.int32),
        jnp.full((M,), jnp.inf, jnp.float32),
        jnp.zeros((M,), jnp.int32),
        jnp.int32(-1),
    )
    for s0 in range(0, len(step_block), _STREAM_SLAB):
        carry = _dist_stream_slab(
            carry, P_blocks,
            jnp.asarray(step_block[s0 : s0 + _STREAM_SLAB]),
            jnp.asarray(step_chunk[s0 : s0 + _STREAM_SLAB]),
            tables, tri_chunk,
        )
    return carry[0], carry[1]


@partial(jax.jit, donate_argnums=(0,))
def _wind_stream_slab(carry, P_blocks, step_block, step_chunk, wtab):
    """One slab of the segmented exact-winding stream (van Oosterom–
    Strackee per chunk). carry = (out_w, run_w, prev_b)."""
    B = P_blocks.shape[0]

    def body(carry, xs):
        out_w, run_w, prev_b = carry
        b, c = xs
        run_w = jnp.where(b != prev_b, 0.0, run_w)
        P = P_blocks[jnp.minimum(b, B - 1)]
        P2 = jnp.sum(P * P, axis=1, keepdims=True)
        chunk = jax.tree_util.tree_map(lambda a: a[c], wtab)
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
        run_w = run_w + jnp.sum(omega, axis=1)
        out_w = jax.lax.dynamic_update_slice(out_w, run_w[None], (b, 0))
        return (out_w, run_w, b), None

    carry, _ = jax.lax.scan(body, carry, (step_block, step_chunk))
    return carry


def _wind_stream(P_blocks, step_block, step_chunk, tables):
    """Segmented exact-winding stream, slabbed into bounded dispatches.
    Returns out_omega (B+1, M); row B is the padding sink."""
    B, M, _ = P_blocks.shape
    keys = ("v0", "v1", "v2", "K", "n00", "n11", "n22", "n01", "n12", "n20",
            "d0", "valid")
    wtab = {k: tables[k] for k in keys}
    carry = (
        jnp.zeros((B + 1, M), jnp.float32),
        jnp.zeros((M,), jnp.float32),
        jnp.int32(-1),
    )
    for s0 in range(0, len(step_block), _STREAM_SLAB):
        carry = _wind_stream_slab(
            carry, P_blocks,
            jnp.asarray(step_block[s0 : s0 + _STREAM_SLAB]),
            jnp.asarray(step_chunk[s0 : s0 + _STREAM_SLAB]),
            wtab,
        )
    return carry[0]


@jax.jit
def _dipole_all_blocks(P_blocks, far_mask, dip):
    """Dipole far-field winding for every block (lax.map; two matmuls per
    chunk group). far_mask: (B, Cp) 1.0 where the chunk is dipole-handled."""

    def one(xs):
        P, far_row = xs
        P2 = jnp.sum(P * P, axis=1, keepdims=True)

        def dip_body(acc, ys):
            cbar, mvec, cbar2, mdotc, fmask = ys
            Pc = _mm(P, cbar.T)
            Pm = _mm(P, mvec.T)
            r2 = jnp.maximum(cbar2 - 2.0 * Pc + P2, 1e-20)
            inv_r3 = jax.lax.rsqrt(r2) / r2
            contrib = (mdotc - Pm) * inv_r3 * fmask
            return acc + jnp.sum(contrib, axis=1), None

        n_groups = dip["cbar"].shape[0]
        far_groups = far_row.reshape(n_groups, -1)
        acc, _ = jax.lax.scan(
            dip_body, jnp.zeros((P.shape[0],), jnp.float32),
            (dip["cbar"], dip["m"], dip["cbar2"], dip["mdotc"], far_groups),
        )
        return acc

    return jax.lax.map(one, (P_blocks, far_mask))


def _stream_steps(keep: np.ndarray, sink: int):
    """Flatten a (B, C) keep matrix into block-major (step_block,
    step_chunk) int32 arrays, padded to a power of two with sink steps."""
    blocks, chunks = np.nonzero(keep)
    S = len(blocks)
    S_pad = 1 << max(0, (max(S, 1) - 1).bit_length())
    sb = np.full(S_pad, sink, np.int32)
    sc = np.zeros(S_pad, np.int32)
    sb[:S] = blocks
    sc[:S] = chunks
    return sb, sc, S


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def signed_distance_culled(
    points: np.ndarray,
    mesh_or_vertices,
    faces: Optional[np.ndarray] = None,
    *,
    return_normals: bool = True,
    point_chunk: int = 2048,
    tri_chunk: int = 1024,
    beta: float = 2.0,
    on_surface_eps: float = 1e-6,
    return_device: bool = False,
    coarse_bound: Optional[bool] = None,
    use_pallas: Optional[bool] = None,
    device_mesh=None,
    dist_tri_chunk: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact-distance, fast-winding signed distance for large meshes.

    Same contract as ops.sdf_exact.signed_distance (the igl.signed_distance
    role, reference datagenerator/data_generator.py:880-906): distances and
    the winner-triangle refinement are EXACT (conservative sphere culling);
    only the sign far field uses the dipole approximation, controlled by
    ``beta`` (near-exact threshold; 2.0 is the standard fast-winding-number
    setting and keeps winding error orders below the 2*pi sign margin).

    use_pallas: run the work streams through the fused VMEM kernels
    (ops/pallas_streams.py) instead of the XLA scans. None = auto: on
    when the default device is a TPU. The kernels pick identical winning
    triangles up to genuine last-ulp distance ties (see
    tests/test_pallas_streams.py).

    device_mesh: a jax.sharding.Mesh — shard the work streams over its
    'data' axis (contiguous Morton point-block ranges per device, tables
    replicated). Requires the pallas path; block count must divide.

    dist_tri_chunk: cull + run the DISTANCE stream at a finer chunk
    granularity than the winding partition (e.g. 128 vs 1024): smaller
    spheres cull ~2x more pairs, and the Pallas kernels make small tiles
    cheap. Winding/dipole stay at ``tri_chunk`` (the dipole accuracy and
    the O(N*C) dipole pass prefer coarse chunks). None = single
    granularity.
    """
    if isinstance(mesh_or_vertices, Mesh):
        vertices, faces = mesh_or_vertices.vertices, mesh_or_vertices.faces
    else:
        vertices = mesh_or_vertices
        assert faces is not None
    points = np.ascontiguousarray(points, dtype=np.float32)
    N = len(points)
    if N == 0:
        return np.zeros(0), np.zeros((0, 3))
    if len(faces) == 0:
        # empty mesh: no surface, everything is far field (+inf, outside);
        # _chunk_geometry would otherwise .max() over an empty array
        d = np.full(N, np.inf, dtype=np.float64)
        g = np.zeros((N, 3), dtype=np.float64)
        if return_device:
            return jnp.asarray(d), jnp.asarray(g)
        return d, g

    if len(faces) > _RESIDENT_MAX_FACES:
        # beyond HBM residency: stream face slabs (distances stay exact)
        d, g = signed_distance_streamed(
            points, vertices, faces, slab_faces=_RESIDENT_MAX_FACES,
            return_normals=return_normals, point_chunk=point_chunk,
            tri_chunk=tri_chunk, beta=beta, on_surface_eps=on_surface_eps,
            use_pallas=use_pallas,
        )
        if return_device:
            return jnp.asarray(d), (jnp.asarray(g) if return_normals
                                    else None)
        return d, g

    t0 = time.time()
    # Morton-sort faces (chunk compactness) and points (block coherence)
    vertices = np.asarray(vertices, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    tri_cent = vertices[faces].mean(axis=1)
    faces_sorted = faces[_morton_order(tri_cent)]
    order = _morton_order(points)

    tables_np, F = _triangle_tables(vertices, faces_sorted, tri_chunk)
    chunk_c, chunk_r, m, cbar = _chunk_geometry(vertices, faces_sorted,
                                                tri_chunk)
    C = len(chunk_c)
    t0 = _dbg(t0, f"host prep (F={F}, C={C})")

    M = point_chunk
    n_blocks = -(-N // M)
    n_blocks = 1 << max(0, (n_blocks - 1).bit_length())
    P_pad = np.empty((n_blocks * M, 3), dtype=np.float32)
    P_pad[:N] = points[order]
    P_pad[N:] = points[order[-1]]  # tight padding: repeat the last point
    P_blocks_np = P_pad.reshape(n_blocks, M, 3)
    P_blocks = jnp.asarray(P_blocks_np)

    tables = {k: jnp.asarray(v) for k, v in tables_np.items()}

    # exact coarse field -> tight per-point upper bounds. Auto-gate on the
    # total pair count: the prepass costs ~2 s of device compute but (on
    # axon, where the persistent compile cache does not work) also a fresh
    # ~1 min remote compile per process, so it must save more stream work
    # than that to pay
    if coarse_bound is None:
        coarse_bound = float(N) * float(F) >= 1e12
    # f32 rounding is relative to coordinate magnitude: slacks scale with
    # the scene so unrescaled meshes (coords >> 1) keep the exactness
    # contract (the winning chunk must never be culled)
    scale = float(max(np.abs(vertices).max(initial=0.0),
                      np.abs(points).max(initial=0.0), 1.0))
    if coarse_bound:
        # exact node sweep costs O(grid^3 * F): fine to ~1M faces, 16+ min
        # at 21M. Past that the sphere-node bound is within a chunk radius
        # of it (far below the lattice residual) at O(grid^3 * C) cost.
        if 32**3 * float(F) <= _COARSE_EXACT_MAX_PAIRS:
            ub = _coarse_upper_bound(P_pad, tables, tri_chunk,
                                     eps=1e-4 * scale)
        else:
            ub = _coarse_upper_bound_spheres(P_pad, chunk_c, chunk_r,
                                             eps=1e-4 * scale)
        UB_blocks = ub.reshape(n_blocks, M)
        t0 = _dbg(t0, "coarse upper bound")
    else:
        UB_blocks = np.full((n_blocks, M), np.inf, np.float32)

    kd, kw = _cull(P_blocks, UB_blocks, chunk_c, chunk_r, beta,
                   cbar=cbar, slack=_CULL_SLACK * scale)
    t0 = _dbg(t0, f"cull (B={n_blocks}, sum_kd={kd.sum()}, "
                  f"sum_kw={kw.sum()}, C={C})")

    # optional finer granularity for the distance side only
    if dist_tri_chunk is None or dist_tri_chunk == tri_chunk:
        d_tc, kd_d = tri_chunk, kd
        d_tables_np = tables_np
    else:
        d_tc = dist_tri_chunk
        d_tables_np, _ = _triangle_tables(vertices, faces_sorted, d_tc)
        cd, rd, _, cbard = _chunk_geometry(vertices, faces_sorted, d_tc)
        kd_d, _ = _cull(P_blocks, UB_blocks, cd, rd, beta, cbar=cbard,
                        slack=_CULL_SLACK * scale)
        t0 = _dbg(t0, f"fine cull (sum_kd={kd_d.sum()}, Cd={len(cd)}, "
                      f"pair_ratio={kd_d.sum() * d_tc / max(kd.sum() * tri_chunk, 1):.3f})")

    # dipole tables, group-padded (padding has zero moment -> zero term)
    Cp = max(_DIP_GROUP, -(-C // _DIP_GROUP) * _DIP_GROUP)
    dip_np = {
        "cbar": np.zeros((Cp, 3), np.float32),
        "m": np.zeros((Cp, 3), np.float32),
        "cbar2": np.zeros((Cp,), np.float32),
        "mdotc": np.zeros((Cp,), np.float32),
    }
    dip_np["cbar"][:C] = cbar
    dip_np["m"][:C] = m
    dip_np["cbar2"][:C] = np.einsum("ij,ij->i", cbar, cbar)
    dip_np["mdotc"][:C] = np.einsum("ij,ij->i", m, cbar)
    n_groups = Cp // _DIP_GROUP
    dip = {
        k: jnp.asarray(v.reshape(n_groups, _DIP_GROUP, *v.shape[1:]))
        for k, v in dip_np.items()
    }
    # winding partition: exact over the beta-near chunks, dipole for ~kw
    far_pad = np.zeros((n_blocks, Cp), np.float32)
    far_pad[:, :C] = (~kw).astype(np.float32)

    db, dc, Sd = _stream_steps(kd_d, n_blocks)
    wb, wc, Sw = _stream_steps(kw, n_blocks)
    if use_pallas is None:
        # TPU-family backends only (the axon relay registers as "axon")
        use_pallas = jax.default_backend() not in ("cpu", "gpu", "cuda")
    if use_pallas:
        # the kernels strip-tile (tri_chunk x point_chunk); a tiling the
        # strips can't cover exactly would silently drop triangles, so
        # divert those to the XLA streams instead (same results)
        from .pallas_streams import stream_tiling_ok

        if not (stream_tiling_ok(tri_chunk, M)
                and stream_tiling_ok(d_tc, M)):
            print(f"[sdf_culled] tri_chunk={tri_chunk}/{d_tc} or "
                  f"point_chunk={M} not kernel-tileable; using XLA streams",
                  flush=True)
            use_pallas = False

    def _xla_streams():
        d_tables = (tables if d_tc == tri_chunk
                    else {k: jnp.asarray(v) for k, v in d_tables_np.items()})
        _, best = _dist_stream(P_blocks, db, dc, d_tables, d_tc)
        w = _wind_stream(P_blocks, wb, wc, tables)
        return best, w

    if (use_pallas and device_mesh is not None
            and device_mesh.devices.size > 1
            and n_blocks % device_mesh.devices.size == 0):
        try:
            from .pallas_streams import (
                dist_stream_pallas_sharded,
                wind_stream_pallas_sharded,
            )

            _, out_best = dist_stream_pallas_sharded(
                P_blocks_np, db, dc, d_tables_np, d_tc, device_mesh
            )
            out_w = wind_stream_pallas_sharded(
                P_blocks_np, wb, wc, tables_np, tri_chunk, device_mesh
            )
            # sharded drivers return (B, M) host arrays without the sink row
            out_best = jnp.asarray(
                np.concatenate([out_best, np.zeros((1, M), np.int32)])
            )
            out_w = jnp.asarray(
                np.concatenate([out_w, np.zeros((1, M), np.float32)])
            )
        except Exception as exc:  # pragma: no cover - compiler-dependent
            # same guarantee as single-device: a Mosaic lowering regression
            # must never take down multi-chip labeling
            print(f"[sdf_culled] sharded pallas streams unavailable "
                  f"({exc!r}); falling back to XLA streams", flush=True)
            out_best, out_w = _xla_streams()
    elif use_pallas:
        try:
            from .pallas_streams import (
                dist_stream_pallas,
                wind_stream_pallas,
            )

            _, out_best = dist_stream_pallas(P_blocks_np, db, dc,
                                             d_tables_np, d_tc)
            out_w = wind_stream_pallas(P_blocks_np, wb, wc, tables_np,
                                       tri_chunk)
        except Exception as exc:  # pragma: no cover - compiler-dependent
            # never let a Mosaic lowering regression take down labeling:
            # fall back to the XLA streams (slower, same results)
            print(f"[sdf_culled] pallas streams unavailable ({exc!r}); "
                  "falling back to XLA streams", flush=True)
            out_best, out_w = _xla_streams()
    else:
        out_best, out_w = _xla_streams()
    omega_far = _dipole_all_blocks(P_blocks, jnp.asarray(far_pad), dip)
    best_idx = jnp.clip(out_best[:n_blocks].reshape(-1)[:N], 0, F - 1)
    omega = (out_w[:n_blocks] + omega_far).reshape(-1)[:N]
    # force the streams before timing attribution (fetch happens in refine)
    best_idx.block_until_ready()
    t0 = _dbg(t0, f"streams (Sd={Sd}, Sw={Sw})")

    tri_flat = jnp.asarray(
        vertices[faces_sorted].astype(np.float32).reshape(-1)
    )
    flat = jnp.asarray(P_pad)
    P_cols = (flat[:N, 0], flat[:N, 1], flat[:N, 2])
    sdf_s, grads_s = _refine_device(P_cols, tri_flat, best_idx, omega,
                                    on_surface_eps)

    # unsort back to caller order
    inv = jnp.asarray(np.argsort(order))
    sdf = jnp.take(sdf_s, inv)
    grads = tuple(jnp.take(g, inv) for g in grads_s)
    t0 = _dbg(t0, "refine+unsort")

    if return_device:
        return sdf, (jnp.stack(grads, axis=-1) if return_normals else None)
    if not return_normals:
        return np.asarray(sdf, dtype=np.float64), None
    grad = np.stack([np.asarray(g) for g in grads], axis=-1).astype(np.float64)
    return np.asarray(sdf, dtype=np.float64), grad


# ---------------------------------------------------------------------------
# Host-streamed face slabs: meshes past HBM residency
# ---------------------------------------------------------------------------

class StreamedLabeler:
    """Exact signed-distance accumulation across face slabs AND mesh shards.

    The streamed path's running state — per-point (min d², winner-triangle
    coordinates) and winding-number sum — combines across *any* partition of
    a watertight surface (or a union of watertight components) into pieces:
    face slabs of one resident mesh, or whole mesh files that never
    co-reside in host RAM. Construct once with the query points, ``add()``
    each vertex/face shard, then ``finish()`` refines on the stored winner
    triangles and signs by the accumulated winding.

    Exactness argument is the same as ``signed_distance_culled``: each
    shard's cull bound is a true upper bound on the *global* minimum
    (the shard's own coarse sphere bound, tightened by the best distance
    found in earlier shards), so the winner triangle can never be culled;
    winding numbers are additive over any disjoint face partition.

    Role match: reference datagenerator/data_generator.py:674-676 ("DAVID
    with 1 billion triangles") — the igl AABB tree needs the whole soup in
    host RAM; this needs only one shard at a time (and only one slab at a
    time on device).
    """

    def __init__(
        self,
        points: np.ndarray,
        *,
        slab_faces: int = 1 << 24,
        point_chunk: int = 2048,
        tri_chunk: int = 1024,
        beta: float = 2.0,
        on_surface_eps: float = 1e-6,
        use_pallas: Optional[bool] = None,
    ):
        points = np.ascontiguousarray(points, dtype=np.float32)
        self.N = len(points)
        self.slab_faces = slab_faces
        self.tri_chunk = tri_chunk
        self.beta = beta
        self.on_surface_eps = on_surface_eps
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu", "gpu", "cuda")
        if use_pallas:
            from .pallas_streams import stream_tiling_ok

            if not stream_tiling_ok(tri_chunk, point_chunk):
                print(f"[sdf_culled] tri_chunk={tri_chunk} or "
                      f"point_chunk={point_chunk} not kernel-tileable; "
                      "using XLA streams", flush=True)
                use_pallas = False
        self.use_pallas = use_pallas
        if self.N == 0:
            return
        self.order = _morton_order(points)
        M = point_chunk
        self.M = M
        n_blocks = -(-self.N // M)
        n_blocks = 1 << max(0, (n_blocks - 1).bit_length())
        self.n_blocks = n_blocks
        P_pad = np.empty((n_blocks * M, 3), dtype=np.float32)
        P_pad[: self.N] = points[self.order]
        P_pad[self.N:] = points[self.order[-1]]
        self.P_pad = P_pad
        self.P_blocks_np = P_pad.reshape(n_blocks, M, 3)
        self.P_blocks = jnp.asarray(self.P_blocks_np)
        self.point_scale = float(max(np.abs(points).max(initial=0.0), 1.0))
        self.run_d2 = np.full(n_blocks * M, np.inf, np.float32)
        self.run_w = np.zeros(n_blocks * M, np.float32)
        # winner triangle coordinates, sorted-point order (N, 9) — stored
        # per improvement so shards can be discarded after their add()
        self.run_tri = np.zeros((self.N, 9), np.float32)

    def add(self, vertices, faces) -> None:
        """Accumulate one shard: a (V, 3)/(F, 3) piece of the geometry."""
        if self.N == 0:
            return
        vertices = np.asarray(vertices, dtype=np.float64)
        faces = np.asarray(faces, dtype=np.int64)
        F = len(faces)
        if F == 0:
            return
        t0 = time.time()
        tri_cent = vertices[faces].mean(axis=1)
        faces_sorted = faces[_morton_order(tri_cent)]
        tri_chunk = self.tri_chunk
        chunk_c, chunk_r, mom, cbar = _chunk_geometry(vertices, faces_sorted,
                                                      tri_chunk)
        C = len(chunk_c)
        chunks_per_slab = max(1, self.slab_faces // tri_chunk)
        t0 = _dbg(t0, f"host prep (F={F}, C={C})")

        n_blocks, M, N = self.n_blocks, self.M, self.N
        P_blocks, P_blocks_np = self.P_blocks, self.P_blocks_np
        scale = float(max(np.abs(vertices).max(initial=0.0),
                          self.point_scale))
        ub_shard = _coarse_upper_bound_spheres(self.P_pad, chunk_c, chunk_r,
                                               eps=1e-4 * scale)
        t0 = _dbg(t0, "coarse upper bound (shard spheres)")
        use_pallas = self.use_pallas

        for c0 in range(0, C, chunks_per_slab):
            c1 = min(C, c0 + chunks_per_slab)
            f0, f1 = c0 * tri_chunk, min(F, c1 * tri_chunk)
            tables_np, _ = _triangle_tables(vertices, faces_sorted[f0:f1],
                                            tri_chunk)
            tables = {k: jnp.asarray(v) for k, v in tables_np.items()}
            # slab upper bound: the shard coarse bound, tightened by the
            # running best distance (a true upper bound on the global min)
            ub_now = np.minimum(ub_shard, np.sqrt(self.run_d2)
                                + np.float32(1e-4 * scale))
            UB_blocks = ub_now.reshape(n_blocks, M)
            kd, kw = _cull(P_blocks, UB_blocks, chunk_c[c0:c1],
                           chunk_r[c0:c1], self.beta, cbar=cbar[c0:c1],
                           slack=_CULL_SLACK * scale)
            t0 = _dbg(t0, f"slab {c0 // chunks_per_slab}: cull "
                          f"(sum_kd={kd.sum()}, sum_kw={kw.sum()})")

            Cs = c1 - c0
            Cp = max(_DIP_GROUP, -(-Cs // _DIP_GROUP) * _DIP_GROUP)
            dip_np = {
                "cbar": np.zeros((Cp, 3), np.float32),
                "m": np.zeros((Cp, 3), np.float32),
                "cbar2": np.zeros((Cp,), np.float32),
                "mdotc": np.zeros((Cp,), np.float32),
            }
            dip_np["cbar"][:Cs] = cbar[c0:c1]
            dip_np["m"][:Cs] = mom[c0:c1]
            dip_np["cbar2"][:Cs] = np.einsum("ij,ij->i", cbar[c0:c1],
                                             cbar[c0:c1])
            dip_np["mdotc"][:Cs] = np.einsum("ij,ij->i", mom[c0:c1],
                                             cbar[c0:c1])
            n_groups = Cp // _DIP_GROUP
            dip = {k: jnp.asarray(v.reshape(n_groups, _DIP_GROUP,
                                            *v.shape[1:]))
                   for k, v in dip_np.items()}
            far_pad = np.zeros((n_blocks, Cp), np.float32)
            far_pad[:, :Cs] = (~kw).astype(np.float32)

            db, dc, Sd = _stream_steps(kd, n_blocks)
            wb, wc, Sw = _stream_steps(kw, n_blocks)
            if use_pallas:
                try:
                    from .pallas_streams import (
                        dist_stream_pallas,
                        wind_stream_pallas,
                    )

                    out_d2, out_best = dist_stream_pallas(
                        P_blocks_np, db, dc, tables_np, tri_chunk)
                    out_w = wind_stream_pallas(P_blocks_np, wb, wc,
                                               tables_np, tri_chunk)
                except Exception as exc:  # pragma: no cover
                    print(f"[sdf_culled] pallas streams unavailable "
                          f"({exc!r}); falling back to XLA streams",
                          flush=True)
                    use_pallas = self.use_pallas = False
            if not use_pallas:
                out_d2, out_best = _dist_stream(P_blocks, db, dc, tables,
                                                tri_chunk)
                out_w = _wind_stream(P_blocks, wb, wc, tables)
            omega_far = _dipole_all_blocks(P_blocks, jnp.asarray(far_pad),
                                           dip)
            d2_s = np.asarray(out_d2[:n_blocks]).reshape(-1)
            best_s = np.asarray(out_best[:n_blocks]).reshape(-1)
            w_s = (np.asarray(out_w[:n_blocks])
                   + np.asarray(omega_far)).reshape(-1)
            better = d2_s < self.run_d2
            self.run_d2 = np.where(better, d2_s, self.run_d2)
            self.run_w += w_s
            # gather the improved winners' coordinates NOW — the shard's
            # vertex/face arrays are gone by finish() time
            bn = better[:N]
            if bn.any():
                win = np.clip(best_s[:N][bn] + f0, 0, F - 1)
                self.run_tri[bn] = (
                    vertices[faces_sorted[win]]
                    .astype(np.float32).reshape(-1, 9))
            t0 = _dbg(t0, f"slab {c0 // chunks_per_slab}: streams "
                          f"(Sd={Sd}, Sw={Sw})")

    def finish(self, return_normals: bool = True):
        """Refine on the accumulated winner triangles; sign by winding."""
        if self.N == 0:
            return np.zeros(0), np.zeros((0, 3))
        N = self.N
        if not np.isfinite(self.run_d2[:N]).any():
            return np.full(N, np.inf), np.zeros((N, 3))
        t0 = time.time()
        tri_flat = jnp.asarray(self.run_tri.reshape(-1))
        flat = jnp.asarray(self.P_pad)
        P_cols = (flat[:N, 0], flat[:N, 1], flat[:N, 2])
        sdf_s, grads_s = _refine_device(
            P_cols, tri_flat, jnp.arange(N, dtype=jnp.int32),
            jnp.asarray(self.run_w[:N]), self.on_surface_eps,
        )
        inv = jnp.asarray(np.argsort(self.order))
        sdf = jnp.take(sdf_s, inv)
        grads = tuple(jnp.take(g, inv) for g in grads_s)
        t0 = _dbg(t0, "refine+unsort")
        if not return_normals:
            return np.asarray(sdf, dtype=np.float64), None
        grad = np.stack([np.asarray(g) for g in grads],
                        axis=-1).astype(np.float64)
        return np.asarray(sdf, dtype=np.float64), grad


def signed_distance_streamed(
    points: np.ndarray,
    mesh_or_vertices,
    faces: Optional[np.ndarray] = None,
    *,
    slab_faces: int = 1 << 24,
    return_normals: bool = True,
    point_chunk: int = 2048,
    tri_chunk: int = 1024,
    beta: float = 2.0,
    on_surface_eps: float = 1e-6,
    use_pallas: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """signed_distance_culled for meshes whose triangle tables exceed HBM.

    Faces are Morton-sorted GLOBALLY (slab spatial compactness), then
    processed in ``slab_faces``-sized resident slabs: per slab, the same
    cull + segmented streams as signed_distance_culled; the running
    per-point (min d2, winner triangle) and winding sum combine across
    slabs on host, and each slab's upper bound is tightened by the best
    distance found so far (sqrt of the running min — slabs after the
    first cull progressively harder). Distances stay EXACT for the same
    reason as the resident path: a true upper bound can never cull the
    winner. One final refinement runs on the gathered winner triangles.

    Role match: reference datagenerator/data_generator.py:674-676 ("DAVID
    with 1 billion triangles") — the igl AABB tree is host-RAM-bound the
    same way; this streams the TPU-resident working set.
    """
    if isinstance(mesh_or_vertices, Mesh):
        vertices, faces = mesh_or_vertices.vertices, mesh_or_vertices.faces
    else:
        vertices = mesh_or_vertices
        assert faces is not None
    points = np.ascontiguousarray(points, dtype=np.float32)
    if len(points) == 0:
        return np.zeros(0), np.zeros((0, 3))
    acc = StreamedLabeler(
        points, slab_faces=slab_faces, point_chunk=point_chunk,
        tri_chunk=tri_chunk, beta=beta, on_surface_eps=on_surface_eps,
        use_pallas=use_pallas,
    )
    acc.add(vertices, faces)
    return acc.finish(return_normals=return_normals)


def signed_distance_files(
    points: np.ndarray,
    mesh_paths,
    *,
    slab_faces: int = 1 << 24,
    return_normals: bool = True,
    point_chunk: int = 2048,
    tri_chunk: int = 1024,
    beta: float = 2.0,
    on_surface_eps: float = 1e-6,
    use_pallas: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact signed distance against a geometry sharded across mesh FILES.

    The shards together must form a watertight surface (or a union of
    watertight components) — e.g. a massive scan exported as many .ply
    pieces (the reference's DAVID corpus, data_generator.py:674-676,
    :745-801). Only one shard is loaded into host RAM at a time; each is
    streamed through the device in ``slab_faces`` slabs. Distances are the
    exact minimum over ALL shards and signs come from the summed winding
    number, so per-file labeling artifacts (open boundaries of a shard)
    cannot flip signs the way per-shard signed distances would.
    """
    from ..geometry.mesh_io import load_mesh

    acc = StreamedLabeler(
        points, slab_faces=slab_faces, point_chunk=point_chunk,
        tri_chunk=tri_chunk, beta=beta, on_surface_eps=on_surface_eps,
        use_pallas=use_pallas,
    )
    for path in mesh_paths:
        mesh = load_mesh(str(path))
        acc.add(mesh.vertices, mesh.faces)
        del mesh
    return acc.finish(return_normals=return_normals)
