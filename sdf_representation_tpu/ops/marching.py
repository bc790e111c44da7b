"""Isosurface extraction: vectorised marching tetrahedra.

Replaces skimage.measure.marching_cubes in the reference pipeline
(reference executor/executor.py:388). Implemented from scratch (scikit-image
is not in the TPU image): each grid cube that straddles the level set is split
into 6 tetrahedra around the main diagonal; each tetrahedron contributes 1-2
triangles with vertices linearly interpolated on its sign-changing edges.
Marching tetrahedra needs no 256-case table, produces a watertight surface
within the decomposition, and vectorises cleanly:

  1. active-cube prefilter (corner min/max straddle test) — the expensive
     per-tet work only touches the O(n^2) surface shell, not the n^3 volume;
  2. all remaining tets processed as flat numpy arrays;
  3. vertex welding via unique (edge-endpoint-pair) keys;
  4. triangle orientation fixed globally: normal . (outside - inside) > 0,
     so normals point toward positive field values (SDF outside).

API mirrors skimage: marching_cubes(volume, level, spacing, origin) ->
(vertices, faces).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# corner offsets, bit order (x, y, z)
_CORNERS = np.array(
    [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], dtype=np.int64
)
# index of corner (x,y,z) in _CORNERS = x*4 + y*2 + z
# 6-tet decomposition around the 0-7 main diagonal
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    dtype=np.int64,
)
# tet edges
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int64
)

# case tables: for each of the 16 inside-bitmasks, triangles as triples of
# tet-edge ids. Orientation is fixed numerically afterwards.
_CASE_TRIS = {
    0b0001: [(0, 1, 2)],                  # corner 0 inside  (edges 0-1,0-2,0-3)
    0b0010: [(0, 3, 4)],                  # corner 1
    0b0100: [(1, 3, 5)],                  # corner 2
    0b1000: [(2, 4, 5)],                  # corner 3
    0b0011: [(1, 2, 4), (1, 4, 3)],       # corners 0,1 -> edges 02,03,12,13
    0b0101: [(0, 2, 5), (0, 5, 3)],       # corners 0,2 -> edges 01,03,12,23
    0b1001: [(0, 1, 5), (0, 5, 4)],       # corners 0,3 -> edges 01,02,13,23
    0b0110: [(0, 1, 5), (0, 5, 4)],       # corners 1,2 -> edges 01,02,23,13
    0b1010: [(0, 2, 5), (0, 5, 3)],       # corners 1,3
    0b1100: [(1, 2, 4), (1, 4, 3)],       # corners 2,3
    0b1110: [(0, 1, 2)],                  # corner 0 outside
    0b1101: [(0, 3, 4)],
    0b1011: [(1, 3, 5)],
    0b0111: [(2, 4, 5)],
}


def marching_cubes(
    volume: np.ndarray,
    level: float = 0.0,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the `level` isosurface of a (nx, ny, nz) scalar volume.

    Returns (vertices (V,3) float64 in world coords, faces (F,3) int64),
    faces oriented with normals pointing toward values > level.
    """
    vol = np.asarray(volume, dtype=np.float64)
    nx, ny, nz = vol.shape
    if min(nx, ny, nz) < 2:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)

    # ---- 1. active cubes ------------------------------------------------
    c = [
        vol[dx : nx - 1 + dx, dy : ny - 1 + dy, dz : nz - 1 + dz]
        for dx, dy, dz in _CORNERS
    ]
    cmin = np.minimum.reduce(c)
    cmax = np.maximum.reduce(c)
    active = np.argwhere((cmin <= level) & (cmax > level))  # (A, 3)
    if len(active) == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)

    # global grid-point ids of the 8 corners of each active cube
    def gid(ix, iy, iz):
        return (ix * ny + iy) * nz + iz

    corner_ids = np.stack(
        [
            gid(active[:, 0] + dx, active[:, 1] + dy, active[:, 2] + dz)
            for dx, dy, dz in _CORNERS
        ],
        axis=1,
    )  # (A, 8)

    # ---- 2. tets --------------------------------------------------------
    tet_ids = corner_ids[:, _TETS].reshape(-1, 4)  # (A*6, 4) global point ids
    flat = vol.reshape(-1)
    tet_vals = flat[tet_ids]  # (T, 4)
    inside = tet_vals < level
    case = (
        inside[:, 0] * 1 + inside[:, 1] * 2 + inside[:, 2] * 4 + inside[:, 3] * 8
    )

    tri_edge_list = []  # (n_tris, 3) tet-edge ids
    tri_tet_idx = []  # (n_tris,) index into tets
    for case_id, tris in _CASE_TRIS.items():
        sel = np.nonzero(case == case_id)[0]
        if len(sel) == 0:
            continue
        for tri in tris:
            tri_edge_list.append(np.broadcast_to(np.asarray(tri), (len(sel), 3)))
            tri_tet_idx.append(sel)
    if not tri_edge_list:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)
    tri_edges = np.concatenate(tri_edge_list)  # (Ntri, 3)
    tri_tets = np.concatenate(tri_tet_idx)  # (Ntri,)

    # ---- 3. edge vertices + welding ------------------------------------
    # edge endpoints as global point ids
    e_a = tet_ids[tri_tets[:, None], _TET_EDGES[tri_edges][..., 0]]  # (Ntri, 3)
    e_b = tet_ids[tri_tets[:, None], _TET_EDGES[tri_edges][..., 1]]
    lo = np.minimum(e_a, e_b).reshape(-1)
    hi = np.maximum(e_a, e_b).reshape(-1)
    keys = lo * (nx * ny * nz) + hi
    uniq, inv = np.unique(keys, return_inverse=True)
    u_lo = uniq // (nx * ny * nz)
    u_hi = uniq % (nx * ny * nz)

    va, vb = flat[u_lo], flat[u_hi]
    denom = vb - va
    t = np.where(np.abs(denom) > 1e-300, (level - va) / denom, 0.5)
    t = np.clip(t, 0.0, 1.0)

    def unflatten(g):
        return np.stack([g // (ny * nz), (g // nz) % ny, g % nz], axis=1).astype(
            np.float64
        )

    pa, pb = unflatten(u_lo), unflatten(u_hi)
    verts_idx = pa + t[:, None] * (pb - pa)  # index space
    faces = inv.reshape(-1, 3)

    # ---- 4. orientation -------------------------------------------------
    vpos = verts_idx[faces]  # (Ntri, 3, 3)
    normal = np.cross(vpos[:, 1] - vpos[:, 0], vpos[:, 2] - vpos[:, 0])
    # direction from inside corners toward outside corners of the owning tet
    tpts = unflatten(tet_ids[tri_tets].reshape(-1)).reshape(-1, 4, 3)
    tvals = tet_vals[tri_tets]
    w_out = (tvals >= level).astype(np.float64)
    w_in = 1.0 - w_out
    cent_out = (tpts * w_out[..., None]).sum(1) / np.maximum(
        w_out.sum(1, keepdims=True), 1e-300
    )
    cent_in = (tpts * w_in[..., None]).sum(1) / np.maximum(
        w_in.sum(1, keepdims=True), 1e-300
    )
    flip = np.einsum("ij,ij->i", normal, cent_out - cent_in) < 0
    faces[flip] = faces[flip][:, ::-1]

    # drop degenerate (zero-area after welding) triangles
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[ok]

    verts_world = verts_idx * np.asarray(spacing) + np.asarray(origin)
    return verts_world, faces.astype(np.int64)
