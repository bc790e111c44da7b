"""Labeled point sampling for SDF training.

Vectorised rebuild of the reference sampler
(reference datagenerator/data_generator.py:810-910 and helpers :13-104):
the reference loops over every triangle in Python (its hot loop #1,
SURVEY.md §3.1); here the whole sweep is batched numpy on the host and the
signed-distance labels come from the on-device exact SDF
(ops/sdf_exact.signed_distance) instead of host libigl.

Distribution semantics preserved:
  * uniform points ~ U(-1, 1)^3                       (data_generator.py:841)
  * per-triangle surface points with barycentric weights
    w = u/(u1+u2+u3), u ~ U(0,1)^3                    (:858-860) — NOT
    area-uniform; the reference's bias toward triangle centers is kept (an
    area-weighted mode is available via area_weighted=True).
  * narrow-band points: barycentric point + face normal * U(-width, width)
    (:865-873, create_narrow_band :42-60); the reference zips
    num_points_surface barycentric points against num_points_narrow_band
    widths, truncating to the min (:869) — same here.
  * dataset columns x,y,z,S,nx,ny,nz; seed RANDOM_SEED_DATA_GENERATION=100.

The exact per-sample RNG stream differs from the reference (theirs is an
artifact of loop order); distributions are identical.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import numpy as np
import pandas as pd

from ..geometry.mesh_io import Mesh, load_mesh
from ..ops.sdf_exact import signed_distance
from ..utils.constants import RANDOM_SEED_DATA_GENERATION

COLUMNS = ["x", "y", "z", "S", "nx", "ny", "nz"]


def _as_mesh(geometry: Union[str, Mesh]) -> Mesh:
    return geometry if isinstance(geometry, Mesh) else load_mesh(geometry)


def _barycentric(rng: np.random.Generator, n_tri: int, k: int) -> np.ndarray:
    """(F, k, 3) barycentric weights, u/(sum u) like the reference (:858-860)."""
    u = rng.uniform(0.0, 1.0, size=(n_tri, k, 3))
    return u / u.sum(axis=-1, keepdims=True)


def sample_surface_points(
    mesh: Mesh,
    points_per_triangle: int,
    rng: np.random.Generator,
    area_weighted: bool = False,
    total_points: Optional[int] = None,
) -> np.ndarray:
    """Barycentric surface samples. Default: fixed count per triangle
    (reference behavior); area_weighted draws triangle indices ∝ area for a
    statistically uniform surface measure."""
    tri = mesh.triangles  # (F, 3, 3)
    if area_weighted:
        n = total_points or points_per_triangle * len(tri)
        areas = mesh.face_areas()
        probs = areas / areas.sum()
        idx = rng.choice(len(tri), size=n, p=probs)
        # sqrt trick = uniform over each triangle
        r1 = np.sqrt(rng.uniform(size=n))
        r2 = rng.uniform(size=n)
        w = np.stack([1 - r1, r1 * (1 - r2), r1 * r2], axis=1)
        return np.einsum("nc,ncd->nd", w, tri[idx])
    bary = _barycentric(rng, len(tri), points_per_triangle)
    return np.einsum("fkc,fcd->fkd", bary, tri).reshape(-1, 3)


def sample_narrow_band_points(
    mesh: Mesh,
    points_per_triangle: int,
    width_count: int,
    width: float,
    rng: np.random.Generator,
) -> np.ndarray:
    """Surface samples offset by face-normal * U(-width, width). The zip
    truncation quirk (count = min of the two, data_generator.py:869) is
    reproduced so datasets are size-compatible."""
    k = min(points_per_triangle, width_count)
    tri = mesh.triangles
    bary = _barycentric(rng, len(tri), k)
    pts = np.einsum("fkc,fcd->fkd", bary, tri)  # (F, k, 3)
    normals = mesh.face_normals()  # (F, 3); degenerate -> 0 like calculate_normal
    areas2 = np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
    )
    normals = np.where(areas2[:, None] > 0, normals, 0.0)
    widths = rng.uniform(-width, width, size=(len(tri), k))
    return (pts + widths[..., None] * normals[:, None, :]).reshape(-1, 3)


def _label(points: np.ndarray, mesh: Mesh) -> pd.DataFrame:
    """Attach exact signed distance + normals (device-accelerated).

    Mirrors write_signed_distance's empty-input sentinel
    (data_generator.py:882-886: a single (0,0,0) point labeled S=-0.5, n=0).
    Chunking to 100k-point batches is handled inside signed_distance.
    """
    if len(points) == 0:
        points = np.zeros((1, 3), dtype=np.float64)
        S = np.array([-0.5])
        n = np.zeros((1, 3))
    else:
        S, n = signed_distance(points, mesh)
    data = np.column_stack((points, S, n))
    return pd.DataFrame(data, columns=COLUMNS)


def generate_signed_distance_data(
    geometry: Union[str, Mesh],
    num_points_uniform: int,
    num_points_surface: int,
    num_points_narrow_band: int,
    dense_width: float = 0.1,
    area_weighted: bool = False,
    seed: int = RANDOM_SEED_DATA_GENERATION,
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Main 3D sampler (cf. data_generator.py:810-910).

    Returns (df_uniform, df_on_surface, df_narrow_band), each with columns
    x,y,z,S,nx,ny,nz."""
    mesh = _as_mesh(geometry)
    rng = np.random.default_rng(seed)
    uniform_pts = rng.uniform(-1.0, 1.0, size=(int(num_points_uniform), 3))
    surface_pts = sample_surface_points(
        mesh, num_points_surface, rng, area_weighted=area_weighted
    )
    narrow_pts = sample_narrow_band_points(
        mesh, num_points_surface, num_points_narrow_band, dense_width, rng
    )
    df_on_surface = _label(surface_pts, mesh)
    df_uniform = _label(uniform_pts, mesh)
    df_narrow = _label(narrow_pts, mesh)
    return df_uniform, df_on_surface, df_narrow


def generate_signed_distance(
    query_points: np.ndarray, geometry: Union[str, Mesh]
) -> pd.DataFrame:
    """Label arbitrary query points (cf. data_generator.py:273-301)."""
    return _label(np.asarray(query_points, dtype=np.float64), _as_mesh(geometry))


def generate_occupancy(cube_size: int, geometry: Union[str, Mesh]) -> pd.DataFrame:
    """Dense-grid occupancy (sign of S) (cf. data_generator.py:307-350)."""
    axis = np.linspace(-1, 1, cube_size)
    g = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), axis=-1).reshape(-1, 3)
    mesh = _as_mesh(geometry)
    S, _ = signed_distance(g, mesh)
    occ = np.sign(S)
    return pd.DataFrame(
        np.column_stack([g, occ]), columns=["x", "y", "z", "occupancy"]
    )


# ---------------------------------------------------------------------------
# Analytic fixtures (correctness oracles — cf. SURVEY.md §4)
# ---------------------------------------------------------------------------

def generate_analytical_sphere(
    uniform_points: int,
    narrow_points: int,
    on_surface_points: int,
    save_path: Optional[str] = None,
    seed: int = RANDOM_SEED_DATA_GENERATION,
):
    """Analytic sphere r=0.5 dataset incl. extra pole/axis points
    (cf. data_generator.py:392-466). Normals are unit (the reference stored
    the un-normalised point as 'normal'; unit normals are what the losses
    consume — intentional fix)."""
    radius = 0.5
    rng = np.random.default_rng(seed)

    def spherical(r):
        n = len(r)
        theta = rng.uniform(0, 2 * np.pi, n)
        phi = rng.uniform(0, np.pi, n)
        return np.column_stack(
            [r * np.sin(phi) * np.cos(theta), r * np.sin(phi) * np.sin(theta), r * np.cos(phi)]
        )

    def frame(pts):
        S = np.linalg.norm(pts, axis=1) - radius
        norms = np.linalg.norm(pts, axis=1, keepdims=True)
        n = np.divide(pts, norms, out=np.zeros_like(pts), where=norms > 0)
        return pd.DataFrame(np.column_stack([pts, S, n]), columns=COLUMNS)

    df_uniform = frame(spherical(rng.uniform(-1, 1, uniform_points)))
    df_narrow = frame(spherical(rng.uniform(0.846, 0.854, narrow_points)))

    surf = spherical(radius * np.ones(on_surface_points))
    n_extra = int(0.1 * on_surface_points)
    if n_extra > 0:
        axes = np.array(
            [[0, 0, 1], [0, 0, -1], [0, 1, 0], [0, -1, 0], [1, 0, 0], [-1, 0, 0]],
            dtype=np.float64,
        ) * radius
        jitter = rng.normal(0, 0.001, size=(6, n_extra, 3))
        near = axes[:, None, :] + jitter
        near = near / np.linalg.norm(near, axis=-1, keepdims=True) * radius
        surf = np.vstack([surf, near.reshape(-1, 3)])
    df_surface = frame(surf)

    if save_path:
        for name, df in [("uniform", df_uniform), ("surface", df_surface), ("narrow", df_narrow)]:
            df.to_csv(os.path.join(save_path, f"{name}.csv"), index=True)
    return df_uniform, df_narrow, df_surface


def generate_points_circle(
    uniform_points: int,
    on_surface_points: int,
    narrow_points: int,
    width: float,
    save_path: Optional[str] = None,
    seed: int = RANDOM_SEED_DATA_GENERATION,
):
    """2D analytic circle r=sqrt(2/pi) at z=0 (cf. data_generator.py:468-536)."""
    radius = np.sqrt(2.0 / np.pi)
    rng = np.random.default_rng(seed)

    def frame(pts):
        S = np.linalg.norm(pts, axis=1) - radius
        norms = np.linalg.norm(pts, axis=1, keepdims=True)
        n = np.divide(pts, norms, out=np.zeros_like(pts), where=norms > 0)
        return pd.DataFrame(np.column_stack([pts, S, n]), columns=COLUMNS)

    xy = rng.uniform(-1, 1, size=(uniform_points, 2))
    df_uniform = frame(np.column_stack([xy, np.zeros(uniform_points)]))

    r = rng.uniform(radius - width, radius + width, narrow_points)
    th = rng.uniform(0, 2 * np.pi, narrow_points)
    df_narrow = frame(
        np.column_stack([r * np.cos(th), r * np.sin(th), np.zeros(narrow_points)])
    )

    th = rng.uniform(0, 2 * np.pi, on_surface_points)
    df_surface = frame(
        np.column_stack(
            [radius * np.cos(th), radius * np.sin(th), np.zeros(on_surface_points)]
        )
    )

    if save_path:
        for name, df in [("uniform", df_uniform), ("surface", df_surface), ("narrow", df_narrow)]:
            df.to_csv(os.path.join(save_path, f"{name}.csv"), index=True)
    return df_uniform, df_narrow, df_surface


def write_signed_distance_mismatch(
    query_points: np.ndarray,
    geometry: Union[str, Mesh],
    save_directory: str,
) -> str:
    """Label the post-process mismatching coordinates and append them as
    mismatch.csv so the next training round (mismatchuse=True) focuses on
    them (cf. reference data_generator.py:643-671 write_signed_distance_mismatch
    + load_data.py:44-45)."""
    df = _label(np.asarray(query_points, dtype=np.float64), _as_mesh(geometry))
    path = os.path.join(save_directory, "mismatch.csv")
    df.to_csv(path)
    return path


def augment_mismatch_from_postprocess(trainer, mesh_path: Optional[str] = None) -> str:
    """Close the mismatch loop: read mismatching_co-ordinates1.csv written by
    post_process, label those points exactly, write mismatch.csv into the
    trainer's data path."""
    import pandas as pd

    coords_csv = os.path.join(
        trainer.postprocess_save_path, "mismatching_co-ordinates1.csv"
    )
    coords = pd.read_csv(coords_csv)[["x", "y", "z"]].to_numpy()
    if mesh_path is None:
        mesh_path = getattr(trainer, "rescaled_path", None) or trainer.config.geometry
    return write_signed_distance_mismatch(coords, mesh_path, trainer.data_path)
