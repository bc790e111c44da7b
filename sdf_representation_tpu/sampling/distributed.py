"""Multi-file ("distributed") geometry sampling with resumable progress.

Rebuild of the reference's billion-triangle pipeline
(reference datagenerator/data_generator.py:678-807: glob sub-directories for
.ply shards, global bbox with margin, `processed_files.log` resume journal,
corrupt-mesh skipping, append-to-surface.csv). Fixes folded in:

  * compute_min_max returned (max, min) but the caller unpacked (min, max)
    (data_generator.py:390 vs :702) — corrected and regression-tested.
  * per-file work can be sharded across hosts via (host_id, num_hosts) so a
    multi-host TPU pod can sample cooperatively (the reference is
    single-process).
"""

from __future__ import annotations

import glob
import os
from typing import Tuple

import numpy as np
import pandas as pd

from ..geometry.mesh_io import Mesh, load_mesh
from ..utils.constants import RANDOM_SEED_DATA_GENERATION
from ..utils.files import create_directory


def compute_min_max(geometry_dir: str, cache_name: str = "max_min.txt") -> Tuple[float, float]:
    """Global vertex (min, max) over all .ply files under geometry_dir,
    cached in max_min.txt (cf. data_generator.py:352-390 — note the returned
    order here is (min, max), fixing the reference's swap)."""
    cache = os.path.join(geometry_dir, cache_name)
    if os.path.exists(cache):
        with open(cache) as f:
            vals = [float(v) for v in f.read().split()]
        return vals[0], vals[1]
    lo, hi = np.inf, -np.inf
    for path in sorted(glob.glob(os.path.join(geometry_dir, "**", "*.ply"), recursive=True)):
        try:
            mesh = load_mesh(path)
        except Exception:
            continue
        lo = min(lo, float(mesh.vertices.min()))
        hi = max(hi, float(mesh.vertices.max()))
    with open(cache, "w") as f:
        f.write(f"{lo} {hi}\n")
    return lo, hi


def write_signed_distance_distributed(
    geometry_dir: str,
    save_directory: str,
    num_points_uniform: int = 0,
    num_points_surface: int = 0,
    num_points_narrow_band: int = 0,
    dense_width: float = 0.1,
    host_id: int = 0,
    num_hosts: int = 1,
    include_vertices: bool = True,
    seed: int = RANDOM_SEED_DATA_GENERATION,
    log_name: str = "processed_files.log",
) -> str:
    """Walk every .ply shard, append its surface points to surface.csv,
    journaling completed files so interrupted runs resume exactly where they
    stopped (cf. data_generator.py:711-719, :804-805).

    Matches the reference's shipped behavior (vertices -> surface.csv,
    data_generator.py:745-801); optionally also draws per-file barycentric
    surface samples when num_points_surface > 0.
    """
    create_directory(save_directory)
    log_path = os.path.join(save_directory, log_name)
    surface_csv = os.path.join(save_directory, "surface.csv")

    processed = set()
    if os.path.exists(log_path):
        with open(log_path) as f:
            processed = {line.strip() for line in f if line.strip()}

    lo, hi = compute_min_max(geometry_dir)
    span = hi - lo
    # 40% margin like the reference bbox handling (data_generator.py:702-709)
    scale = max(abs(lo - 0.4 * span), abs(hi + 0.4 * span), 1e-12)

    files = sorted(glob.glob(os.path.join(geometry_dir, "**", "*.ply"), recursive=True))
    files = [p for i, p in enumerate(files) if i % num_hosts == host_id]

    rng = np.random.default_rng(seed + host_id)
    for path in files:
        key = os.path.relpath(path, geometry_dir)
        if key in processed:
            continue
        try:
            mesh = load_mesh(path)
        except Exception as exc:  # corrupt shard: skip but journal it
            print(f"[distributed-sampling] skipping corrupt mesh {path}: {exc}")
            with open(log_path, "a") as f:
                f.write(key + "\n")
            continue

        rows = []
        if include_vertices and len(mesh.vertices):
            v = mesh.vertices / scale
            rows.append(
                np.column_stack([v, np.zeros(len(v)), np.zeros((len(v), 3))])
            )
        if num_points_surface > 0 and len(mesh.faces):
            from .sampler import sample_surface_points

            pts = sample_surface_points(mesh, num_points_surface, rng)
            pts = pts / scale
            rows.append(
                np.column_stack([pts, np.zeros(len(pts)), np.zeros((len(pts), 3))])
            )
        if rows:
            df = pd.DataFrame(
                np.concatenate(rows, axis=0),
                columns=["x", "y", "z", "S", "nx", "ny", "nz"],
            )
            header = not os.path.exists(surface_csv)
            df.to_csv(surface_csv, mode="a", header=header, index=True)

        with open(log_path, "a") as f:
            f.write(key + "\n")

    return surface_csv
