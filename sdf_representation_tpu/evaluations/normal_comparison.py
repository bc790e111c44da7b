"""Model-vs-exact normal quality audit.

Working rebuild of reference utils/normal_comparison.py:15-128
`compute_normal_for_model` (whose shipped version exit()s halfway, :67):
evaluate the trained field + input-gradient normals at given coordinates,
compare against exact mesh distances/normals, report RMSE and per-point
cosine-similarity statistics, and write the same artifact set
(computed.csv, error_points.csv, similarity_points.csv, similarity.csv,
igl_wf.csv -> exact_wf.csv) plus error heatmaps.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Dict, Optional

import numpy as np
import pandas as pd

from ..geometry.mesh_io import load_mesh
from ..ops.diffops import sdf_and_gradient
from ..ops.sdf_exact import signed_distance

COLUMNS = ["x", "y", "z", "S", "nx", "ny", "nz"]


def compute_normal_for_model(
    model,
    params,
    save_path: str,
    coords_csv: str = "nodes_coordinates.csv",
    mesh_path: Optional[str] = None,
    plot: bool = True,
) -> Dict[str, float]:
    df = pd.read_csv(os.path.join(save_path, coords_csv))
    pts = df[["x", "y", "z"]].to_numpy(dtype=np.float32)

    # ground truth from the mesh (an .stl beside the coords, like the
    # reference glob, normal_comparison.py:30-37)
    if mesh_path is None:
        stls = glob.glob(os.path.join(save_path, "*.stl"))
        mesh_path = stls[0] if stls else None
    truth = None
    if mesh_path is not None:
        S, n = signed_distance(pts.astype(np.float64), load_mesh(mesh_path))
        truth = pd.DataFrame(np.column_stack([pts, S, n]), columns=COLUMNS)
        truth.to_csv(os.path.join(save_path, "exact_wf.csv"), index=True)

    t0 = time.time()
    vals, grads = sdf_and_gradient(model.apply, params, pts)
    elapsed = time.time() - t0
    vals = np.asarray(vals)
    normals = np.asarray(grads)[:, -3:]

    computed = pd.DataFrame(
        np.column_stack([pts, vals, normals]), columns=COLUMNS
    )
    computed.to_csv(os.path.join(save_path, "computed.csv"), index=True)

    out: Dict[str, float] = {"eval_seconds": elapsed}
    if truth is not None:
        err = np.abs(truth["S"].to_numpy() - vals)
        pd.DataFrame(
            np.column_stack([pts, err]), columns=["x", "y", "z", "error"]
        ).to_csv(os.path.join(save_path, "error_points.csv"), index=True)
        out["rmse"] = float(np.sqrt(np.mean(err**2)))

        tn = truth[["nx", "ny", "nz"]].to_numpy()
        denom = np.linalg.norm(tn, axis=1) * np.linalg.norm(normals, axis=1)
        cos = np.einsum("ij,ij->i", tn, normals) / np.maximum(denom, 1e-12)
        pd.DataFrame(
            np.column_stack([pts, cos]), columns=["x", "y", "z", "similarity"]
        ).to_csv(os.path.join(save_path, "similarity_points.csv"), index=True)
        stats = {
            "mean": float(np.mean(cos)),
            "median": float(np.median(cos)),
            "std": float(np.std(cos)),
            "min": float(np.min(cos)),
            "max": float(np.max(cos)),
        }
        pd.DataFrame([stats]).to_csv(
            os.path.join(save_path, "similarity.csv"), index=False
        )
        out.update({f"cos_{k}": v for k, v in stats.items()})
        if plot:
            try:
                from .visualize_errors import plot_errors

                plot_errors(save_path)
            except Exception as exc:
                print(f"error plots failed: {exc}")
    return out
