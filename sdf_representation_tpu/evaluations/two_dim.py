"""2D contour validation against the analytic circle.

Rebuild of Executor.two_dim_contour (reference executor/executor.py:402-480):
evaluate the field on a 2D slice grid (z=0), collect near-zero contour points,
write their distances-from-origin CSV, and plot the predicted field with the
analytic circle r = sqrt(2/pi) overlaid.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..ops.grid_eval import evaluate_points

CONTOUR_EPS = 2.0 ** -10


def two_dim_contour(trainer, resolution: int = 512):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    trainable, epoch = trainer.load_model(best=True)
    params = trainable["params"]

    ax_vals = np.linspace(-1, 1, resolution, dtype=np.float32)
    xx, yy = np.meshgrid(ax_vals, ax_vals, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), np.zeros(xx.size, np.float32)], axis=1)
    sdf = evaluate_points(trainer.model.apply, params, pts)

    near = np.abs(sdf) < CONTOUR_EPS
    contour_pts = pts[near]
    dists = np.linalg.norm(contour_pts[:, :2], axis=1)
    pd.DataFrame({"x": contour_pts[:, 0], "y": contour_pts[:, 1], "r": dists}).to_csv(
        os.path.join(trainer.postprocess_save_path, "contour_distances.csv"),
        index=False,
    )

    radius = np.sqrt(2.0 / np.pi)
    fig, ax = plt.subplots(figsize=(6, 6))
    im = ax.contourf(xx, yy, sdf.reshape(resolution, resolution), levels=30)
    theta = np.linspace(0, 2 * np.pi, 256)
    ax.plot(radius * np.cos(theta), radius * np.sin(theta), "r--", label="analytic")
    if len(contour_pts):
        ax.scatter(contour_pts[:, 0], contour_pts[:, 1], s=1, c="k", label="predicted")
    ax.set_aspect("equal")
    ax.legend()
    fig.colorbar(im)
    fig.savefig(
        os.path.join(trainer.plot_save_path, f"contour_epoch{epoch}.png"), dpi=120
    )
    plt.close(fig)
    return dists
