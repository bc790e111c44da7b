"""Quantitative evaluation metrics (fit quality, parity with the reference's
post_process.py bookkeeping plus Chamfer distance for BASELINE.md)."""

from __future__ import annotations


import numpy as np
from scipy.spatial import cKDTree


def chamfer_distance(
    points_a: np.ndarray, points_b: np.ndarray
) -> float:
    """Symmetric Chamfer distance (mean nearest-neighbour, both directions)."""
    ta, tb = cKDTree(points_a), cKDTree(points_b)
    da, _ = tb.query(points_a, k=1)
    db, _ = ta.query(points_b, k=1)
    return float(da.mean() + db.mean())


def sign_accuracy(pred_sdf: np.ndarray, true_sdf: np.ndarray) -> float:
    """Fraction of points whose inside/outside classification matches
    (cf. reference post_process.py:102-104, 171-172)."""
    return float(np.mean((pred_sdf < 0) == (true_sdf < 0)))


def thresholded_nmse(
    pred_sdf: np.ndarray, true_sdf: np.ndarray, threshold: float
) -> float:
    """Normalized MSE over points where |pred - true| > threshold — the
    reference's "NMSELoss_Mismatch" metric (post_process.py:99-101, 162-163):
    sum of squared errors of mismatching points / sum of squared true values.
    """
    err = pred_sdf - true_sdf
    mism = np.abs(err) > threshold
    denom = float(np.sum(true_sdf**2))
    if denom == 0:
        return 0.0
    return float(np.sum(err[mism] ** 2) / denom)


def classification_report_frame(pred_sdf: np.ndarray, true_sdf: np.ndarray):
    """sklearn classification report on the sign labels, as a DataFrame
    (cf. post_process.py generate_classification_report :21-28)."""
    import pandas as pd
    from sklearn.metrics import classification_report

    rep = classification_report(
        (true_sdf < 0).astype(int), (pred_sdf < 0).astype(int), output_dict=True,
        zero_division=0,
    )
    return pd.DataFrame(rep).transpose()


def confusion_matrix_png(
    pred_sdf: np.ndarray, true_sdf: np.ndarray, path: str
) -> None:
    """Confusion-matrix heatmap (cf. post_process.py :29-38)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import confusion_matrix

    cm = confusion_matrix((true_sdf < 0).astype(int), (pred_sdf < 0).astype(int))
    fig, ax = plt.subplots()
    im = ax.imshow(cm, cmap="Blues")
    for (i, j), v in np.ndenumerate(cm):
        ax.text(j, i, str(v), ha="center", va="center")
    ax.set_xlabel("predicted (inside=1)")
    ax.set_ylabel("true (inside=1)")
    fig.colorbar(im)
    fig.savefig(path, dpi=100)
    plt.close(fig)
