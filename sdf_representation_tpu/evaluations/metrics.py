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
    n = pred_sdf.size
    if n == 0:
        return 0.0
    wrong = np.count_nonzero((pred_sdf < 0) ^ (true_sdf < 0))
    return float((n - wrong) / n)


def thresholded_nmse(
    pred_sdf: np.ndarray, true_sdf: np.ndarray, threshold: float
) -> float:
    """Normalized MSE over points where |pred - true| > threshold — the
    reference's "NMSELoss_Mismatch" metric (post_process.py:99-101, 162-163):
    sum of squared errors of mismatching points / sum of squared true values.

    Single-pass float32 arithmetic (the relay host has one slow core; f64
    temporaries + fancy indexing at 256^3 scale took seconds per call).
    """
    t32 = np.asarray(true_sdf, np.float32)
    err = np.asarray(pred_sdf, np.float32) - t32
    e2 = err * err
    denom = float(np.dot(t32, t32))
    if denom == 0:
        return 0.0
    num = float(np.sum(np.where(e2 > np.float32(threshold) ** 2, e2, np.float32(0))))
    return num / denom


def sign_confusion_counts(pred_sdf: np.ndarray, true_sdf: np.ndarray):
    """2x2 confusion counts of the inside(1)/outside(0) labels via three
    boolean count_nonzero passes (no integer temporaries — the relay host
    has a single slow core and sklearn's report took minutes at 256^3)."""
    t = true_sdf < 0
    p = pred_sdf < 0
    n = t.size
    tp = int(np.count_nonzero(t & p))
    t1 = int(np.count_nonzero(t))
    p1 = int(np.count_nonzero(p))
    return np.array(
        [[n - t1 - p1 + tp, p1 - tp], [t1 - tp, tp]], dtype=np.int64
    )  # [true][pred]


def classification_report_frame(pred_sdf: np.ndarray, true_sdf: np.ndarray):
    """Per-class precision/recall/f1/support on the sign labels, as a
    DataFrame with sklearn's classification_report layout
    (cf. post_process.py generate_classification_report :21-28) but derived
    analytically from the confusion counts (O(N) one pass)."""
    return _report_from_confusion(sign_confusion_counts(pred_sdf, true_sdf))


def _report_from_confusion(cm: np.ndarray):
    import pandas as pd

    total = cm.sum()
    rows = {}
    f1s, precs, recs, supports = [], [], [], []
    for cls in (0, 1):
        tp = cm[cls, cls]
        support = cm[cls].sum()
        pred_pos = cm[:, cls].sum()
        prec = tp / pred_pos if pred_pos else 0.0
        rec = tp / support if support else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        rows[str(cls)] = {
            "precision": prec, "recall": rec, "f1-score": f1,
            "support": float(support),
        }
        precs.append(prec); recs.append(rec); f1s.append(f1)
        supports.append(support)
    acc = (cm[0, 0] + cm[1, 1]) / total if total else 0.0
    rows["accuracy"] = {"precision": acc, "recall": acc, "f1-score": acc,
                        "support": float(total)}
    rows["macro avg"] = {
        "precision": np.mean(precs), "recall": np.mean(recs),
        "f1-score": np.mean(f1s), "support": float(total),
    }
    w = np.asarray(supports) / max(total, 1)
    rows["weighted avg"] = {
        "precision": float(np.dot(w, precs)), "recall": float(np.dot(w, recs)),
        "f1-score": float(np.dot(w, f1s)), "support": float(total),
    }
    return pd.DataFrame(rows).transpose()


def confusion_matrix_png(
    pred_sdf: np.ndarray, true_sdf: np.ndarray, path: str, cm=None
) -> None:
    """Confusion-matrix heatmap (cf. post_process.py :29-38)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if cm is None:
        cm = sign_confusion_counts(pred_sdf, true_sdf)
    fig, ax = plt.subplots()
    im = ax.imshow(cm, cmap="Blues")
    for (i, j), v in np.ndenumerate(cm):
        ax.text(j, i, str(v), ha="center", va="center")
    ax.set_xlabel("predicted (inside=1)")
    ax.set_ylabel("true (inside=1)")
    fig.colorbar(im)
    fig.savefig(path, dpi=100)
    plt.close(fig)


def compute_grid_metrics(pred_sdf: np.ndarray, true_sdf: np.ndarray,
                         thresholds=(0.01, 0.00025),
                         max_mismatch: int = 1_000_000):
    """All post-process scalar metrics + mismatch samples in ONE device call.

    At 256^3 scale the host (one slow core on the relay VM) needs seconds per
    elementwise pass AND the relay D2H link runs at a few MB/s, so neither the
    full grids nor full boolean masks may ever be fetched. Mismatching points
    are subsampled ON DEVICE to ``max_mismatch`` flat indices (unbiased
    Bernoulli decimation when the true count exceeds the cap) and only those
    indices cross the link.

    Returns dict with nmse_{t}, sign_accuracy, confusion (2,2),
    mismatch_counts (true counts per threshold), and mismatch_indices
    (host int arrays of flat grid indices, each len <= max_mismatch).
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    # device arrays pass straight through — never np.asarray them first
    # (that would fetch the whole grid through the slow relay)
    p32 = jnp.asarray(pred_sdf, jnp.float32).reshape(-1)
    t32 = jnp.asarray(true_sdf, jnp.float32).reshape(-1)
    n = int(p32.size)
    cap = int(min(max_mismatch, n))

    @partial(jax.jit, static_argnames=("cap",))
    def _metrics(p, t, key, cap):
        err = p - t
        e2 = err * err
        denom = jnp.dot(t, t)
        u = jax.random.uniform(key, p.shape)
        nmses, counts, idxs = [], [], []
        for thr in thresholds:
            m = jnp.abs(err) > thr
            nmses.append(
                jnp.sum(jnp.where(m, e2, 0.0)) / jnp.maximum(denom, 1e-30)
            )
            cnt = jnp.count_nonzero(m)
            # target slightly under the cap: if the Bernoulli draw exceeded
            # it, nonzero(size=cap) would truncate the HIGHEST flat indices,
            # spatially biasing the sample against one side of the grid.
            # 0.997*cap keeps overflow probability negligible (3-sigma at
            # cap=1e6) at the cost of ~0.3% fewer emitted rows.
            keep = jnp.where(
                cnt <= cap,
                1.0,
                0.997 * jnp.float32(cap)
                / jnp.maximum(cnt.astype(jnp.float32), 1.0),
            )
            idxs.append(jnp.nonzero(m & (u < keep), size=cap, fill_value=-1)[0])
            counts.append(cnt)
        ti = t < 0
        pi = p < 0
        tp = jnp.count_nonzero(ti & pi)
        t1 = jnp.count_nonzero(ti)
        p1 = jnp.count_nonzero(pi)
        return nmses, counts, idxs, (tp, t1, p1)

    nmses, counts, idxs, conf = _metrics(
        p32, t32, jax.random.PRNGKey(0), cap
    )
    # one bulk fetch: scalars + <=cap int32 indices per threshold
    nmses, counts, idxs, (tp, t1, p1) = jax.device_get(
        (nmses, counts, idxs, conf)
    )
    tp, t1, p1 = int(tp), int(t1), int(p1)
    cm = np.array([[n - t1 - p1 + tp, p1 - tp], [t1 - tp, tp]], np.int64)
    out = {
        f"nmse_{thr}": float(v) for thr, v in zip(thresholds, nmses)
    }
    out["sign_accuracy"] = (cm[0, 0] + cm[1, 1]) / max(n, 1)
    out["confusion"] = cm
    out["mismatch_counts"] = [int(c) for c in counts]
    out["mismatch_indices"] = [np.asarray(ix[ix >= 0]) for ix in idxs]
    return out
