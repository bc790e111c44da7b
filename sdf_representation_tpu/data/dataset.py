"""CSV dataset loading + train/val split.

Rebuild of the reference loader (reference dataloader/load_data.py:10-96).
Instead of torch DataLoaders (per-batch host->device copies, the reference's
hot-loop tax at executor.py:174), data is returned as contiguous numpy arrays;
the trainer ships the WHOLE dataset to HBM once and shuffles/batches on-device
inside a jitted epoch (see training/trainer.py).

Preserved semantics:
  * reads uniform.csv / surface.csv / narrow.csv (+ mismatch.csv when
    config.mismatchuse)
  * "pcd" in config.name -> load config.geometry as a bare point CSV with no
    labels (load_data.py:28-37)
  * frames with <= 1 row are dropped from the concat (load_data.py:48-51)
  * total < 1000 points raises ValueError("Very Less Points")
  * features = all-but-last-4 columns, targets = last 4 (S, nx, ny, nz)
  * sklearn train_test_split(test_size=config.train_test_split,
    random_state=RANDOM_SEED_TEST_SPLIT=42)
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import pandas as pd
from sklearn.model_selection import train_test_split

from ..utils.constants import RANDOM_SEED_TEST_SPLIT


@dataclasses.dataclass
class SDFDataset:
    train_x: np.ndarray  # (N, d) float32
    train_y: np.ndarray  # (N, 4) float32 (empty (N, 0) for pcd)
    val_x: np.ndarray
    val_y: np.ndarray

    @property
    def n_train(self) -> int:
        return len(self.train_x)

    @property
    def n_val(self) -> int:
        return len(self.val_x)


def df_from_csv(path: str) -> pd.DataFrame:
    """Empty frame when the file is missing (cf. load_data.py:92-96)."""
    if os.path.exists(path):
        return pd.read_csv(path)
    return pd.DataFrame()


def load_data(data_path: str, config) -> SDFDataset:
    pcd = "pcd" in config.name
    if pcd:
        df = df_from_csv(config.geometry)
        frames = [df]
    else:
        frames = [
            df_from_csv(os.path.join(data_path, "uniform.csv")),
            df_from_csv(os.path.join(data_path, "surface.csv")),
            df_from_csv(os.path.join(data_path, "narrow.csv")),
        ]
        if config.mismatchuse:
            frames.append(pd.read_csv(os.path.join(data_path, "mismatch.csv")))

    frames = [f for f in frames if len(f) > 1]
    if not frames:
        raise ValueError("Very Less Points")
    df = pd.concat(frames, ignore_index=True)
    if not pcd and "Unnamed: 0" in df.columns:
        df = df.drop(columns=["Unnamed: 0"])

    if len(df) < 1000:
        raise ValueError("Very Less Points")

    if pcd:
        feature_cols = ["x", "y", "z"]
        X = df[feature_cols].to_numpy(dtype=np.float32)
        Y = np.zeros((len(X), 0), dtype=np.float32)
    else:
        X = df[df.columns[0:-4]].to_numpy(dtype=np.float32)
        Y = df[df.columns[-4:]].to_numpy(dtype=np.float32)

    tr_x, va_x, tr_y, va_y = train_test_split(
        X, Y, test_size=config.train_test_split, random_state=RANDOM_SEED_TEST_SPLIT
    )
    return SDFDataset(
        np.ascontiguousarray(tr_x),
        np.ascontiguousarray(tr_y),
        np.ascontiguousarray(va_x),
        np.ascontiguousarray(va_y),
    )
