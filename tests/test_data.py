"""Dataset loading semantics (cf. reference dataloader/load_data.py)."""

import numpy as np
import pandas as pd
import pytest

from sdf_representation_tpu.data import load_data


class Cfg:
    name = "thing"
    geometry = ""
    mismatchuse = False
    train_test_split = 0.1


def write_csv(path, n, seed=0):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        rng.normal(size=(n, 7)), columns=["x", "y", "z", "S", "nx", "ny", "nz"]
    )
    df.to_csv(path)  # with index, like the sampler output
    return df


def test_load_concat_and_split(tmp_path):
    write_csv(tmp_path / "uniform.csv", 800, 0)
    write_csv(tmp_path / "surface.csv", 300, 1)
    write_csv(tmp_path / "narrow.csv", 400, 2)
    ds = load_data(str(tmp_path), Cfg())
    total = 1500
    assert ds.n_train + ds.n_val == total
    assert ds.n_val == int(round(total * 0.1))
    assert ds.train_x.shape[1] == 3
    assert ds.train_y.shape[1] == 4
    assert ds.train_x.dtype == np.float32


def test_split_is_deterministic(tmp_path):
    write_csv(tmp_path / "uniform.csv", 1200, 0)
    a = load_data(str(tmp_path), Cfg())
    b = load_data(str(tmp_path), Cfg())
    np.testing.assert_array_equal(a.train_x, b.train_x)


def test_too_few_points_raises(tmp_path):
    write_csv(tmp_path / "uniform.csv", 50, 0)
    with pytest.raises(ValueError, match="Very Less Points"):
        load_data(str(tmp_path), Cfg())


def test_missing_files_ok_if_enough(tmp_path):
    write_csv(tmp_path / "uniform.csv", 1200, 0)
    ds = load_data(str(tmp_path), Cfg())  # surface/narrow missing -> empty
    assert ds.n_train + ds.n_val == 1200


def test_mismatch_concat(tmp_path):
    write_csv(tmp_path / "uniform.csv", 900, 0)
    write_csv(tmp_path / "mismatch.csv", 200, 1)

    class C(Cfg):
        mismatchuse = True

    ds = load_data(str(tmp_path), C())
    assert ds.n_train + ds.n_val == 1100


def test_pcd_mode(tmp_path):
    rng = np.random.default_rng(0)
    df = pd.DataFrame(rng.normal(size=(1500, 3)), columns=["x", "y", "z"])
    p = tmp_path / "cloud.csv"
    df.to_csv(p, index=False)

    class C(Cfg):
        name = "bunny_pcd"
        geometry = str(p)

    ds = load_data(str(tmp_path), C())
    assert ds.train_x.shape[1] == 3
    assert ds.train_y.shape[1] == 0
