"""epochs_per_call > 1 must match per-epoch training numerically-ish and
produce the same artifacts."""

import os

import numpy as np

from tests.test_trainer import sphere_dataset, tiny_config
from sdf_representation_tpu.training import Trainer


def test_multi_epoch_block_equivalence(tmp_path):
    ds = sphere_dataset()

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    cfg1 = tiny_config(tmp_path / "a", epochs=12)
    t1 = Trainer(cfg1)
    r1 = t1.train(dataset=ds)

    cfg4 = tiny_config(tmp_path / "b", epochs=12)
    cfg4.epochs_per_call = 4
    t4 = Trainer(cfg4)
    r4 = t4.train(dataset=ds)

    assert r4["epochs_run"] == 12
    assert len(r4["train_losses"]) == 12
    # identical rng schedule per epoch index -> identical losses
    np.testing.assert_allclose(
        r1["train_losses"], r4["train_losses"], rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        r1["val_losses"], r4["val_losses"], rtol=1e-5, atol=1e-7
    )
    # artifacts still written
    assert os.path.exists(os.path.join(t4.model_save_path, "best_model.ckpt"))
    lines = open(os.path.join(t4.train_path, "train_loss.txt")).read().splitlines()
    assert len(lines) == 12


def test_multi_epoch_early_stop(tmp_path):
    cfg = tiny_config(tmp_path, epochs=100, patience=3, min_epochs=1, lr=0.0)
    cfg.epochs_per_call = 5
    t = Trainer(cfg)
    res = t.train(dataset=sphere_dataset(2000))
    assert res["epochs_run"] <= 15
