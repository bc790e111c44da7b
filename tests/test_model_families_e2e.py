"""E2E training smoke for every model family through the real Trainer, plus
remaining config-surface coverage (samplingonly, [TPU] section)."""

import os

import numpy as np
import pytest

from sdf_representation_tpu.configgen import Configuration
from sdf_representation_tpu.training import Trainer

from tests.test_trainer import sphere_dataset, tiny_config


def _swap_model(tmp_path, name, hidden, layers):
    cfg = tiny_config(tmp_path, epochs=6, batch_size=256)
    text = open(str(tmp_path / "c.ini")).read()
    text = text.replace("model = ImplicitNet", f"model = {name}")
    text = text.replace("hidden_dim = 32", f"hidden_dim = {hidden}")
    text = text.replace("num_hidden_layers = 2", f"num_hidden_layers = {layers}")
    p = tmp_path / "m.ini"
    p.write_text(text)
    return Configuration(str(p))


def test_ffn_trains(tmp_path):
    cfg = _swap_model(tmp_path, "FeedForwardNetwork", 32, 2)
    trainer = Trainer(cfg)
    res = trainer.train(dataset=sphere_dataset(1500))
    assert res["train_losses"][-1] < res["train_losses"][0]
    assert np.all(np.isfinite(res["train_losses"]))


def test_kan_trains(tmp_path):
    cfg = _swap_model(tmp_path, "KAN", 8, 1)
    # default KAN grid_size=256 is heavy; shrink via make_model override
    from sdf_representation_tpu.models import KAN

    trainer = Trainer(cfg)
    trainer.model = KAN(layers_hidden=(3, 8, 1), grid_size=8)
    res = trainer.train(dataset=sphere_dataset(1500))
    assert res["train_losses"][-1] < res["train_losses"][0]


def test_siren_trains(tmp_path):
    cfg = _swap_model(tmp_path, "Siren", 32, 2)
    trainer = Trainer(cfg)
    res = trainer.train(dataset=sphere_dataset(1500))
    assert res["train_losses"][-1] < res["train_losses"][0]
    assert np.all(np.isfinite(res["train_losses"]))


def test_samplingonly_mode(tmp_path):
    from sdf_representation_tpu.geometry.mesh_io import save_mesh
    from sdf_representation_tpu.geometry.primitives import make_box

    cfg = tiny_config(tmp_path, epochs=3)
    save_mesh(make_box(), str(tmp_path / "geom.stl"))
    cfg.samplingonly = True
    cfg.rescale = False
    trainer = Trainer(cfg)
    trainer.run()
    for f in ("uniform.csv", "surface.csv", "narrow.csv"):
        assert os.path.exists(os.path.join(trainer.data_path, f)), f
    # and the sampling-exists fast path (executor.py:94-96 semantics)
    trainer.sampling()  # no error, no resample


def test_tpu_section_parsing(tmp_path):
    cfg = tiny_config(tmp_path)
    text = open(str(tmp_path / "c.ini")).read() + (
        "\n[TPU]\nepochs_per_call = 7\ntrain_matmul_precision = bfloat16\n"
        "use_pallas = False\ndebug_nans = False\nmesh_devices = 4\n"
    )
    p = tmp_path / "t.ini"
    p.write_text(text)
    c = Configuration(str(p))
    assert c.epochs_per_call == 7
    assert c.train_matmul_precision == "bfloat16"
    assert c.use_pallas is False
    assert c.mesh_devices == 4
    # defaults without the section
    c0 = Configuration(str(tmp_path / "c.ini"))
    assert c0.epochs_per_call == 1
    assert c0.train_matmul_precision is None
    assert c0.use_pallas is True


def test_hashmlp_via_config(tmp_path):
    cfg = _swap_model(tmp_path, "HashMLP", 64, 3)
    from sdf_representation_tpu.models import HashMLP

    model = cfg.make_model()
    assert isinstance(model, HashMLP)
    trainer = Trainer(cfg)
    # shrink tables for a fast CPU test
    trainer.model = HashMLP(n_levels=4, log2_table_size=11, max_resolution=64)
    res = trainer.train(dataset=sphere_dataset(1500))
    assert res["train_losses"][-1] < res["train_losses"][0] * 0.5
