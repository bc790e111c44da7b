"""Trainer end-to-end + checkpoint/resume regression tests (CPU, tiny nets)."""

import os

import jax
import numpy as np
import pytest

from sdf_representation_tpu.configgen import Configuration
from sdf_representation_tpu.data.dataset import SDFDataset
from sdf_representation_tpu.training import Trainer
from sdf_representation_tpu.training.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    latest_epoch_checkpoint,
)


def sphere_dataset(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    sdf = np.linalg.norm(x, axis=1) - 0.5
    nrm = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-9)
    y = np.column_stack([sdf, nrm]).astype(np.float32)
    k = int(n * 0.9)
    return SDFDataset(x[:k], y[:k], x[k:], y[k:])


def tiny_config(tmp_path, **overrides):
    base = {
        "hidden_dim": 32, "num_hidden_layers": 2, "skip_connection": 0,
        "beta": 0, "geometric_init": "False", "lr": 0.003, "epochs": 15,
        "min_epochs": 2, "batch_size": 512, "checkpointing": 5,
        "continue": "False", "patience": 100, "loss_function": "MSELoss",
        "loss_extra": "",
    }
    base.update(overrides)
    ini = f"""[Files]
geometry = {tmp_path}/geom.stl
directory = {tmp_path}/out/
name = sphere

[Model]
model = ImplicitNet
hidden_dim = {base['hidden_dim']}
num_hidden_layers = {base['num_hidden_layers']}
input_dim = 3
skip_connection = {base['skip_connection']}
beta = {base['beta']}
geometric_init = {base['geometric_init']}

[Loss]
loss_function = {base['loss_function']}
{base['loss_extra']}

[Training]
lr = {base['lr']}
epochs = {base['epochs']}
min_epochs = {base['min_epochs']}
batch_size = {base['batch_size']}
checkpointing = {base['checkpointing']}
continue = {base['continue']}
patience = {base['patience']}

[Sampling]
samplingonly = False
continue_sampling = False
rescale = False
distributed = False
uniform_points = 1000
surface = 2
narrowband = 2
narrowband_width = 0.1
mismatchuse = False
train_test_split = 0.1

[Optional]
ppo = False
reconstruct = False
cubesize = 32
postprocessbatchsize = 32768
"""
    p = tmp_path / "c.ini"
    p.write_text(ini)
    return Configuration(str(p))


def test_training_reduces_loss(tmp_path):
    cfg = tiny_config(tmp_path)
    trainer = Trainer(cfg)
    result = trainer.train(dataset=sphere_dataset())
    assert result["train_losses"][-1] < result["train_losses"][0] * 0.5
    assert result["epochs_run"] == 15
    # validation is real (not a copy of train loss)
    assert result["val_losses"] != result["train_losses"]
    # artifacts
    assert os.path.exists(os.path.join(trainer.train_path, "train_loss.txt"))
    assert os.path.exists(os.path.join(trainer.model_save_path, "best_model.ckpt"))


def test_bfloat16_mxu_precision_mode(tmp_path, capsys):
    """train_matmul_precision=bfloat16_mxu: f32 params/activations with bf16
    MXU passes (jax.default_matmul_precision) — the clamp-loss-safe mixed
    mode (round 5; the full-cast "bfloat16" mode's ~1e-2 forward noise traps
    clamp losses in their zero-gradient region, see make_train_step)."""
    cfg = tiny_config(tmp_path)
    cfg.train_matmul_precision = "bfloat16_mxu"
    trainer = Trainer(cfg)
    result = trainer.train(dataset=sphere_dataset())
    assert result["train_losses"][-1] < result["train_losses"][0] * 0.5
    # master weights stayed f32 (no full-cast)
    trainable, _ = trainer.load_model(best=True)
    leaf = jax.tree_util.tree_leaves(trainable["params"])[0]
    assert leaf.dtype == np.float32


def test_resume_restores_optimizer_state(tmp_path):
    """Regression for the reference bug (executor.py:160): optimizer moments
    must survive a resume."""
    ds = sphere_dataset()
    cfg = tiny_config(tmp_path, epochs=6)
    t1 = Trainer(cfg)
    t1.train(dataset=ds)

    cfg2 = tiny_config(tmp_path, epochs=12, **{"continue": "True"})
    t2 = Trainer(cfg2)
    # NOTE: epochs is in the directory name; write into the SAME dir
    t2.model_save_path = t1.model_save_path
    t2.train_path = t1.train_path
    res = t2.train(dataset=ds)
    assert res["epochs_run"] == 6  # resumed at epoch 6, ran 6..11
    # resumed Adam state: second-segment losses continue decreasing smoothly
    assert res["train_losses"][-1] < res["train_losses"][5]


def test_early_stopping(tmp_path):
    cfg = tiny_config(tmp_path, epochs=200, patience=3, min_epochs=1, lr=0.0)
    trainer = Trainer(cfg)
    res = trainer.train(dataset=sphere_dataset(2000))
    # lr=0 -> no improvement after the first epoch -> stops quickly
    assert res["epochs_run"] <= 10


def test_epoch_checkpoints_written(tmp_path):
    cfg = tiny_config(tmp_path, epochs=11, checkpointing=5)
    trainer = Trainer(cfg)
    trainer.train(dataset=sphere_dataset(2000))
    newest = latest_epoch_checkpoint(trainer.model_save_path)
    assert newest is not None and newest[1] == 9  # epochs 4, 9


def test_load_model_roundtrip(tmp_path):
    cfg = tiny_config(tmp_path, epochs=4)
    trainer = Trainer(cfg)
    res = trainer.train(dataset=sphere_dataset(2000))
    trainable, epoch = trainer.load_model(best=True)
    x = np.zeros((4, 3), np.float32)
    out_loaded = trainer.model.apply(trainable["params"], x)
    out_live = trainer.model.apply(res["trainable"]["params"], x)
    # best checkpoint may differ from final params; both must be valid
    assert np.all(np.isfinite(np.asarray(out_loaded)))
    assert np.all(np.isfinite(np.asarray(out_live)))


def test_checkpoint_pytree_roundtrip(tmp_path):
    state = {
        "a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "nested": {"b": np.float64(3.5), "c": np.ones(4)},
        "epoch": 7,
    }
    p = str(tmp_path / "x.ckpt")
    save_checkpoint(p, state)
    template = {
        "a": np.zeros((2, 3), np.float32),
        "nested": {"b": np.float64(0), "c": np.zeros(4)},
        "epoch": 0,
    }
    restored = load_checkpoint(p, template)
    np.testing.assert_array_equal(restored["a"], state["a"])
    assert restored["epoch"] == 7


def test_gaussbonnet_aux_trains(tmp_path):
    cfg = tiny_config(
        tmp_path, epochs=3,
        loss_function="GaussBonnetLoss",
        loss_extra="delta = 0.1\ntau = 1.0\nlambda_g = 0.1\nregularizer_threshold = 1.0\ngauss_bonnet_weight = 0.01",
        batch_size=128,
    )
    trainer = Trainer(cfg)
    ds = sphere_dataset(1200)
    res = trainer.train(dataset=ds)
    euler = float(res["trainable"]["aux"]["euler_characteristic"])
    assert np.isfinite(euler)
    assert euler != 2.0  # it moved: the aux scalar is actually being trained


def test_lr_schedule(tmp_path):
    """lr_step/lr_gamma drive a real step decay (the reference's StepLR was
    never stepped — executor.py:139,182-183)."""
    cfg = tiny_config(tmp_path, epochs=6)
    cfg.lr_step = 2
    cfg.lr_gamma = 0.1
    trainer = Trainer(cfg)
    res = trainer.train(dataset=sphere_dataset(2000))
    assert res["epochs_run"] == 6
    # with aggressive decay, late-epoch loss changes shrink dramatically
    deltas = np.abs(np.diff(res["train_losses"]))
    assert deltas[-1] < deltas[0]


def test_post_process_e2e(tmp_path):
    """Full post-process audit on a trained tiny net: metrics sane, every
    reference artifact written (cf. reference post_process.py:162-207)."""
    from sdf_representation_tpu.evaluations.post_process import post_process
    from sdf_representation_tpu.geometry.mesh_io import save_mesh
    from sdf_representation_tpu.geometry.primitives import make_icosphere

    save_mesh(make_icosphere(2, radius=0.5), str(tmp_path / "geom.stl"))
    cfg = tiny_config(tmp_path, epochs=40, hidden_dim=64)
    trainer = Trainer(cfg)
    trainer.train(dataset=sphere_dataset(8000))
    out = post_process(trainer, mesh_path=str(tmp_path / "geom.stl"))
    assert out["sign_accuracy"] > 0.9
    assert np.isfinite(out["chamfer"])
    assert out["time_taken"] > 0
    import pandas as pd

    save = trainer.postprocess_save_path
    for fname in (
        "mismatching_co-ordinates1.csv", "mismatching_co-ordinates2.csv",
        "classification_report1.csv", "classification_report2.csv",
        "confusion_matrix.png", "results.csv",
    ):
        assert os.path.exists(os.path.join(save, fname)), fname
    # every emitted mismatch coordinate genuinely lies on the 32^3 grid
    mm = pd.read_csv(os.path.join(save, "mismatching_co-ordinates1.csv"))
    assert len(mm) == out["n_mismatch_1"] or len(mm) <= 1_000_000
    if len(mm):
        ax = np.linspace(-1, 1, cfg.cubesize, dtype=np.float32)
        for col in ("x", "y", "z"):
            assert np.isin(mm[col].to_numpy(np.float32), ax).all()
    row = pd.read_csv(os.path.join(save, "results.csv")).iloc[-1]
    assert row["Resolution"] == cfg.cubesize
    assert abs(row["Accuracy"] - out["sign_accuracy"]) < 1e-9


def test_checkpoint_alignment_fallback_with_optimizer_state(tmp_path):
    """The extra-key alignment fallback must survive namedtuple nodes
    (optax ScaleByAdamState et al.) — regression: type(template)(list)
    crashed on any checkpoint carrying real optimizer state."""
    import optax

    from sdf_representation_tpu.training.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    params = {"layers": [{"w": np.ones((3, 4), np.float32),
                          "b": np.zeros(4, np.float32)}]}
    opt = optax.adam(1e-3)
    state = {"params": params, "opt_state": opt.init(params), "epoch": 5,
             "legacy_marker": np.zeros((), np.bool_)}  # extra key
    p = str(tmp_path / "o.ckpt")
    save_checkpoint(p, state)
    template = {"params": jax.tree_util.tree_map(np.zeros_like, params),
                "opt_state": opt.init(params), "epoch": 0}
    restored = load_checkpoint(p, template)  # forces the alignment path
    assert restored["epoch"] == 5
    mu = restored["opt_state"][0].mu["layers"][0]["w"]
    np.testing.assert_array_equal(mu, np.zeros((3, 4), np.float32))
    np.testing.assert_array_equal(restored["params"]["layers"][0]["w"],
                                  params["layers"][0]["w"])
