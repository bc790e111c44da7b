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


class _EpochTrapLoss:
    """Val loss is minimal at epoch 3 by construction (the |epoch-3| shift
    has zero parameter gradient, so training dynamics are unaffected)."""

    def __call__(self, params, apply_fn, x, y, epoch, rng=None, aux=None):
        import jax.numpy as jnp

        pred = apply_fn(params, x).reshape(x.shape[0])
        return jnp.mean((pred - y[:, 0]) ** 2) + jnp.abs(
            jnp.asarray(epoch, jnp.float32) - 3.0
        )


def test_best_checkpoint_mid_block(tmp_path):
    """epochs_per_call > 1 must checkpoint the BEST epoch's params, not the
    block-end params (VERDICT round 1 weak #4)."""
    ds = sphere_dataset()

    (tmp_path / "a").mkdir()
    cfg = tiny_config(tmp_path / "a", epochs=10)
    cfg.epochs_per_call = 10
    t = Trainer(cfg)
    t.loss = _EpochTrapLoss()
    res = t.train(dataset=ds)
    assert int(np.argmin(res["val_losses"])) == 3
    best_tr, best_epoch = t.load_model(best=True)
    assert best_epoch == 3

    # per-epoch run to epoch 3 gives the ground-truth epoch-3 params
    # (identical per-epoch rng schedule regardless of block structure)
    (tmp_path / "b").mkdir()
    cfg2 = tiny_config(tmp_path / "b", epochs=4)
    t2 = Trainer(cfg2)
    t2.loss = _EpochTrapLoss()
    t2.train(dataset=ds)
    ref_tr, ref_epoch = t2.load_model(best=True)
    assert ref_epoch == 3

    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(best_tr), jax.tree_util.tree_leaves(ref_tr)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # block-end params (epoch 9) must differ from the checkpointed best
    end_leaves = jax.tree_util.tree_leaves(res["trainable"])
    best_leaves = jax.tree_util.tree_leaves(best_tr)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(end_leaves, best_leaves)
    )


def test_partial_final_block_respects_budget(tmp_path):
    """epochs not divisible by epochs_per_call: the final partial block must
    NOT advance parameters past the configured budget (regression: the
    static-length scan used to train the overrun epochs for real)."""
    import jax.numpy as jnp

    ds = sphere_dataset()
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    cfg1 = tiny_config(tmp_path / "a", epochs=10)
    r1 = Trainer(cfg1).train(dataset=ds)

    cfg8 = tiny_config(tmp_path / "b", epochs=10)
    cfg8.epochs_per_call = 8  # second block covers only 2 live epochs
    t8 = Trainer(cfg8)
    r8 = t8.train(dataset=ds)

    assert r8["epochs_run"] == 10
    np.testing.assert_allclose(
        r1["train_losses"], r8["train_losses"], rtol=1e-5, atol=1e-7
    )
    # the RETURNED params equal the per-epoch run's (no overrun training)
    import jax

    fa, _ = jax.tree_util.tree_flatten(r1["trainable"])
    fb, _ = jax.tree_util.tree_flatten(r8["trainable"])
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


class _ScheduleLoss:
    """Epoch-indexed additive offset with zero parameter gradient: val loss
    follows the schedule exactly when lr=0 (params never move)."""

    def __init__(self, offsets):
        self.offsets = list(offsets)

    def __call__(self, params, apply_fn, x, y, epoch, rng=None, aux=None):
        import jax.numpy as jnp

        pred = apply_fn(params, x).reshape(x.shape[0])
        table = jnp.asarray(self.offsets, jnp.float32)
        e = jnp.clip(jnp.asarray(epoch, jnp.int32), 0, len(self.offsets) - 1)
        return jnp.mean((pred - y[:, 0]) ** 2) * 0.0 + jnp.take(table, e)


def test_post_break_device_best_is_adopted(tmp_path):
    """ADVICE r2: early stop before any host-visible improvement in the
    block must still adopt the DEVICE best (best_idx >= 0, last_improve_k
    == -1), and the saved history must reach the adopted epoch."""
    from sdf_representation_tpu.training import checkpoint as ckpt
    import optax

    ds = sphere_dataset(2000)
    # block 1 (e0-3): steady improvement; block 2 (e4-7): worse at k=0,1
    # (stop fires at e5, patience 2) but e6 = 0.6 beats the running best
    offsets = [1.0, 0.9, 0.8, 0.7, 0.9, 0.95, 0.6, 0.65]
    cfg = tiny_config(tmp_path, epochs=8, patience=2, min_epochs=1, lr=0.0)
    cfg.epochs_per_call = 4
    t = Trainer(cfg)
    t.loss = _ScheduleLoss(offsets)
    res = t.train(dataset=ds)
    assert res["last_epoch"] == 5  # host stopped at epoch 5

    _, best_epoch = t.load_model(best=True)
    assert best_epoch == 6  # device best adopted despite the host break

    # raw checkpoint: history must reach the adopted epoch and best_val
    # must match the adopted epoch's schedule value
    trainable = t._init_trainable(concrete=False)
    template = {
        "trainable": trainable,
        "opt_state": t._make_optimizer(cfg.batchsize).init(trainable),
        "epoch": 0,
        "train_losses": np.zeros(0, np.float64),
        "val_losses": np.zeros(0, np.float64),
        "best_val": 0.0,
    }
    state = ckpt.load_checkpoint(
        os.path.join(t.model_save_path, "best_model.ckpt"), template
    )
    assert int(state["epoch"]) == 6
    assert len(state["val_losses"]) == 7  # epochs 0..6 inclusive
    assert len(state["train_losses"]) == 7
    np.testing.assert_allclose(float(state["best_val"]), 0.6, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state["val_losses"]), offsets[:7], atol=1e-5
    )
