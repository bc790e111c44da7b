"""TPU-native training executor.

Rebuild of the reference Executor (reference executor/executor.py:23-499) with
an XLA-shaped training loop:

  * the WHOLE dataset lives in HBM; every epoch is ONE jitted call —
    on-device shuffle (jax.random.permutation) + lax.scan over batches —
    instead of the reference's per-batch host->device copies
    (executor.py:174) and Python batch loop.
  * optax Adam; gradient w.r.t. params AND any loss-aux scalars (the
    GaussBonnet Euler characteristic, cf. executor.py:131-137).
  * optional jax.sharding.Mesh: batches sharded over the 'data' axis, grads
    all-reduced by XLA over ICI (replaces nn.DataParallel,
    executor.py:53-55).
  * validation actually runs (the reference's val loop is commented out and
    val_loss = train_loss, executor.py:187-198).
  * checkpoints carry optimizer state through resume (fixes executor.py:160)
    and are device-agnostic msgpack (see checkpoint.py).
  * the reference's debug aid torch.autograd.set_detect_anomaly
    (executor.py:159) maps to the config-gated jax_debug_nans switch.

Reference bugs intentionally not replicated (each regression-tested):
exit(1) after the first batch (executor.py:181), optimizer-state loss on
resume (:160), disabled validation (:188-198). Partial final batches are
dropped each epoch (shapes must be static under jit); with on-device
shuffling every point is still visited across epochs.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configgen.config_reader import Configuration
from ..data.dataset import load_data, SDFDataset
from ..parallel.mesh import shard_batch
from ..utils.files import create_directory
from . import checkpoint as ckpt


# ---------------------------------------------------------------------------
# jitted step/epoch factories (also used by __graft_entry__ and tests)
# ---------------------------------------------------------------------------

def _bind_apply(model, rng, pallas_igr: bool = False, mesh=None):
    """Per-step apply closure; models with dropout get the step rng.
    ImplicitNet closures advertise a forward-gradient fast path consumed by
    sdf_and_gradient_fwd (eikonal/normal losses): the XLA shared-matmul
    derivation by default, or — when ``pallas_igr`` — the fused Pallas
    custom-VJP kernels (ops/pallas_igr, 1.6x IGRLOSS epoch throughput).

    Under a device mesh the fused kernel is shard_map'd over the 'data'
    axis: the kernel is per-point, so each device runs the identical
    single-device program on its batch shard with params replicated; the
    shard_map transpose psums the params cotangent across the axis (the
    same all-reduce XLA inserts for the rest of the step), so multi-chip
    DP training keeps the fused kernel instead of silently dropping to
    the XLA derivation. Role match: torch.autograd.grad inside
    DataParallel, reference model/losses.py:283-296 + executor.py:53-55."""
    import inspect

    from ..models.implicit_net import ImplicitNet as _INet

    if "train" in inspect.signature(model.apply).parameters:
        return lambda p, x: model.apply(p, x, rng=rng, train=True)
    fn = lambda p, x: model.apply(p, x)
    if isinstance(model, _INet):
        if pallas_igr:
            from ..ops.pallas_igr import (
                make_fused_value_and_grad,
                make_fused_value_and_grad_sharded,
            )

            interp = jax.default_backend() == "cpu"
            if mesh is not None and mesh.devices.size > 1:
                fused = make_fused_value_and_grad_sharded(
                    model, mesh, interpret=interp
                )
            else:
                fused = make_fused_value_and_grad(model, interpret=interp)
            fn._implicitnet_fast = fused
        else:
            from ..ops.diffops import implicitnet_value_and_grad

            fn._implicitnet_fast = lambda p, x: implicitnet_value_and_grad(
                model, p, x
            )
    return fn


def _cast_bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32
        else a,
        tree,
    )


def make_train_step(
    model,
    loss_fn,
    optimizer: optax.GradientTransformation,
    mesh=None,
    matmul_precision: Optional[str] = None,
    pallas_igr: Optional[bool] = None,
) -> Callable:
    """(trainable, opt_state, x, y, rng, epoch) -> (trainable, opt_state, loss).

    `trainable` = {"params": ..., "aux": {...}} so loss-owned scalars train too.

    matmul_precision:
      None        — XLA default (f32 everywhere)
      "bfloat16"  — FULL mixed precision: f32 master weights/optimizer
                    state, the forward/backward runs with bf16
                    params+activations (halves HBM activation traffic,
                    single-pass MXU; the loss itself is computed in f32).
                    ~1.4x step throughput. CAVEAT (measured, round-5
                    head-to-head): the ~1e-2 bf16 forward noise through the
                    8x512 flagship can trap the DeepSDF clamp-family losses
                    (delta=0.1 band) in their zero-gradient region at
                    lr>=1e-4 — training plateaus at the all-clipped loss
                    (~9.4e-3 on the torus) while f32 escapes at epoch ~4.
                    Use for the eikonal/IGR family, or with
                    "bfloat16_mxu" below for clamp losses.
      "bfloat16_mxu" — f32 params/activations, bf16 MXU passes only
                    (jax.default_matmul_precision("bfloat16")): per-op
                    rounding instead of stored-activation rounding keeps
                    the forward noise ~1e-3 and escapes the clamp trap
                    (verified on the head-to-head torus run) at most of
                    the mixed-precision matmul speedup.
      other       — passed to jax.default_matmul_precision.

    pallas_igr: use the fused Pallas custom-VJP kernels for the eikonal
    losses' forward-gradient (ops/pallas_igr). None = auto: on when running
    on a real TPU backend in mixed precision (single-device, or shard_map'd
    per-device over the mesh — see _bind_apply).
    """
    mixed = matmul_precision == "bfloat16"
    lipschitz = getattr(model, "lipschitz", False)
    if pallas_igr is None:
        # the Pallas training kernels consume raw weights; the Lipschitz
        # variant's on-the-fly row normalisation keeps the XLA path
        pallas_igr = (
            mixed and not lipschitz
            and jax.default_backend() not in ("cpu",)
        )

    def step(trainable, opt_state, xb, yb, rng, epoch):
        xb = shard_batch(xb, mesh)
        yb = shard_batch(yb, mesh)

        def objective(tr):
            apply_fn = _bind_apply(model, rng, pallas_igr=pallas_igr,
                                   mesh=mesh)
            if mixed:
                inner = apply_fn
                wrapped = lambda p, x, _f=inner: _f(
                    _cast_bf16(p), x.astype(jnp.bfloat16)
                ).astype(jnp.float32)
                fast = getattr(inner, "_implicitnet_fast", None)
                if fast is not None:
                    def _fast_mixed(p, x, _fast=fast):
                        v, g = _fast(_cast_bf16(p), x.astype(jnp.bfloat16))
                        return v.astype(jnp.float32), g.astype(jnp.float32)
                    wrapped._implicitnet_fast = _fast_mixed
                apply_fn = wrapped
                tr = dict(tr)  # params stay f32 masters; cast happens inside
            value = loss_fn(
                tr["params"], apply_fn, xb, yb, epoch, rng=rng, aux=tr["aux"]
            )
            if lipschitz and model.lipschitz_weight > 0:
                # arXiv:2202.08345 eq. 7: alpha * prod softplus(c_i)
                value = value + model.lipschitz_weight * model.lipschitz_bound(
                    tr["params"]
                )
            return value

        def run():
            return jax.value_and_grad(objective)(trainable)

        if matmul_precision is not None and not mixed:
            prec = ("bfloat16" if matmul_precision == "bfloat16_mxu"
                    else matmul_precision)
            with jax.default_matmul_precision(prec):
                loss_val, grads = run()
        else:
            loss_val, grads = run()
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss_val

    return step


def make_epoch_fn(
    model,
    loss_fn,
    optimizer: optax.GradientTransformation,
    batch_size: int,
    n_points: int,
    mesh=None,
    matmul_precision: Optional[str] = None,
    pallas_igr: Optional[bool] = None,
) -> Callable:
    """One full epoch as a single jitted call: shuffle + scan over batches."""
    n_batches = max(1, n_points // batch_size)
    step = make_train_step(model, loss_fn, optimizer, mesh, matmul_precision,
                           pallas_igr)

    @jax.jit
    def epoch_fn(trainable, opt_state, X, Y, rng, epoch):
        perm_rng, step_rng = jax.random.split(rng)
        perm = jax.random.permutation(perm_rng, n_points)[: n_batches * batch_size]
        perm = perm.reshape(n_batches, batch_size)

        def body(carry, idx):
            trainable, opt_state, i = carry
            rng_i = jax.random.fold_in(step_rng, i)
            xb = jnp.take(X, idx, axis=0)
            yb = jnp.take(Y, idx, axis=0)
            trainable, opt_state, loss_val = step(
                trainable, opt_state, xb, yb, rng_i, epoch
            )
            return (trainable, opt_state, i + 1), loss_val

        (trainable, opt_state, _), losses = jax.lax.scan(
            body, (trainable, opt_state, 0), perm
        )
        return trainable, opt_state, jnp.mean(losses)

    return epoch_fn


def make_multi_epoch_fn(
    model,
    loss_fn,
    optimizer: optax.GradientTransformation,
    batch_size: int,
    n_points: int,
    n_val: int,
    epochs_per_call: int,
    mesh=None,
    matmul_precision: Optional[str] = None,
    pallas_igr: Optional[bool] = None,
) -> Callable:
    """Run `epochs_per_call` full epochs (+ per-epoch validation) in ONE
    jitted call, returning per-epoch (train_losses, val_losses) vectors plus
    the BEST-validation-epoch snapshot within the block.

    Amortises host<->device dispatch latency (dominant on small models over
    the axon relay: ~1s per sync). The best-epoch (trainable, opt_state) is
    carried through the scan (selected by val-loss improvement against the
    incoming ``best_val``), so the best checkpoint holds the params from the
    best epoch even when it falls mid-block — the reference keeps per-epoch
    best-model cadence (executor/executor.py:209-214) and epochs_per_call
    must not degrade it. ``best_idx`` is the block-relative index of that
    epoch (-1 when nothing improved)."""
    n_batches = max(1, n_points // batch_size)
    step = make_train_step(model, loss_fn, optimizer, mesh, matmul_precision,
                           pallas_igr)
    vb = min(batch_size, max(1, n_val))
    n_vbatches = max(1, n_val // vb) if n_val > 0 else 0
    v_used = n_vbatches * vb

    @jax.jit
    def multi_epoch_fn(trainable, opt_state, X, Y, Xv, Yv, rng, epoch0,
                       best_val, block):
        def one_epoch(carry, ek):
            e, k = ek
            trainable, opt_state, best_val, best_tr, best_st, best_idx = carry
            erng = jax.random.fold_in(rng, e)
            perm_rng, step_rng = jax.random.split(erng)
            perm = jax.random.permutation(perm_rng, n_points)[
                : n_batches * batch_size
            ].reshape(n_batches, batch_size)

            def body(c2, idx):
                tr, st, i = c2
                rng_i = jax.random.fold_in(step_rng, i)
                xb = jnp.take(X, idx, axis=0)
                yb = jnp.take(Y, idx, axis=0)
                tr, st, lv = step(tr, st, xb, yb, rng_i, e)
                return (tr, st, i + 1), lv

            (new_tr, new_st, _), losses = jax.lax.scan(
                body, (trainable, opt_state, 0), perm
            )
            # a final partial block (c.epochs - epoch0 < epochs_per_call)
            # must NOT advance state past the configured epoch budget: the
            # scan length is static, so epochs k >= block become no-ops
            live = k < block
            sel = lambda n, o: jax.tree_util.tree_map(
                lambda a, b: jnp.where(live, a, b), n, o
            )
            trainable = sel(new_tr, trainable)
            opt_state = sel(new_st, opt_state)
            train_loss = jnp.mean(losses)

            if n_val > 0:
                Xs = Xv[:v_used].reshape(n_vbatches, -1, Xv.shape[-1])
                Ys = Yv[:v_used].reshape(n_vbatches, -1, Yv.shape[-1])

                def vbody(_, xy):
                    xb, yb = xy
                    xb = shard_batch(xb, mesh)
                    yb = shard_batch(yb, mesh)
                    apply_fn = _bind_apply(model, None)
                    lv = loss_fn(
                        trainable["params"], apply_fn, xb, yb, e,
                        rng=jax.random.PRNGKey(0), aux=trainable["aux"],
                    )
                    return None, lv

                _, vlosses = jax.lax.scan(vbody, None, (Xs, Ys))
                val_loss = jnp.mean(vlosses)
            else:
                val_loss = train_loss

            better = live & (val_loss < best_val)
            best_val = jnp.where(better, val_loss, best_val)
            best_idx = jnp.where(better, k, best_idx)
            pick = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(better, n, o), new, old
            )
            best_tr = pick(trainable, best_tr)
            best_st = pick(opt_state, best_st)
            return (
                (trainable, opt_state, best_val, best_tr, best_st, best_idx),
                (train_loss, val_loss),
            )

        init = (
            trainable, opt_state, jnp.asarray(best_val, jnp.float32),
            trainable, opt_state, jnp.asarray(-1, jnp.int32),
        )
        epochs = epoch0 + jnp.arange(epochs_per_call)
        ks = jnp.arange(epochs_per_call, dtype=jnp.int32)
        (trainable, opt_state, _, best_tr, best_st, best_idx), (tl, vl) = (
            jax.lax.scan(one_epoch, init, (epochs, ks))
        )
        return trainable, opt_state, tl, vl, best_tr, best_st, best_idx

    return multi_epoch_fn


def make_val_fn(model, loss_fn, batch_size: int, n_points: int, mesh=None) -> Callable:
    n_batches = max(1, n_points // batch_size)
    used = min(n_points, n_batches * batch_size)

    @jax.jit
    def val_fn(trainable, X, Y, epoch):
        Xs = X[:used].reshape(n_batches, -1, X.shape[-1])
        Ys = Y[:used].reshape(n_batches, -1, Y.shape[-1])

        def body(_, xy):
            xb, yb = xy
            xb = shard_batch(xb, mesh)
            yb = shard_batch(yb, mesh)
            apply_fn = _bind_apply(model, None)
            lv = loss_fn(
                trainable["params"], apply_fn, xb, yb, epoch,
                rng=jax.random.PRNGKey(0), aux=trainable["aux"],
            )
            return None, lv

        _, losses = jax.lax.scan(body, None, (Xs, Ys))
        return jnp.mean(losses)

    return val_fn


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

class Trainer:
    """Orchestrates sampling -> training -> checkpointing for one config.

    Directory-tree provenance matches the reference
    (executor/executor.py:29-48): hyperparameters encoded in folder names,
    with models/ postprocess/ plots/ leaves.
    """

    def __init__(self, config: Configuration, mesh=None, init_seed: int = 0):
        self.config = config
        self.mesh = mesh
        self.init_seed = init_seed
        self.geometry_name = config.name

        c = config
        self.main_path = create_directory(
            os.path.join(c.directory, f"r_{self.geometry_name}")
        )
        self.data_path = create_directory(
            os.path.join(
                self.main_path,
                f"config_uniform{c.uniform_points},surface_{c.surface},"
                f"narrowband_{c.narrowband},narrowband_width_{c.narrowband_width}",
            )
        )
        with open(os.path.join(self.data_path, "info.txt"), "w") as f:
            f.write(
                f"config_uniform{c.uniform_points},surface_{c.surface},"
                f"narrowband_{c.narrowband},narrowband_width_{c.narrowband_width}"
            )
        self.model_path = create_directory(
            os.path.join(
                self.data_path,
                f"{c.model_name},hidden_dim_{c.hidden_dim},"
                f"num_hidden_layers_{c.num_hidden_layers},"
                f"skip_connection_{c.skip_connection},beta_{c.beta},"
                f"geometric_init_{c.geometric_init}",
            )
        )
        self.loss_path = create_directory(
            os.path.join(self.model_path, f"loss_{c.loss_name}")
        )
        self.train_path = create_directory(
            os.path.join(
                self.loss_path,
                f"lr_{c.lr},epochs_{c.epochs},min_epochs_{c.minepochs},"
                f"batch_size_{c.batchsize}",
            )
        )
        self.model_save_path = create_directory(
            os.path.join(self.train_path, "models")
        )
        self.postprocess_save_path = create_directory(
            os.path.join(self.train_path, "postprocess")
        )
        self.plot_save_path = create_directory(os.path.join(self.train_path, "plots"))

        self.model = config.make_model()
        self.loss = config.make_loss()

        if getattr(config, "debug_nans", False):
            jax.config.update("jax_debug_nans", True)

    # -- sampling ----------------------------------------------------------

    def rescale(self) -> str:
        from ..geometry.rescale import rescale_file

        self.rescaled_path = os.path.join(
            self.main_path, self.geometry_name + "_rescaled.stl"
        )
        return rescale_file(self.config.geometry, self.rescaled_path)

    def sampling(self) -> None:
        """cf. Executor.sampling (executor.py:86-111); the reference's
        existence check looked for a file literally named "narrow" (no .csv)
        — fixed here."""
        c = self.config
        if "pcd" in c.name:
            return
        if any(
            os.path.exists(os.path.join(self.data_path, f))
            for f in ("uniform.csv", "surface.csv", "narrow.csv")
        ):
            return
        if c.two_dim:
            from ..sampling.sampler import generate_points_circle

            generate_points_circle(
                c.uniform_points, c.surface, c.narrowband, c.narrowband_width,
                save_path=self.data_path,
            )
            return
        geometry_path = self.rescale() if c.rescale else c.geometry
        from ..sampling.sampler import generate_signed_distance_data

        df_uniform, df_surface, df_narrow = generate_signed_distance_data(
            geometry_path, c.uniform_points, c.surface, c.narrowband,
            c.narrowband_width,
        )
        df_uniform.to_csv(os.path.join(self.data_path, "uniform.csv"))
        df_surface.to_csv(os.path.join(self.data_path, "surface.csv"))
        df_narrow.to_csv(os.path.join(self.data_path, "narrow.csv"))

    # -- training ----------------------------------------------------------

    def _make_optimizer(self, n_train: int) -> optax.GradientTransformation:
        c = self.config
        lr_step = getattr(c, "lr_step", 0)
        if lr_step and lr_step > 0:
            steps_per_epoch = max(1, n_train // min(c.batchsize, n_train))
            schedule = optax.exponential_decay(
                c.lr,
                transition_steps=lr_step * steps_per_epoch,
                decay_rate=getattr(c, "lr_gamma", 0.5),
                staircase=True,
            )
            return optax.adam(schedule)
        return optax.adam(c.lr)

    def _init_trainable(self, concrete: bool = True) -> Dict[str, Any]:
        if concrete:
            params = self.model.init(jax.random.PRNGKey(self.init_seed))
        else:
            # structure-only template (checkpoint restore): eval_shape skips
            # the init compile + device work entirely (~10 s through the
            # axon relay for an eval-only caller like post_process)
            shapes = jax.eval_shape(
                self.model.init, jax.random.PRNGKey(self.init_seed)
            )
            params = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype), shapes
            )
        aux = {}
        for name in getattr(self.loss, "needs_aux", ()):
            # learnable scalar, e.g. GaussBonnet Euler characteristic
            aux[name] = jnp.asarray(2.0) if concrete else np.zeros(())
        return {"params": params, "aux": aux}

    def train(self, dataset: Optional[SDFDataset] = None) -> Dict[str, Any]:
        c = self.config
        if dataset is None:
            try:
                self.sampling()
            except Exception as exc:
                print(f"Sampling failed: {exc}")
                raise
            dataset = load_data(self.data_path, c)

        X = jnp.asarray(dataset.train_x)
        Y = jnp.asarray(dataset.train_y)
        Xv = jnp.asarray(dataset.val_x)
        Yv = jnp.asarray(dataset.val_y)

        optimizer = self._make_optimizer(dataset.n_train)
        trainable = self._init_trainable()
        opt_state = optimizer.init(trainable)

        start_epoch = 0
        train_losses: list = []
        val_losses: list = []
        best_val = float("inf")

        best_path = os.path.join(self.model_save_path, "best_model.ckpt")
        if c.contd and os.path.exists(best_path):
            template = {
                "trainable": trainable,
                "opt_state": opt_state,
                "epoch": 0,
                "train_losses": np.zeros(0, np.float64),
                "val_losses": np.zeros(0, np.float64),
                "best_val": 0.0,
            }
            state = ckpt.load_checkpoint(best_path, template)
            trainable = state["trainable"]
            opt_state = state["opt_state"]  # optimizer state RESUMES (fix)
            start_epoch = int(state["epoch"]) + 1
            train_losses = list(np.asarray(state["train_losses"]))
            val_losses = list(np.asarray(state["val_losses"]))
            best_val = float(state["best_val"])
            print(f"Resumed from {best_path} at epoch {start_epoch}")

        batch = min(c.batchsize, dataset.n_train)
        epochs_per_call = max(1, getattr(c, "epochs_per_call", 1))
        prec = getattr(c, "train_matmul_precision", None)
        multi_epoch_fn = make_multi_epoch_fn(
            self.model, self.loss, optimizer, batch, dataset.n_train,
            dataset.n_val, epochs_per_call, self.mesh,
            matmul_precision=prec,
        )

        loss_log = os.path.join(self.train_path, "train_loss.txt")
        epochs_no_improve = 0
        # per-epoch rng = fold_in(root, epoch): the schedule is independent of
        # the epochs_per_call block structure (equivalence-tested)
        root_rng = jax.random.PRNGKey(self.init_seed + 1)
        t_start = time.time()
        points_per_epoch = (dataset.n_train // batch) * batch

        final_epoch = start_epoch - 1
        stop = False
        epoch0 = start_epoch
        while epoch0 < c.epochs and not stop:
            block = min(epochs_per_call, c.epochs - epoch0)
            (trainable, opt_state, tl_vec, vl_vec,
             best_tr, best_st, best_idx) = multi_epoch_fn(
                trainable, opt_state, X, Y, Xv, Yv, root_rng, epoch0,
                jnp.float32(best_val), jnp.int32(block),
            )
            tl_vec = np.asarray(tl_vec)[:block]
            vl_vec = np.asarray(vl_vec)[:block]

            last_improve_k = -1
            for k in range(block):
                epoch = epoch0 + k
                final_epoch = epoch
                train_loss = float(tl_vec[k])
                val_loss = float(vl_vec[k])
                train_losses.append(train_loss)
                val_losses.append(val_loss)
                with open(loss_log, "a") as f:
                    f.write(f"{epoch} {train_loss} {val_loss}\n")
                if val_loss < best_val:
                    best_val = val_loss
                    epochs_no_improve = 0
                    last_improve_k = k
                else:
                    epochs_no_improve += 1
                if epoch >= c.minepochs and epochs_no_improve >= c.patience:
                    print(f"Early stopping at epoch {epoch}")
                    stop = True
                    break

            state = {
                "trainable": trainable,
                "opt_state": opt_state,
                "epoch": final_epoch,
                "train_losses": np.asarray(train_losses),
                "val_losses": np.asarray(val_losses),
                "best_val": best_val,
            }
            bi = int(best_idx)  # always < block: dead epochs can't win
            if bi >= 0 or last_improve_k >= 0:
                # the scan carried the best-val epoch's snapshot; save THOSE
                # params (mid-block bests are not lost — reference cadence
                # executor.py:209-214). When early stop fires mid-block the
                # device best can come from a (legitimately trained) epoch
                # after the stop trigger; it is still this run's true best,
                # so keep checkpoint/best_val/history CONSISTENT by adopting
                # it rather than leaving best_model.ckpt stale. Gate on the
                # DEVICE best_idx, not the host loop's last_improve_k: the
                # host breaks at the stop epoch and never sees a post-break
                # improvement, so last_improve_k can be -1 while bi >= 0.
                if bi >= 0 and bi != last_improve_k:
                    best_val = float(vl_vec[bi])
                adopted_k = bi if bi >= 0 else last_improve_k
                # history saved with the best checkpoint must reach its
                # epoch: if the host loop broke early, extend with the
                # device-measured rows so a resume's start_epoch never
                # exceeds the history length
                hist_end = max(final_epoch - epoch0, adopted_k) + 1
                tl_full = train_losses[: len(train_losses) - (final_epoch - epoch0 + 1)] \
                    + list(tl_vec[:hist_end].astype(float))
                vl_full = val_losses[: len(val_losses) - (final_epoch - epoch0 + 1)] \
                    + list(vl_vec[:hist_end].astype(float))
                ckpt.save_checkpoint(
                    best_path,
                    {**state,
                     "trainable": jax.device_get(best_tr),
                     "opt_state": jax.device_get(best_st),
                     "best_val": best_val,
                     "train_losses": np.asarray(tl_full),
                     "val_losses": np.asarray(vl_full),
                     "epoch": epoch0 + adopted_k},
                )
            block_end = epoch0 + block
            if (block_end % c.checkpointing) < block or block >= c.checkpointing:
                ckpt.save_checkpoint(
                    os.path.join(
                        self.model_save_path, f"model_epoch{final_epoch}.ckpt"
                    ),
                    state,
                )
                self._plot_losses(train_losses, val_losses)
            epoch0 = block_end

        elapsed = time.time() - t_start
        n_epochs_run = final_epoch - start_epoch + 1
        throughput = points_per_epoch * n_epochs_run / max(elapsed, 1e-9)
        print(
            f"Training done: {n_epochs_run} epochs, {elapsed:.1f}s, "
            f"{throughput:,.0f} points/sec"
        )
        self._plot_losses(train_losses, val_losses)
        return {
            "trainable": trainable,
            "opt_state": opt_state,
            "train_losses": train_losses,
            "val_losses": val_losses,
            "best_val": best_val,
            "epochs_run": n_epochs_run,
            "points_per_sec": throughput,
            "last_epoch": final_epoch,
        }

    # -- checkpoint loading -------------------------------------------------

    def load_model(self, best: bool = True):
        """Returns (trainable, epoch). cf. Executor.load_model
        (executor.py:258-300)."""
        trainable = self._init_trainable(concrete=False)
        # structure-only template; schedule presence must match training
        optimizer = self._make_optimizer(self.config.batchsize)
        template = {
            "trainable": trainable,
            "opt_state": optimizer.init(trainable),
            "epoch": 0,
            "train_losses": np.zeros(0, np.float64),
            "val_losses": np.zeros(0, np.float64),
            "best_val": 0.0,
        }
        best_path = os.path.join(self.model_save_path, "best_model.ckpt")
        if best and os.path.exists(best_path):
            state = ckpt.load_checkpoint(best_path, template)
            return state["trainable"], int(state["epoch"])
        newest = ckpt.latest_epoch_checkpoint(self.model_save_path)
        if newest is None:
            if os.path.exists(best_path):
                state = ckpt.load_checkpoint(best_path, template)
                return state["trainable"], int(state["epoch"])
            raise FileNotFoundError(
                f"No checkpoint found in {self.model_save_path}"
            )
        state = ckpt.load_checkpoint(newest[0], template)
        return state["trainable"], newest[1]

    # -- plots -------------------------------------------------------------

    def _plot_losses(self, train_losses, val_losses) -> None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots()
            ax.plot(train_losses, label="train")
            ax.plot(val_losses, label="val")
            ax.set_xlabel("epoch")
            ax.set_ylabel("loss")
            ax.set_yscale("log")
            ax.legend()
            fig.savefig(os.path.join(self.plot_save_path, "loss_curve.png"), dpi=100)
            plt.close(fig)
        except Exception as exc:
            print(f"loss plot failed: {exc}")

    # -- mode dispatch (cf. Executor.run, executor.py:481-499) -------------

    def run(self):
        c = self.config
        if c.samplingonly:
            return self.sampling()
        if c.ppo:
            if c.reconstruct:
                from ..evaluations.reconstruct import reconstruct_only

                return reconstruct_only(self)
            from ..evaluations.post_process import post_process

            return post_process(self)
        result = self.train()
        if c.two_dim:
            from ..evaluations.two_dim import two_dim_contour

            two_dim_contour(self)
        return result
