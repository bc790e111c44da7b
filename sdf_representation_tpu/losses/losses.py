"""The SDF loss zoo — pure functions over (params, apply_fn, x, y, epoch).

Functional rebuild of the reference loss classes (reference model/losses.py).
Calling convention (all losses):

    loss(params, apply_fn, x_batch, y_batch, epoch, rng=None, aux=None) -> scalar

where y_batch[:, 0] is the target signed distance and y_batch[:, 1:4] the
target surface normal (losses.py:5, :24, :124). ``aux`` carries extra
*learnable* scalars (GaussBonnetLoss's Euler characteristic). ``rng`` feeds
losses that draw sample points (IGRLOSSPCD).

Intentional fixes vs the reference, each with a regression test:
  * Predictions are (B,) — the reference's (B,1) vs (B,) tensors silently
    broadcast to (B,B) inside several losses (e.g. losses.py:30, :63-68).
  * IGRLOSS normalises the predicted normal per-row; the reference divides by
    the GLOBAL norm of the whole batch (losses.py:129) which makes the
    cosine-similarity argument non-unit. Documented divergence.
  * RegularizedCustomSDFLoss is implemented (the reference version references
    undefined variables and raises NameError — losses.py:203).
  * GaussBonnetLoss takes its Euler characteristic through ``aux`` so it works
    with the standard trainer call (the reference's extra positional arg made
    it incompatible — losses.py:218 vs executor.py:170-173).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..ops.diffops import (
    compute_gaussian_curvature,
    sdf_and_gradient_fwd,
)

ApplyFn = Callable[..., jnp.ndarray]


def _sdf(apply_fn: ApplyFn, params, x: jnp.ndarray) -> jnp.ndarray:
    out = apply_fn(params, x)
    return out.reshape(x.shape[0])


@dataclasses.dataclass(frozen=True)
class MSELoss:
    """Plain mean squared error (cf. reference losses.py:19-31)."""

    def __call__(self, params, apply_fn, x_batch, y_batch, epoch, rng=None, aux=None):
        y_true = y_batch[:, 0]
        y_pred = _sdf(apply_fn, params, x_batch)
        return jnp.mean((y_true - y_pred) ** 2)


@dataclasses.dataclass(frozen=True)
class CustomSDFLoss:
    """DeepSDF clamp loss: MSE of clamped prediction vs clamped target
    (cf. reference losses.py:33-48)."""

    delta: float = 0.1

    def __call__(self, params, apply_fn, x_batch, y_batch, epoch, rng=None, aux=None):
        d = self.delta
        pred = jnp.clip(_sdf(apply_fn, params, x_batch), -d, d)
        true = jnp.clip(y_batch[:, 0], -d, d)
        return jnp.mean((pred - true) ** 2)


@dataclasses.dataclass(frozen=True)
class WeightedSmoothL2Loss:
    """Near-surface-weighted clamped L2 — the default loss in shipped configs
    (cf. reference losses.py:50-69; tests/test_config.ini:16).

    weight = 1 + weight_factor * exp(-|y_true|)."""

    weight_factor: float = 0.5
    delta: float = 0.1

    def __call__(self, params, apply_fn, x_batch, y_batch, epoch, rng=None, aux=None):
        d = self.delta
        y_true = jnp.clip(y_batch[:, 0], -d, d)
        y_pred = jnp.clip(_sdf(apply_fn, params, x_batch), -d, d)
        err = y_true - y_pred
        weight = 1.0 + self.weight_factor * jnp.exp(-jnp.abs(y_true))
        return jnp.mean(weight * err * err)


@dataclasses.dataclass(frozen=True)
class CombinedLoss:
    """alpha * L1 + (1 - alpha) * weighted-L2 of clamped values
    (cf. reference losses.py:71-94; the hard-coded .cuda() is gone)."""

    weight_factor: float = 0.5
    delta: float = 0.1
    alpha: float = 0.8

    def __call__(self, params, apply_fn, x_batch, y_batch, epoch, rng=None, aux=None):
        d = self.delta
        y_true = jnp.clip(y_batch[:, 0], -d, d)
        y_pred = jnp.clip(_sdf(apply_fn, params, x_batch), -d, d)
        err = y_true - y_pred
        abs_err = jnp.abs(err) + 1e-8
        l1 = jnp.mean(jnp.abs(err))
        weight = 1.0 + self.weight_factor * jnp.exp(-jnp.abs(y_true) / d)
        l2 = jnp.mean(weight * abs_err * abs_err)
        return self.alpha * l1 + (1.0 - self.alpha) * l2


@dataclasses.dataclass(frozen=True)
class IGRLOSS:
    """Clamped SDF MSE + normal-consistency + eikonal regularisers
    (cf. reference losses.py:96-137).

    Both regularisers only fire where |clamped target| < regularizer_threshold;
    elsewhere they contribute the reference's 1e-8 floor.
    """

    delta: float = 0.1
    tau: float = 1.0
    lambda_g: float = 0.1
    regularizer_threshold: float = 1.0
    # 1.0 reproduces the reference's batch-GLOBAL normal normalisation quirk
    # (losses.py:129) bit-for-bit compatibility; 0.0 (default) normalises
    # per row, which is what cosine similarity actually requires
    global_norm_quirk: float = 0.0

    def __call__(self, params, apply_fn, x_batch, y_batch, epoch, rng=None, aux=None):
        d = self.delta
        pred_raw, grad = sdf_and_gradient_fwd(apply_fn, params, x_batch)
        normal = grad[:, -3:]
        pred = jnp.clip(pred_raw, -d, d)
        true = jnp.clip(y_batch[:, 0], -d, d)
        sdf_loss = (pred - true) ** 2

        grad_norm = jnp.linalg.norm(normal, axis=-1)
        true_normal = y_batch[:, 1:4]
        if self.global_norm_quirk > 0:
            unit_normal = normal / (jnp.linalg.norm(normal) + 1e-12)
        else:
            unit_normal = normal / (grad_norm[:, None] + 1e-12)
        unit_true = true_normal / (
            jnp.linalg.norm(true_normal, axis=-1, keepdims=True) + 1e-12
        )
        cos = jnp.sum(unit_normal * unit_true, axis=-1)
        near = jnp.abs(true) < self.regularizer_threshold
        reg = jnp.where(near, (1.0 - cos) ** 2, 1e-8)
        eik = jnp.where(near, (grad_norm - 1.0) ** 2, 1e-8)
        return (
            jnp.mean(sdf_loss)
            + self.tau * jnp.mean(reg)
            + self.lambda_g * jnp.mean(eik)
        )


@dataclasses.dataclass(frozen=True)
class IGRLOSSPCD:
    """Point-cloud IGR loss: |f| on surface points + eikonal at perturbed
    points (cf. reference losses.py:138-185)."""

    delta: float = 0.1
    tau: float = 1.0
    lambda_g: float = 0.1
    regularizer_threshold: float = 1.0
    local_sigma: float = 0.01
    global_sigma: float = 0.1

    def get_points(self, rng: jax.Array, pc_input: jnp.ndarray) -> jnp.ndarray:
        """Local gaussian perturbations + n/8 global uniform samples
        (cf. reference losses.py:173-185)."""
        n, dim = pc_input.shape
        k1, k2 = jax.random.split(rng)
        local = pc_input + self.local_sigma * jax.random.normal(k1, pc_input.shape)
        glob = jax.random.uniform(
            k2, (n // 8, dim), minval=-self.global_sigma, maxval=self.global_sigma
        )
        return jnp.concatenate([local, glob], axis=0)

    def __call__(self, params, apply_fn, x_batch, y_batch, epoch, rng=None, aux=None):
        pred = _sdf(apply_fn, params, x_batch)
        mnfld_loss = jnp.mean(pred**2)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        sample_pts = self.get_points(rng, x_batch)
        _, grad = sdf_and_gradient_fwd(apply_fn, params, sample_pts)
        grad_norm = jnp.linalg.norm(grad[:, -3:], axis=-1)
        eik = jnp.mean((grad_norm - 1.0) ** 2)
        return mnfld_loss + self.lambda_g * eik


@dataclasses.dataclass(frozen=True)
class RegularizedCustomSDFLoss:
    """Clamped MSE + near-surface normal L2 regulariser.

    The reference version (losses.py:186-205) raises NameError on undefined
    ``true_surface_normal``/``surface_normal``; this is the working
    implementation of its evident intent."""

    delta: float = 0.1
    threshold: float = 1.0
    regularizer_weight: float = 100.0

    def __call__(self, params, apply_fn, x_batch, y_batch, epoch, rng=None, aux=None):
        d = self.delta
        pred_raw, grad = sdf_and_gradient_fwd(apply_fn, params, x_batch)
        pred = jnp.clip(pred_raw, -d, d)
        true = jnp.clip(y_batch[:, 0], -d, d)
        sdf_loss = (pred - true) ** 2
        normal = grad[:, -3:]
        true_normal = y_batch[:, 1:4]
        near = jnp.abs(true) < self.threshold
        reg = jnp.where(
            near, jnp.sum((true_normal - normal) ** 2, axis=-1), 0.0
        )
        return jnp.mean(sdf_loss) + self.regularizer_weight * jnp.mean(reg)


@dataclasses.dataclass(frozen=True)
class GaussBonnetLoss:
    """Clamped MSE + near-surface (normal + eikonal + Gauss–Bonnet) terms with
    a learnable Euler characteristic (cf. reference losses.py:206-282).

    The Euler characteristic arrives via ``aux['euler_characteristic']`` so the
    standard 5-arg trainer call works (the reference's extra positional arg
    made this loss untrainable — losses.py:218, executor.py:170-173)."""

    delta: float = 0.1
    tau: float = 1.0
    lambda_g: float = 0.1
    regularizer_threshold: float = 1.0
    gauss_bonnet_weight: float = 0.1

    needs_aux = ("euler_characteristic",)

    def __call__(self, params, apply_fn, x_batch, y_batch, epoch, rng=None, aux=None):
        euler = (
            aux["euler_characteristic"] if aux is not None else jnp.asarray(2.0)
        )
        d = self.delta
        pred_raw, grad = sdf_and_gradient_fwd(apply_fn, params, x_batch)
        normal = grad[:, -3:]
        pred = jnp.clip(pred_raw, -d, d)
        true = jnp.clip(y_batch[:, 0], -d, d)
        sdf_loss = (pred - true) ** 2

        grad_norm = jnp.linalg.norm(normal, axis=-1)
        true_normal = y_batch[:, 1:4]
        unit_normal = normal / (grad_norm[:, None] + 1e-12)
        unit_true = true_normal / (
            jnp.linalg.norm(true_normal, axis=-1, keepdims=True) + 1e-12
        )
        cos = jnp.sum(unit_normal * unit_true, axis=-1)
        curvature = compute_gaussian_curvature(apply_fn, params, x_batch)
        near = jnp.abs(true) < self.regularizer_threshold
        reg = jnp.where(
            near,
            self.tau * (1.0 - cos) ** 2
            + self.lambda_g * (grad_norm - 1.0) ** 2
            + self.gauss_bonnet_weight
            * (curvature - 2.0 * jnp.pi * euler) ** 2,
            1e-8,
        )
        return jnp.mean(sdf_loss) + jnp.mean(reg)


LOSS_REGISTRY: Dict[str, type] = {
    "MSELoss": MSELoss,
    "CustomSDFLoss": CustomSDFLoss,
    "WeightedSmoothL2Loss": WeightedSmoothL2Loss,
    "CombinedLoss": CombinedLoss,
    "IGRLOSS": IGRLOSS,
    "IGRLOSSPCD": IGRLOSSPCD,
    "RegularizedCustomSDFLoss": RegularizedCustomSDFLoss,
    "GaussBonnetLoss": GaussBonnetLoss,
}


def get_loss_class(name: str):
    try:
        return LOSS_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unsupported loss function: {name}. Available: {sorted(LOSS_REGISTRY)}"
        ) from None


def register_loss(name: str, cls) -> None:
    LOSS_REGISTRY[name] = cls
