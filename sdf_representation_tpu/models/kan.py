"""KAN — Kolmogorov-Arnold network with B-spline edge activations.

Functional JAX rebuild of the reference KAN/KANLinear
(reference model/networks.py:214-490): per-layer learnable grid of B-spline
knots, Cox–de Boor basis recursion, base path (SiLU + linear) plus spline
path, least-squares ``curve2coeff`` initialisation, adaptive ``update_grid``,
and the L1+entropy regularisation used by the reference.

Layout choices (TPU-first):
  * base weight stored (in, out) so the base path is one MXU matmul.
  * spline contraction is an einsum 'bic,ico->bo' which XLA lowers to a single
    reshaped matmul (B, in*coeff) @ (in*coeff, out).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def b_splines(x: jnp.ndarray, grid: jnp.ndarray, spline_order: int) -> jnp.ndarray:
    """Cox–de Boor recursion (cf. reference networks.py:286-319).

    x: (B, in); grid: (in, G + 2k + 1)  ->  bases (B, in, G + k)

    General path: handles arbitrary (per-input, non-uniform) knot vectors,
    e.g. after ``update_grid``. The hot training/eval path never runs this —
    the knot grid the framework actually trains with is the UNIFORM frozen
    buffer from ``default_grid``, for which ``b_splines_uniform`` evaluates
    the same values in one fused element-wise pass (see KANLayerSpec.apply).
    A windowed-gather variant (locate interval + 8-knot gather + local
    recursion) was tried and measured SLOWER than this full recursion on
    TPU (51 vs 32 ms/step on the 64x3 net): XLA element gathers run ~200M
    elem/s while these dense passes stream at HBM bandwidth.
    """
    x = x[..., None]  # (B, in, 1)
    bases = ((x >= grid[:, :-1]) & (x < grid[:, 1:])).astype(x.dtype)
    for k in range(1, spline_order + 1):
        left = (x - grid[:, : -(k + 1)]) / (grid[:, k:-1] - grid[:, : -(k + 1)])
        right = (grid[:, k + 1 :] - x) / (grid[:, k + 1 :] - grid[:, 1:-k])
        bases = left * bases[:, :, :-1] + right * bases[:, :, 1:]
    return bases


def b_splines_uniform(
    x: jnp.ndarray, g0: float, h: float, n_bases: int, spline_order: int
) -> jnp.ndarray:
    """Closed-form B-spline basis on a UNIFORM knot grid knot_j = g0 + (j-k)h.

    x: (B, in) -> bases (B, in, n_bases), identical values to ``b_splines``
    on ``KANLayerSpec.default_grid()`` (tests assert this). Basis c is
    supported on u = (x - knot_c)/h in [0, k+1); on uniform knots
    N_{c,k}(x) = B_k(u) with B_k the cardinal B-spline — a fixed piecewise
    polynomial. The whole (B, in, C) tensor is therefore ONE fused
    element-wise pass (broadcast subtract + k+1 polynomial pieces selected
    by floor(u)), with zero gathers and zero recursion passes: this is what
    takes KAN training from 115k to >500k pts/s on the v5e (the recursion
    pays ~2k full passes over a tensor with only k+1 non-zeros per point).

    Matches the recursion's half-open interval convention (x exactly on a
    knot belongs to the interval above it) including the dead last interval
    at the domain edge, because B_k here is built from the same recursion
    evaluated on integer knots.
    """
    k = spline_order
    if k not in (1, 2, 3):  # callers fall back to the general recursion
        raise ValueError(f"closed form implemented for k in 1..3, got {k}")
    u = (x[..., None] - g0) / h + k - jnp.arange(n_bases, dtype=x.dtype)
    inside = (u >= 0) & (u < k + 1)
    uc = jnp.clip(u, 0.0, k + 1.0)
    if k == 1:
        val = 1.0 - jnp.abs(uc - 1.0)
    elif k == 2:
        # pieces on [0,1),[1,2),[2,3): t=u-floor(u)
        t = uc - jnp.floor(uc)
        p0 = 0.5 * t * t
        p1 = 0.5 + t * (1.0 - t)
        p2 = 0.5 * (1.0 - t) ** 2
        piece = jnp.floor(uc)
        val = jnp.where(piece == 0, p0, jnp.where(piece == 1, p1, p2))
    else:
        t = uc - jnp.floor(uc)
        s = 1.0 - t
        p0 = t * t * t / 6.0
        p1 = (1.0 + 3.0 * t + 3.0 * t * t - 3.0 * t * t * t) / 6.0
        p2 = (1.0 + 3.0 * s + 3.0 * s * s - 3.0 * s * s * s) / 6.0
        p3 = s * s * s / 6.0
        piece = jnp.floor(uc)
        val = jnp.where(
            piece == 0,
            p0,
            jnp.where(piece == 1, p1, jnp.where(piece == 2, p2, p3)),
        )
    return jnp.where(inside, val, 0.0)


def curve2coeff(
    x: jnp.ndarray, y: jnp.ndarray, grid: jnp.ndarray, spline_order: int
) -> jnp.ndarray:
    """Least-squares spline coefficients interpolating (x, y)
    (cf. reference networks.py:321-351).

    x: (B, in); y: (B, in, out) -> coeffs (in, coeff, out)
    """
    A = jnp.transpose(b_splines(x, grid, spline_order), (1, 0, 2))  # (in, B, coeff)
    B = jnp.transpose(y, (1, 0, 2))  # (in, B, out)

    def solve(a, b):
        return jnp.linalg.lstsq(a, b)[0]

    return jax.vmap(solve)(A, B)  # (in, coeff, out)


def _kaiming_uniform(key, shape, fan_in, a):
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


@dataclasses.dataclass(frozen=True)
class KANLayerSpec:
    in_features: int
    out_features: int
    grid_size: int = 5
    spline_order: int = 3
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0
    standalone_scale_spline: bool = True
    grid_eps: float = 0.02
    grid_range: Tuple[float, float] = (-1.0, 1.0)

    def default_grid(self) -> jnp.ndarray:
        g0, g1 = self.grid_range
        h = (g1 - g0) / self.grid_size
        knots = (
            jnp.arange(-self.spline_order, self.grid_size + self.spline_order + 1)
            * h
            + g0
        )
        return jnp.broadcast_to(knots, (self.in_features, knots.shape[0])).astype(
            jnp.float32
        )

    def init(self, key: jax.Array) -> Params:
        kb, kn, ks = jax.random.split(key, 3)
        grid = self.default_grid()
        base_w = _kaiming_uniform(
            kb,
            (self.in_features, self.out_features),
            self.in_features,
            math.sqrt(5.0) * self.scale_base,
        )
        noise = (
            (jax.random.uniform(
                kn, (self.grid_size + 1, self.in_features, self.out_features)
            ) - 0.5)
            * self.scale_noise
            / self.grid_size
        )
        interior = grid.T[self.spline_order : -self.spline_order]  # (G+1, in)
        coeff = curve2coeff(interior, noise, grid, self.spline_order)
        if not self.standalone_scale_spline:
            coeff = coeff * self.scale_spline
        p = {"grid": grid, "base_w": base_w, "spline_w": coeff}
        if self.standalone_scale_spline:
            p["spline_scaler"] = _kaiming_uniform(
                ks,
                (self.in_features, self.out_features),
                self.in_features,
                math.sqrt(5.0) * self.scale_spline,
            )
        return p

    def scaled_spline_w(self, p: Params) -> jnp.ndarray:
        if self.standalone_scale_spline:
            return p["spline_w"] * p["spline_scaler"][:, None, :]
        return p["spline_w"]

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        base = jax.nn.silu(x) @ p["base_w"]
        n_bases = self.grid_size + self.spline_order
        # the knot grid is a BUFFER, not a trainable parameter (the
        # reference registers it as such): letting the optimizer move
        # knots eventually makes neighbours cross and the Cox-de Boor
        # divisions blow up (observed as NaN after ~100 Adam epochs).
        # stop_gradient keeps its grads — and Adam updates — zero.
        grid = jax.lax.stop_gradient(p["grid"])
        if self.spline_order in (1, 2, 3):
            # Fast path: while the knot grid is the untouched uniform
            # default_grid, the basis tensor is one fused element-wise
            # pass with STATIC g0/h (no grid reads at all) — the 4.8x KAN
            # training speedup. The dispatch is a runtime lax.cond on the
            # grid VALUES (a tiny reduction per layer), so it stays
            # correct for any params: after update_grid the stored knots
            # are non-uniform and the general recursion branch runs — at
            # the recursion's ~4.8x-slower pace (documented; see
            # docs/configuration.md). Keying on values rather than pytree
            # structure keeps checkpoints round-trippable through the
            # init-derived template before AND after update_grid.
            g0, g1 = self.grid_range
            h = (g1 - g0) / self.grid_size
            is_default = jnp.all(grid == self.default_grid())
            bases = jax.lax.cond(
                is_default,
                lambda xx: b_splines_uniform(
                    xx, g0, h, n_bases, self.spline_order
                ),
                lambda xx: b_splines(xx, grid, self.spline_order),
                x,
            )
        else:
            bases = b_splines(x, grid, self.spline_order)  # (B, in, coeff)
        spline = jnp.einsum("bic,ico->bo", bases, self.scaled_spline_w(p))
        return base + spline

    def regularization_loss(
        self, p: Params, regularize_activation=1.0, regularize_entropy=1.0
    ) -> jnp.ndarray:
        # mean-|coeff| proxy for L1 + entropy (cf. reference networks.py:420-440)
        l1 = jnp.abs(p["spline_w"]).mean(axis=1)  # (in, out)
        act = l1.sum()
        prob = l1 / act
        ent = -jnp.sum(prob * jnp.log(prob + 1e-12))
        return regularize_activation * act + regularize_entropy * ent

    def update_grid(self, p: Params, x: jnp.ndarray, margin: float = 0.01) -> Params:
        """Adapt knots to the data distribution (cf. reference networks.py:371-418)."""
        batch = x.shape[0]
        splines = b_splines(x, p["grid"], self.spline_order)  # (B, in, coeff)
        unreduced = jnp.einsum(
            "bic,ico->bio", splines, self.scaled_spline_w(p)
        )  # (B, in, out)
        x_sorted = jnp.sort(x, axis=0)
        idx = jnp.linspace(0, batch - 1, self.grid_size + 1).astype(jnp.int32)
        grid_adaptive = x_sorted[idx]
        step = (x_sorted[-1] - x_sorted[0] + 2 * margin) / self.grid_size
        grid_uniform = (
            jnp.arange(self.grid_size + 1, dtype=jnp.float32)[:, None] * step
            + x_sorted[0]
            - margin
        )
        grid = self.grid_eps * grid_uniform + (1 - self.grid_eps) * grid_adaptive
        lo = grid[:1] - step * jnp.arange(self.spline_order, 0, -1, dtype=jnp.float32)[
            :, None
        ]
        hi = grid[-1:] + step * jnp.arange(
            1, self.spline_order + 1, dtype=jnp.float32
        )[:, None]
        new_grid = jnp.concatenate([lo, grid, hi], axis=0).T  # (in, G+2k+1)
        new_coeff = curve2coeff(x, unreduced, new_grid, self.spline_order)
        out = dict(p)
        out["grid"] = new_grid
        out["spline_w"] = new_coeff
        # NOTE: no pytree-structure change — apply() dispatches on the grid
        # VALUES, so the adapted params keep the init-derived checkpoint
        # template and restore/resume keeps working after update_grid.
        # (A legacy "adaptive_grid" marker key from older checkpoints is
        # tolerated by checkpoint.load_checkpoint's alignment fallback.)
        out.pop("adaptive_grid", None)
        return out


@dataclasses.dataclass(frozen=True)
class KAN:
    """Stack of KANLinear layers; layers_hidden includes in/out dims,
    e.g. (3, 64, 64, 1) (cf. reference networks.py:443-490; the reference
    defaults grid_size=256 at the KAN level)."""

    layers_hidden: Tuple[int, ...] = (3, 64, 64, 1)
    grid_size: int = 256
    spline_order: int = 3
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0
    grid_eps: float = 0.02
    grid_range: Tuple[float, float] = (-1.0, 1.0)

    @property
    def layer_specs(self) -> Tuple[KANLayerSpec, ...]:
        return tuple(
            KANLayerSpec(
                in_features=i,
                out_features=o,
                grid_size=self.grid_size,
                spline_order=self.spline_order,
                scale_noise=self.scale_noise,
                scale_base=self.scale_base,
                scale_spline=self.scale_spline,
                grid_eps=self.grid_eps,
                grid_range=self.grid_range,
            )
            for i, o in zip(self.layers_hidden, self.layers_hidden[1:])
        )

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.layer_specs))
        return {
            "layers": [spec.init(k) for spec, k in zip(self.layer_specs, keys)]
        }

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for spec, p in zip(self.layer_specs, params["layers"]):
            h = spec.apply(p, h)
        return h[..., 0]

    def update_grid(self, params: Params, x: jnp.ndarray) -> Params:
        h = x
        new_layers = []
        for spec, p in zip(self.layer_specs, params["layers"]):
            p = spec.update_grid(p, h)
            new_layers.append(p)
            h = spec.apply(p, h)
        return {"layers": new_layers}

    def regularization_loss(
        self, params: Params, regularize_activation=1.0, regularize_entropy=1.0
    ) -> jnp.ndarray:
        return sum(
            spec.regularization_loss(p, regularize_activation, regularize_entropy)
            for spec, p in zip(self.layer_specs, params["layers"])
        )

    def __call__(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return self.apply(params, x)
