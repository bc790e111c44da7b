"""HashMLP — multiresolution hash encoding + small MLP (Instant-NGP style).

Beyond-parity model (technique: Müller et al. 2022, "Instant Neural Graphics
Primitives with a Multiresolution Hash Encoding" — see PAPERS.md): instead
of a deep 8x512 MLP, spatial detail lives in L levels of trainable feature
grids (dense at coarse levels, hashed at fine levels); a 2x64 MLP decodes
the concatenated interpolated features. For SDF fitting this converges
orders of magnitude faster per step and evaluates with ~100x fewer FLOPs
than the flagship ImplicitNet.

TPU notes: the per-level corner lookups are gathers from (T, F) tables —
XLA lowers them well at these sizes; the backward scatter-add is the only
non-matmul hot op. Tables are float32 (they ARE the model capacity; bf16
tables measurably hurt).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashMLP:
    """(B, 3) points in [-1, 1]^3 -> (B,) SDF."""

    d_in: int = 3
    n_levels: int = 8
    n_features: int = 2
    log2_table_size: int = 15
    base_resolution: int = 8
    max_resolution: int = 256
    hidden_dim: int = 64
    num_layers: int = 2
    include_xyz: bool = True

    @property
    def growth(self) -> float:
        if self.n_levels == 1:
            return 1.0
        import math

        return math.exp(
            (math.log(self.max_resolution) - math.log(self.base_resolution))
            / (self.n_levels - 1)
        )

    def level_resolution(self, level: int) -> int:
        return int(round(self.base_resolution * self.growth**level))

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, self.n_levels + self.num_layers + 1)
        tables = [
            jax.random.uniform(
                keys[l], (self.table_size, self.n_features), jnp.float32,
                -1e-4, 1e-4,
            )
            for l in range(self.n_levels)
        ]
        feat_dim = self.n_levels * self.n_features + (
            self.d_in if self.include_xyz else 0
        )
        dims = [feat_dim] + [self.hidden_dim] * (self.num_layers - 1) + [1]
        mlp = []
        for i in range(len(dims) - 1):
            k = keys[self.n_levels + i]
            bound = 1.0 / jnp.sqrt(dims[i])
            k1, k2 = jax.random.split(k)
            mlp.append(
                {
                    "w": jax.random.uniform(
                        k1, (dims[i], dims[i + 1]), jnp.float32, -bound, bound
                    ),
                    "b": jnp.zeros((dims[i + 1],), jnp.float32),
                }
            )
        return {"tables": tables, "mlp": mlp}

    def _encode_level(self, table, x01, res):
        """Trilinear-interpolated features at one level. x01 in [0,1]^3."""
        pos = x01 * res
        p0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - p0
        T = self.table_size

        def corner_index(p):
            # dense indexing when the grid fits the table, spatial hash beyond
            if (res + 1) ** 3 <= T:
                return (
                    p[..., 0] * (res + 1) * (res + 1)
                    + p[..., 1] * (res + 1)
                    + p[..., 2]
                )
            # uint32 wraparound arithmetic (primes exceed int32)
            pu = p.astype(jnp.uint32)
            h = pu[..., 0] * jnp.uint32(_PRIMES[0])
            h = h ^ (pu[..., 1] * jnp.uint32(_PRIMES[1]))
            h = h ^ (pu[..., 2] * jnp.uint32(_PRIMES[2]))
            return jnp.remainder(h, jnp.uint32(T)).astype(jnp.int32)

        feat = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    corner = p0 + jnp.asarray([dx, dy, dz], jnp.int32)
                    corner = jnp.clip(corner, 0, res)
                    w = (
                        (frac[..., 0] if dx else 1 - frac[..., 0])
                        * (frac[..., 1] if dy else 1 - frac[..., 1])
                        * (frac[..., 2] if dz else 1 - frac[..., 2])
                    )
                    feat = feat + w[..., None] * table[corner_index(corner)]
        return feat  # (B, F)

    def encode(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Fused-gather encoding: ONE (B*L*8,) gather from the stacked
        level tables instead of 64 per-level/per-corner gathers (and one
        scatter-add in the backward instead of 64) — the gathers, not the
        arithmetic, are the training bottleneck on TPU."""
        x01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
        B = x.shape[0]
        T = self.table_size
        L = self.n_levels
        F = self.n_features
        offs = jnp.asarray(
            [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
            jnp.int32,
        )  # (8, 3)
        idx_all = []
        w_all = []
        for l in range(L):
            res = self.level_resolution(l)
            pos = x01 * res
            p0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - p0
            corner = jnp.clip(p0[:, None, :] + offs[None], 0, res)  # (B,8,3)
            if (res + 1) ** 3 <= T:
                ci = (
                    corner[..., 0] * (res + 1) * (res + 1)
                    + corner[..., 1] * (res + 1)
                    + corner[..., 2]
                )
            else:
                cu = corner.astype(jnp.uint32)
                h = cu[..., 0] * jnp.uint32(_PRIMES[0])
                h = h ^ (cu[..., 1] * jnp.uint32(_PRIMES[1]))
                h = h ^ (cu[..., 2] * jnp.uint32(_PRIMES[2]))
                ci = jnp.remainder(h, jnp.uint32(T)).astype(jnp.int32)
            idx_all.append(ci + l * T)
            w = (
                jnp.where(offs[None, :, 0] == 1, frac[:, None, 0],
                          1.0 - frac[:, None, 0])
                * jnp.where(offs[None, :, 1] == 1, frac[:, None, 1],
                            1.0 - frac[:, None, 1])
                * jnp.where(offs[None, :, 2] == 1, frac[:, None, 2],
                            1.0 - frac[:, None, 2])
            )  # (B, 8)
            w_all.append(w)
        idx = jnp.stack(idx_all, axis=1)  # (B, L, 8)
        w = jnp.stack(w_all, axis=1)  # (B, L, 8)
        big = jnp.concatenate(params["tables"], axis=0)  # (L*T, F)
        g = jnp.take(big, idx.reshape(-1), axis=0).reshape(B, L, 8, F)
        feats = jnp.sum(w[..., None] * g, axis=2).reshape(B, L * F)
        if self.include_xyz:
            feats = jnp.concatenate([feats, x], axis=-1)
        return feats

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        h = self.encode(params, x)
        mlp = params["mlp"]
        for i, layer in enumerate(mlp):
            h = h @ layer["w"] + layer["b"]
            if i < len(mlp) - 1:
                h = jax.nn.relu(h)
        return h[..., 0]

    def __call__(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return self.apply(params, x)
