"""Siren — sinusoidal-activation MLP for implicit representations.

Beyond-parity model (technique: Sitzmann et al. 2020, "Implicit Neural
Representations with Periodic Activation Functions"): layers compute
sin(omega_0 * (x @ W + b)). Sine activations represent fine geometric
detail and yield smooth, well-behaved derivatives of ALL orders — the
eikonal / normal-consistency losses in this framework differentiate the
network w.r.t. its inputs, and sin networks carry no curvature nulls the
way softplus/ReLU nets do.

Initialization follows the paper exactly: first layer W ~ U(-1/n, 1/n);
hidden layers W ~ U(-sqrt(6/n)/omega_0, sqrt(6/n)/omega_0) so
pre-activations stay standard-normal through depth; the final linear
layer is un-activated.

TPU notes: pure matmul chain + elementwise sin — XLA fuses it like any
MLP here; weights are (in, out) for the MXU like the rest of the zoo.

INI: ``[Model] model = Siren`` with the shared hidden_dim /
num_hidden_layers / input_dim keys; ``omega_0`` optional (default 30).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Siren:
    d_in: int = 3
    hidden_dims: Tuple[int, ...] = (256,) * 5
    omega_0: float = 30.0

    def init(self, key: jax.Array) -> Params:
        dims = [self.d_in, *self.hidden_dims, 1]
        layers = []
        for i in range(len(dims) - 1):
            key, wkey = jax.random.split(key)
            fan_in = dims[i]
            if i == 0:
                bound = 1.0 / fan_in
            else:
                bound = math.sqrt(6.0 / fan_in) / self.omega_0
            layers.append(
                {
                    "w": jax.random.uniform(
                        wkey, (fan_in, dims[i + 1]), jnp.float32,
                        -bound, bound,
                    ),
                    "b": jnp.zeros((dims[i + 1],), jnp.float32),
                }
            )
        return {"layers": layers}

    def apply(self, params: Params, x: jnp.ndarray,
              rng=None, train: bool = False) -> jnp.ndarray:
        h = x
        layers = params["layers"]
        w0 = jnp.float32(self.omega_0)
        for layer in layers[:-1]:
            h = jnp.sin(w0 * (h @ layer["w"] + layer["b"]))
        out = h @ layers[-1]["w"] + layers[-1]["b"]
        return out[..., 0]

    def __call__(self, params: Params, x: jnp.ndarray, **kw) -> jnp.ndarray:
        return self.apply(params, x, **kw)
