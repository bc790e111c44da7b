"""FeedForwardNetwork — weight-normalised MLP with dropout + tanh output.

Functional rebuild of the reference alternative model
(reference model/networks.py:186-210): N blocks of
[weight_norm(Linear) -> ReLU -> Dropout(0.5)] followed by a weight-normalised
output Linear + tanh.

Weight norm is reparameterised explicitly: w = g * v / ||v||_row, with params
{v, g, b} per layer, matching torch.nn.utils.weight_norm semantics (norm taken
over the input dimension of each output unit).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _wn_linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # v: (in, out); norm over the input axis (dim=1 of torch's (out, in) weight)
    v = p["v"]
    norm = jnp.linalg.norm(v, axis=0, keepdims=True)
    w = p["g"] * v / norm
    return x @ w + p["b"]


@dataclasses.dataclass(frozen=True)
class FeedForwardNetwork:
    d_in: int = 3
    hidden_dim: int = 512
    num_layers: int = 8
    dropout_rate: float = 0.5

    def init(self, key: jax.Array) -> Params:
        layers = []
        fan_in = self.d_in
        for _ in range(self.num_layers):
            key, wkey, bkey = jax.random.split(key, 3)
            bound = 1.0 / math.sqrt(fan_in)
            v = jax.random.uniform(
                wkey, (fan_in, self.hidden_dim), jnp.float32, -bound, bound
            )
            layers.append(
                {
                    "v": v,
                    "g": jnp.linalg.norm(v, axis=0),
                    "b": jax.random.uniform(
                        bkey, (self.hidden_dim,), jnp.float32, -bound, bound
                    ),
                }
            )
            fan_in = self.hidden_dim
        key, wkey, bkey = jax.random.split(key, 3)
        bound = 1.0 / math.sqrt(fan_in)
        v = jax.random.uniform(wkey, (fan_in, 1), jnp.float32, -bound, bound)
        out = {
            "v": v,
            "g": jnp.linalg.norm(v, axis=0),
            "b": jax.random.uniform(bkey, (1,), jnp.float32, -bound, bound),
        }
        return {"layers": layers, "out": out}

    def apply(
        self,
        params: Params,
        x: jnp.ndarray,
        *,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """x: (..., d_in) -> (...,). Dropout active only when train and rng given."""
        h = x
        for i, p in enumerate(params["layers"]):
            h = jax.nn.relu(_wn_linear(p, h))
            if train and rng is not None and self.dropout_rate > 0.0:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - self.dropout_rate, h.shape)
                h = jnp.where(keep, h / (1.0 - self.dropout_rate), 0.0)
        h = jnp.tanh(_wn_linear(params["out"], h))
        return h[..., 0]

    def __call__(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return self.apply(params, x)
