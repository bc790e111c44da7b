"""ImplicitNet — the skip-in fully-connected SDF network (DeepSDF / IGR family).

TPU-native functional re-design of the reference architecture
(reference model/networks.py:8-112 `ImplicitNet` and :114-179
`ImplicitNetCompatible`): a frozen dataclass holds the *static* architecture,
``init`` builds a params pytree, ``apply`` is a pure function safe under
``jit`` / ``grad`` / ``vmap`` / ``shard_map``.

Semantics preserved from the reference:
  * dims = [d_in] + hidden*N + [1]; layers feeding a skip layer shrink their
    output by d_in (networks.py:57-60).
  * Skip layer input: concat([x, input], -1) / sqrt(2)  (networks.py:94-95).
  * Activation: Softplus(beta) if beta > 0 else ReLU; in ReLU mode the final
    output gets tanh (networks.py:79-83, :104-105).
  * Geometric initialization (networks.py:65-74): last layer weight
    ~ N(sqrt(pi)/sqrt(fan_in), 1e-5), bias = -radius_init; other layers bias 0,
    weight ~ N(0, sqrt(2)/sqrt(fan_out)).

Intentional fixes vs the reference (each documented in SURVEY.md §7):
  * ``apply`` returns shape (B,), not (B, 1) — the reference's (B,1) predictions
    silently broadcast against (B,) targets to (B,B) in several losses.
  * Weights are stored (in, out) so the forward pass is ``x @ W + b`` — a
    layout XLA maps straight onto the MXU without transposes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def softplus_beta(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Numerically stable softplus with sharpness beta: log(1+exp(beta*x))/beta.

    Matches torch.nn.Softplus(beta) including the linear regime for large
    inputs (torch switches at beta*x > 20; jax.nn.softplus is already stable,
    so no explicit threshold is required).
    """
    return jax.nn.softplus(beta * x) / beta


@dataclasses.dataclass(frozen=True)
class ImplicitNet:
    """Skip-in MLP mapping (B, d_in) points -> (B,) signed distance."""

    d_in: int = 3
    hidden_dims: Tuple[int, ...] = (512,) * 8
    skip_in: Tuple[int, ...] = ()
    beta: float = 100.0
    geometric_init: bool = True
    radius_init: float = 1.0
    # Lipschitz-bounded variant (Liu et al., "Learning Smooth Neural
    # Functions via Lipschitz Regularization", arXiv:2202.08345): each layer
    # carries a trainable bound c; weights are row-normalised to
    # inf-norm <= softplus(c) on the fly and prod softplus(c_i) is the
    # network's Lipschitz bound, exposed as a loss regularizer. The
    # reference sketched this but left it dead (networks.py:54,97-98,109-112).
    lipschitz: bool = False
    lipschitz_weight: float = 1e-6

    @property
    def dims(self) -> Tuple[int, ...]:
        return (self.d_in,) + tuple(self.hidden_dims) + (1,)

    @property
    def num_layers(self) -> int:
        return len(self.dims)

    def layer_shapes(self) -> Sequence[Tuple[int, int]]:
        """(fan_in, fan_out) of every linear layer, accounting for skip-ins."""
        dims = self.dims
        shapes = []
        for layer in range(self.num_layers - 1):
            out_dim = dims[layer + 1]
            if (layer + 1) in self.skip_in:
                out_dim -= self.d_in
            shapes.append((dims[layer], out_dim))
        return shapes

    def init(self, key: jax.Array) -> Params:
        layers = []
        shapes = self.layer_shapes()
        n_lin = len(shapes)
        for layer, (fan_in, fan_out) in enumerate(shapes):
            key, wkey = jax.random.split(key)
            if self.geometric_init:
                if layer == n_lin - 1:
                    w = (
                        math.sqrt(math.pi) / math.sqrt(fan_in)
                        + 1e-5 * jax.random.normal(wkey, (fan_in, fan_out), jnp.float32)
                    )
                    b = jnp.full((fan_out,), -self.radius_init, jnp.float32)
                else:
                    w = (
                        math.sqrt(2.0)
                        / math.sqrt(fan_out)
                        * jax.random.normal(wkey, (fan_in, fan_out), jnp.float32)
                    )
                    b = jnp.zeros((fan_out,), jnp.float32)
            else:
                # torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
                bound = 1.0 / math.sqrt(fan_in)
                key, bkey = jax.random.split(key)
                w = jax.random.uniform(
                    wkey, (fan_in, fan_out), jnp.float32, -bound, bound
                )
                b = jax.random.uniform(bkey, (fan_out,), jnp.float32, -bound, bound)
            if self.lipschitz:
                # c starts at softplus^-1(max row sum of |W|) so the initial
                # scaling is exactly 1 (arXiv:2202.08345 §4)
                row_max = jnp.max(jnp.sum(jnp.abs(w), axis=0))
                c = row_max + jnp.log(-jnp.expm1(-row_max))  # softplus^-1
                layers.append({"w": w, "b": b, "c": c})
            else:
                layers.append({"w": w, "b": b})
        return {"layers": layers}

    def effective_layers(self, params: Params):
        """Per-layer {'w','b'} with the Lipschitz row normalisation baked in
        (identity for non-Lipschitz nets). Every consumer of raw weights —
        apply, the shared-matmul forward-gradient, the fused Pallas kernels,
        exports — goes through this so the variants cannot diverge."""
        if not self.lipschitz:
            return params["layers"]
        out = []
        for lw in params["layers"]:
            w = lw["w"]
            # per-output-unit absolute row sum = matrix inf-norm contributors
            # (weights are stored (in, out), so rows of the paper's (out, in)
            # matrix are our columns)
            rows = jnp.sum(jnp.abs(w), axis=0)
            bound = jax.nn.softplus(lw["c"].astype(w.dtype))
            scale = jnp.minimum(1.0, bound / jnp.maximum(rows, 1e-30))
            out.append({"w": w * scale[None, :], "b": lw["b"]})
        return out

    def export_params(self, params: Params) -> Params:
        """Params with any reparameterisation (the Lipschitz row scaling)
        baked into plain {'w','b'} layers — what exporters, quantization and
        external consumers (C++ runtime, ONNX, TorchScript) must see."""
        if not self.lipschitz:
            return params
        return {
            "layers": [
                {"w": lw["w"], "b": lw["b"]}
                for lw in self.effective_layers(params)
            ]
        }

    def lipschitz_bound(self, params: Params) -> jnp.ndarray:
        """prod_i softplus(c_i) — the trainable upper bound on the network's
        Lipschitz constant, the quantity arXiv:2202.08345 adds to the loss."""
        cs = jnp.stack([lw["c"].astype(jnp.float32) for lw in params["layers"]])
        return jnp.prod(jax.nn.softplus(cs))

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Forward pass. x: (..., d_in) -> (...,) SDF."""
        inp = x
        h = x
        n_lin = self.num_layers - 1
        layers = self.effective_layers(params)
        for layer in range(n_lin):
            if layer in self.skip_in:
                h = jnp.concatenate([h, inp], axis=-1) / math.sqrt(2.0)
            lw = layers[layer]
            h = h @ lw["w"] + lw["b"]
            if layer < n_lin - 1:
                if self.beta > 0:
                    h = softplus_beta(h, self.beta)
                else:
                    h = jax.nn.relu(h)
            elif self.beta <= 0:
                h = jnp.tanh(h)
        return h[..., 0]

    def __call__(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return self.apply(params, x)


# The reference keeps a second copy of the architecture with nn.ModuleList
# naming purely so TorchScript export gets `layers.{i}.weight` keys
# (networks.py:114-179). In a functional framework the params tree already has
# that layout, so the "compatible" variant is just an alias with the
# reference's default beta=99.
def ImplicitNetCompatible(
    d_in: int = 3,
    hidden_dims: Tuple[int, ...] = (512,) * 8,
    skip_in: Tuple[int, ...] = (),
    beta: float = 99.0,
    geometric_init: bool = True,
    radius_init: float = 1.0,
) -> ImplicitNet:
    return ImplicitNet(
        d_in=d_in,
        hidden_dims=tuple(hidden_dims),
        skip_in=tuple(skip_in),
        beta=beta,
        geometric_init=geometric_init,
        radius_init=radius_init,
    )
