"""Spatial differential operators on implicit fields.

TPU-native replacements for the reference's torch.autograd helpers
(reference model/losses.py:283-339 — compute_normal / compute_hessian /
compute_gradient / compute_gaussian_curvature).

Instead of building retained autograd graphs, these compose JAX transforms:

  * gradient w.r.t. *inputs* = ``vmap(grad)`` — one fused fwd+bwd per point,
    and because it is a pure function it nests cleanly inside the *outer*
    ``grad`` w.r.t. params taken by the trainer (the double-backward that is
    "hard" in torch is just transform composition here).
  * For 3-D inputs a forward-mode variant (3 jvps) is also provided; XLA fuses
    it into the forward matmuls, which is the cheaper direction on the MXU when
    the batch is large and the full Jacobian row is needed anyway.

All functions take ``apply_fn(params, x)->(B,)`` and are jit/shard_map safe.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

ApplyFn = Callable[..., jnp.ndarray]


def compute_gradient(apply_fn: ApplyFn, params, x: jnp.ndarray) -> jnp.ndarray:
    """∇_x f for a batch. x: (B, d) -> (B, d). Reverse-mode per point."""

    def f_single(pt):
        return apply_fn(params, pt[None, :])[0]

    return jax.vmap(jax.grad(f_single))(x)


def compute_normal(apply_fn: ApplyFn, params, x: jnp.ndarray) -> jnp.ndarray:
    """Last-3-dims input gradient (the surface normal direction),
    matching reference losses.py:283-296 which slices [:, -3:]."""
    return compute_gradient(apply_fn, params, x)[:, -3:]


def sdf_and_gradient(apply_fn: ApplyFn, params, x: jnp.ndarray):
    """(f(x), ∇_x f(x)) in one pass via value_and_grad. x: (B,d) -> ((B,), (B,d))."""

    def f_single(pt):
        return apply_fn(params, pt[None, :])[0]

    vals, grads = jax.vmap(jax.value_and_grad(f_single))(x)
    return vals, grads


def sdf_and_normal(apply_fn: ApplyFn, params, x: jnp.ndarray):
    vals, grads = sdf_and_gradient(apply_fn, params, x)
    return vals, grads[:, -3:]


def sdf_and_gradient_fwd(apply_fn: ApplyFn, params, x: jnp.ndarray):
    """Forward-mode variant: d jvp passes (d = x.shape[-1], 3 for SDFs).

    Preferable inside training losses: jvp keeps everything as big batched
    matmuls on the MXU with no transposed weight reloads, and nests trivially
    under the outer reverse-mode grad over params.

    When the apply closure advertises an ImplicitNet fast path
    (`_implicitnet_fast`, set by the trainer), the hand-derived shared-matmul
    forward gradient is used instead (~20% faster, same math).
    """
    fast = getattr(apply_fn, "_implicitnet_fast", None)
    if fast is not None:
        return fast(params, x)
    d = x.shape[-1]

    def f(xx):
        return apply_fn(params, xx)

    vals = f(x)
    cols = []
    for i in range(d):
        tangent = jnp.zeros_like(x).at[:, i].set(1.0)
        _, jv = jax.jvp(f, (x,), (tangent,))
        cols.append(jv)
    return vals, jnp.stack(cols, axis=-1)


def compute_hessian(apply_fn: ApplyFn, params, x: jnp.ndarray) -> jnp.ndarray:
    """Per-point Hessian. x: (B, d) -> (B, d, d). Forward-over-reverse."""

    def f_single(pt):
        return apply_fn(params, pt[None, :])[0]

    return jax.vmap(jax.hessian(f_single))(x)


def compute_gaussian_curvature(apply_fn: ApplyFn, params, x: jnp.ndarray) -> jnp.ndarray:
    """det(H) / (1 + |∇f|^2)^2 (cf. reference losses.py:333-339)."""
    grad = compute_gradient(apply_fn, params, x)
    hess = compute_hessian(apply_fn, params, x)
    gn2 = jnp.sum(grad * grad, axis=-1)
    det = jnp.linalg.det(hess)
    return det / (1.0 + gn2) ** 2


def implicitnet_value_and_grad(model, params, x: jnp.ndarray):
    """Hand-derived forward-mode (value, input-gradient) for ImplicitNet.

    Propagates all d_in tangent directions through SHARED matmuls: tangents
    are a (B, d_in, width) tensor hit by the same weight matrices as the
    primal (one (B*d_in, width) MXU matmul per layer instead of d_in separate
    jvp passes), with act'(z) scaling. ~3x fewer FLOPs than d_in x jax.jvp
    and much better MXU shapes; nests under reverse-mode grad for training.

    Returns (values (B,), grads (B, d_in)).
    """
    import math

    inp = x
    d_in = model.d_in
    B = x.shape[0]
    h = x
    # tangent stack: T[b, k, :] = d h / d x_k
    T = jnp.broadcast_to(jnp.eye(d_in, dtype=x.dtype), (B, d_in, d_in))
    n_lin = model.num_layers - 1
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    T0 = T
    layers = model.effective_layers(params)
    for layer in range(n_lin):
        lw = layers[layer]
        if layer in model.skip_in:
            h = jnp.concatenate([h, inp], axis=-1) * inv_sqrt2
            T = jnp.concatenate([T, T0], axis=-1) * inv_sqrt2
        z = h @ lw["w"] + lw["b"]
        Tz = jnp.einsum("bkd,do->bko", T, lw["w"])
        if layer < n_lin - 1:
            if model.beta > 0:
                act_p = jax.nn.sigmoid(model.beta * z)
                h = jax.nn.softplus(model.beta * z) / model.beta
            else:
                act_p = (z > 0).astype(z.dtype)
                h = jnp.maximum(z, 0)
            T = Tz * act_p[:, None, :]
        else:
            if model.beta <= 0:
                t = jnp.tanh(z)
                T = Tz * (1.0 - t * t)[:, None, :]
                z = t
            else:
                T = Tz
            h = z
    return h[..., 0], T[..., 0]
