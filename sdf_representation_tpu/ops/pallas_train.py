"""Fused ImplicitNet training path: Pallas forward + Pallas backward.

Why: even with bf16 activations, the XLA train step spills every layer
activation to HBM in the forward and reads it back in the backward —
~1.5 GB of traffic per 65k-point step against 0.72 TFLOP of compute. This
module provides ``make_fused_apply``: a custom-VJP apply whose backward
kernel RECOMPUTES the forward activations tile-by-tile inside VMEM (classic
rematerialisation — FLOPs are cheap, HBM is not) while accumulating
weight/bias gradients in VMEM accumulators that every grid step revisits
(TPU grids iterate sequentially, so += into a constant-index output block is
well-defined).

Scope: first-order gradients (params AND inputs) for losses of the form
loss(f(x), y) — the supervised SDF zoo (MSE / CustomSDF / WeightedSmoothL2 /
Combined). The eikonal losses (grad-of-input-grad) keep the XLA jvp path.

Layouts: points and cotangents both travel as (n_pad, LANE) tiles with the
payload in column 0 — lane-dim-1 arrays would be relayout poison.
VMEM budget at tile_p=128, hidden 512x8: bf16 weights ~4.2 MB + f32 dW
accumulators ~8.6 MB + bf16 pre-activation stash ~1.2 MB + temporaries.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.implicit_net import ImplicitNet
from .pallas_mlp import LANE, _round_up, prepare_fused_weights

F32 = jnp.float32


def _act(z, beta, dtype):
    if beta > 0:
        return (jax.nn.softplus(jnp.float32(beta) * z) / beta).astype(dtype)
    return jnp.maximum(z, 0).astype(dtype)


def _act_grad(z, beta):
    if beta > 0:
        return jax.nn.sigmoid(jnp.float32(beta) * z.astype(F32))
    return (z > 0).astype(F32)


def _dot_TN(a, b):
    """a^T @ b contracting dim 0 with dim 0: (P,I),(P,O) -> (I,O)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=F32
    )


def _dot_NT(a, b):
    """a @ b^T contracting dim 1 with dim 1: (P,O),(I,O) -> (P,I)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=F32
    )


def _make_bwd_kernel(model: ImplicitNet, spec, tile_p: int, compute_dtype):
    beta = model.beta
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    n_lin = len(spec)

    def kernel(x_ref, g_ref, *refs):
        n_wb = sum(3 if k == "skip" else 2 for k, _ in spec)
        w_refs = refs[:n_wb]
        dx_ref = refs[n_wb]
        acc_refs = refs[n_wb + 1 :]

        first = pl.program_id(0) == 0
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_p, LANE), 1)

        x_pad = x_ref[:].astype(compute_dtype)  # (tile_p, LANE), cols 0..2
        # cotangent: same tile layout, payload in column 0
        g = jnp.where(col == 0, g_ref[:].astype(F32), 0.0)

        # ---- forward recompute, stashing pre-activations (bf16) ----------
        pres = []
        h = x_pad
        ri = 0
        for l, (kind, _) in enumerate(spec):
            if kind == "skip":
                w_top, w_bot, b = w_refs[ri], w_refs[ri + 1], w_refs[ri + 2]
                ri += 3
                z = (
                    jnp.dot(h, w_top[:], preferred_element_type=F32)
                    + jnp.dot(x_pad, w_bot[:], preferred_element_type=F32)
                ) * inv_sqrt2 + b[:]
            else:
                w, b = w_refs[ri], w_refs[ri + 1]
                ri += 2
                z = jnp.dot(h, w[:], preferred_element_type=F32) + b[:]
            pres.append(z.astype(compute_dtype))
            if l < n_lin - 1:
                h = _act(z, beta, compute_dtype)

        # ---- backward ----------------------------------------------------
        dz = g  # (tile_p, LANE) f32; only col 0 carries signal
        if beta <= 0:  # output tanh in ReLU mode
            t = jnp.tanh(pres[-1].astype(F32))
            dz = dz * (1.0 - t * t)

        dx = jnp.zeros((tile_p, LANE), F32)
        rev_w = n_wb
        rev_a = len(acc_refs)
        for l in range(n_lin - 1, -1, -1):
            kind = spec[l][0]
            a_in = x_pad if l == 0 else _act(pres[l - 1], beta, compute_dtype)
            dz_c = dz.astype(compute_dtype)

            if kind == "skip":
                w_top, w_bot = w_refs[rev_w - 3], w_refs[rev_w - 2]
                rev_w -= 3
                dwt_ref, dwb_ref, db_ref = (
                    acc_refs[rev_a - 3], acc_refs[rev_a - 2], acc_refs[rev_a - 1]
                )
                rev_a -= 3
                dwt = _dot_TN((a_in.astype(F32) * inv_sqrt2).astype(compute_dtype), dz_c)
                dwb = _dot_TN((x_pad.astype(F32) * inv_sqrt2).astype(compute_dtype), dz_c)
                db = jnp.sum(dz, axis=0, keepdims=True)
                dx = dx + _dot_NT(dz_c, w_bot[:]) * inv_sqrt2

                @pl.when(first)
                def _():
                    dwt_ref[:] = dwt
                    dwb_ref[:] = dwb
                    db_ref[:] = db

                @pl.when(jnp.logical_not(first))
                def _():
                    dwt_ref[:] = dwt_ref[:] + dwt
                    dwb_ref[:] = dwb_ref[:] + dwb
                    db_ref[:] = db_ref[:] + db

                if l > 0:
                    dh = _dot_NT(dz_c, w_top[:]) * inv_sqrt2
                    dz = dh * _act_grad(pres[l - 1], beta)
            else:
                w = w_refs[rev_w - 2]
                rev_w -= 2
                dw_ref, db_ref = acc_refs[rev_a - 2], acc_refs[rev_a - 1]
                rev_a -= 2
                dw = _dot_TN(a_in, dz_c)
                db = jnp.sum(dz, axis=0, keepdims=True)

                @pl.when(first)
                def _():
                    dw_ref[:] = dw
                    db_ref[:] = db

                @pl.when(jnp.logical_not(first))
                def _():
                    dw_ref[:] = dw_ref[:] + dw
                    db_ref[:] = db_ref[:] + db

                if l > 0:
                    dh = _dot_NT(dz_c, w[:])
                    dz = dh * _act_grad(pres[l - 1], beta)
                else:
                    dx = dx + _dot_NT(dz_c, w[:])

        dx_ref[:] = dx

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("model", "tile_p", "compute_dtype", "interpret"),
)
def _fused_bwd(model, params, x_pad, g_pad, tile_p, compute_dtype, interpret):
    weights, spec, _ = prepare_fused_weights(model, params, compute_dtype)
    n_tiles = x_pad.shape[0] // tile_p
    kernel = _make_bwd_kernel(model, spec, tile_p, compute_dtype)

    tile_spec = pl.BlockSpec(
        (tile_p, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    const_specs = [
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    acc_shapes = tuple(jax.ShapeDtypeStruct(w.shape, F32) for w in weights)
    acc_specs = tuple(
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for w in weights
    )

    dx, *grads = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[tile_spec, tile_spec] + const_specs,
        out_specs=(tile_spec,) + acc_specs,
        out_shape=(jax.ShapeDtypeStruct(x_pad.shape, F32),) + acc_shapes,
        interpret=interpret,
    )(x_pad, g_pad, *weights)
    return dx, grads


def _unpack_grads(model: ImplicitNet, params, grads_flat):
    """Map padded kernel gradients back onto the params pytree (the bias
    accumulator slot of each layer follows its weight slot(s))."""
    d_in = model.d_in
    n_lin = model.num_layers - 1
    layers = params["layers"]
    out_layers = []
    i = 0
    for l in range(n_lin):
        w = layers[l]["w"]
        fan_in, fan_out = w.shape
        if l != 0 and l in model.skip_in:
            top = grads_flat[i][: fan_in - d_in, :fan_out]
            bot = grads_flat[i + 1][:d_in, :fan_out]
            dw = jnp.concatenate([top, bot], axis=0)
            db = grads_flat[i + 2][0, :fan_out]
            i += 3
        else:
            dw = grads_flat[i][:fan_in, :fan_out]
            db = grads_flat[i + 1][0, :fan_out]
            i += 2
        out_layers.append({"w": dw.astype(w.dtype), "b": db.astype(w.dtype)})
    return {"layers": out_layers}


def make_fused_apply(model: ImplicitNet, tile_p: int = 128,
                     fwd_tile_p: int = 1024,
                     compute_dtype=jnp.bfloat16, interpret: bool = False):
    """apply(params, x) -> (N,) with a fully fused Pallas VJP (params and
    input gradients). Drop-in for model.apply inside supervised losses.

    tile_p is the BACKWARD tile (small: the VMEM budget carries weight-grad
    accumulators); fwd_tile_p is the forward tile (the forward's (8, tile/8)
    output relayout needs >= 1024 lanes to compile on real Mosaic)."""
    from .pallas_mlp import _fused_apply_padded

    pad_unit = max(tile_p, fwd_tile_p)

    def _pad_tile(v, n_pad, width=3):
        out = jnp.zeros((n_pad, LANE), F32)
        if v.ndim == 1:
            return out.at[: v.shape[0], 0].set(v.astype(F32))
        return out.at[: v.shape[0], :width].set(v.astype(F32))

    @jax.custom_vjp
    def apply(params, x):
        n = x.shape[0]
        n_pad = _round_up(max(n, pad_unit), pad_unit)
        x_pad = _pad_tile(x, n_pad)
        out = _fused_apply_padded(
            model, params, x_pad, fwd_tile_p, compute_dtype, interpret
        )
        return out[:n]

    def fwd(params, x):
        return apply(params, x), (params, x)

    def bwd(res, g):
        params, x = res
        n = x.shape[0]
        n_pad = _round_up(max(n, pad_unit), pad_unit)
        x_pad = _pad_tile(x, n_pad)
        g_pad = _pad_tile(g, n_pad)
        dx_pad, grads_flat = _fused_bwd(
            model, params, x_pad, g_pad, tile_p, compute_dtype, interpret
        )
        dparams = _unpack_grads(model, params, grads_flat)
        dx = dx_pad[:n, : x.shape[1]].astype(x.dtype)
        return dparams, dx

    apply.defvjp(fwd, bwd)
    return apply
