"""Fused Pallas (value, input-gradient) path for the eikonal/normal losses.

The IGR-family losses (reference model/losses.py:96-185) need (f(x), grad_x f)
per point and are then differentiated w.r.t. PARAMS — the double backward the
reference builds with torch.autograd.grad(create_graph=True)
(model/losses.py:283-296). The generic composition (reverse over the 3-tangent
forward program) costs 12 matmul-units/layer and XLA runs it bandwidth-bound
(~2 M pts/s on the 8x512 flagship). This module restructures the math:

  * Forward kernel: the output is a SCALAR, so grad_x f is ONE reverse
    sweep, not 3 forward tangents: primal forward (1 matmul-unit/layer,
    sigma(z) stashed in VMEM scratch) + in-kernel backprop of a single
    cotangent (1 unit/layer, plus one small extra matmul at each
    input-consuming layer). ~2 units/layer, VMEM-resident weights, zero
    intermediate HBM traffic. (Round 2 used primal + 3 basis tangents =
    4 units/layer; the reverse form halves it.)
  * Backward (the custom VJP): for loss cotangents (a, c) = (dL/df, dL/dg),
        dL/dtheta = grad_theta sum_b [ a_b f_b + c_b . grad_x f(x_b) ]
                  = grad_theta sum_b [ a_b f_b + D_{c_b} f(x_b) ]
    because the jvp is linear in its tangent — the 3-tangent reverse pass
    collapses into a SINGLE-tangent reverse pass. The backward kernel
    rematerialises the primal + c-tangent chains tile-by-tile in VMEM
    (2 units) and runs their reverse sweep (4 units), accumulating dW/db in
    VMEM accumulators across sequential grid steps. 6 units/layer.

  Total: ~8 matmul-units/layer vs 12 for the generic path, at fused-kernel
  MXU efficiency instead of HBM-bound XLA (round-2 10-unit version measured
  1.6x end-to-end IGRLOSS epoch throughput, 3.4 vs 2.05 M pts/s on one v5e
  chip; see RESULTS.md for the current number).

The VJP is **params-only**: the returned x-cotangent is zero (the losses
treat x as data; differentiating this op w.r.t. x would silently yield 0 —
hence the explicit name). Activations: Softplus(beta) for beta > 0 else
ReLU (+ tanh head), matching ImplicitNet (reference model/networks.py:79-105).
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


def _sigma(z, beta):
    """Activation derivative: sigmoid(beta z) for softplus, step for ReLU."""
    if beta > 0:
        return jax.nn.sigmoid(jnp.float32(beta) * z.astype(F32))
    return (z > 0).astype(F32)


def _act(z, beta):
    if beta > 0:
        return jax.nn.softplus(jnp.float32(beta) * z.astype(F32)) / beta
    return jnp.maximum(z.astype(F32), 0)


# ---------------------------------------------------------------------------
# forward: primal + 3 basis tangents, stacked rows
# ---------------------------------------------------------------------------

def _make_fwd_kernel(spec, beta, d_in, tile_p, compute_dtype):
    """Primal forward + REVERSE sweep from the scalar head.

    The round-2 version carried d_in=3 forward-mode basis tangents through
    every layer (4 matmul-units/layer). But the output is a SCALAR, so the
    full input gradient is one reverse sweep: forward (1 unit/layer,
    stashing sigma(z) per hidden layer in VMEM scratch) + backprop of a
    single cotangent (1 unit/layer, plus one extra (tile, h)x(h, LANE)
    matmul at each input-consuming layer for the dx term). ~2 units/layer —
    the VERDICT-r2 "fuse the seeds" lever, taken to its limit.
    """
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    n_lin = len(spec)

    def kernel(x_ref, *args):
        refs, out_ref, s_st = args[:-2], args[-2], args[-1]
        x_pad = x_ref[:].astype(compute_dtype)

        # ---- primal forward, stashing activation derivatives --------------
        h = None
        z = None
        ri = 0
        for l, (kind, _) in enumerate(spec):
            if kind == "first":
                w, b = refs[ri], refs[ri + 1]
                ri += 2
                z = jnp.dot(x_pad, w[:], preferred_element_type=F32) + b[:]
            elif kind == "skip":
                w_top, w_bot, b = refs[ri], refs[ri + 1], refs[ri + 2]
                ri += 3
                z = (
                    jnp.dot(h, w_top[:], preferred_element_type=F32)
                    + jnp.dot(x_pad, w_bot[:], preferred_element_type=F32)
                ) * inv_sqrt2 + b[:]
            else:
                w, b = refs[ri], refs[ri + 1]
                ri += 2
                z = jnp.dot(h, w[:], preferred_element_type=F32) + b[:]
            if l < n_lin - 1:
                s_st[l] = _sigma(z, beta).astype(compute_dtype)
                h = _act(z, beta).astype(compute_dtype)

        # ---- head + cotangent seed ----------------------------------------
        # z's padded cols are exact zeros (zero weight cols + zero bias pad),
        # so f = [value, 0, ...] and the dz seed only needs column 0 live.
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_p, LANE), 1)
        if beta > 0:
            f_out = z
            dz = jnp.where(col == 0, 1.0, 0.0)
        else:
            t = jnp.tanh(z)  # zero cols stay zero
            f_out = t
            dz = jnp.where(col == 0, 1.0 - t * t, 0.0)

        # ---- reverse sweep: dx = grad_x f ---------------------------------
        dx = None
        rev = ri
        for l in range(n_lin - 1, -1, -1):
            kind = spec[l][0]
            dz_c = dz.astype(compute_dtype)
            if kind == "skip":
                w_top, w_bot = refs[rev - 3], refs[rev - 2]
                rev -= 3
                dxl = _dot_NT(dz_c, w_bot[:]) * inv_sqrt2
                dx = dxl if dx is None else dx + dxl
                dh = _dot_NT(dz_c, w_top[:]) * inv_sqrt2
            elif kind == "first":
                w = refs[rev - 2]
                rev -= 2
                dxl = _dot_NT(dz_c, w[:])
                dx = dxl if dx is None else dx + dxl
                dh = None
            else:
                w = refs[rev - 2]
                rev -= 2
                dh = _dot_NT(dz_c, w[:])
            if l > 0:
                dz = dh * s_st[l - 1].astype(F32)

        # ---- pack (f, g) into one (tile_p, LANE) block --------------------
        # dx cols >= d_in are exact zeros (padded weight rows are zero), so
        # a shift matmul (col k -> col k+1) lays g beside f without Mosaic
        # relayout trouble.
        r_idx = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
        c_idx = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
        shift = ((r_idx + 1 == c_idx) & (r_idx < d_in)).astype(F32)
        out_ref[:] = f_out + jnp.dot(dx, shift, preferred_element_type=F32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("model", "tile_p", "compute_dtype", "interpret")
)
def _fused_vag_fwd(model, params, x_pad, tile_p, compute_dtype, interpret):
    weights, spec, h_pad = prepare_fused_weights(model, params, compute_dtype)
    n_tiles = x_pad.shape[0] // tile_p
    d_in = model.d_in
    n_lin = len(spec)
    kernel = _make_fwd_kernel(spec, model.beta, d_in, tile_p, compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_p, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        + [
            pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for w in weights
        ],
        out_specs=pl.BlockSpec(
            (tile_p, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_p, LANE), F32),
        scratch_shapes=[
            pltpu.VMEM((max(n_lin - 1, 1), tile_p, h_pad), compute_dtype),
        ],
        interpret=interpret,
    )(x_pad, *weights)
    # (n_pad, LANE): col 0 = f, cols 1..d_in = df/dx_k
    return out


# ---------------------------------------------------------------------------
# backward: remat primal + single c-tangent, reverse sweep, dW accumulators
# ---------------------------------------------------------------------------

def _make_bwd_kernel(spec, beta, tile_p, compute_dtype):
    """STACKED backward: the primal chain (h) and the c-tangent chain (tc)
    ride as one (2*tile_p, .) array [h; tc], and so do their cotangents
    [dz; dtcz]. Each layer then costs THREE double-height MXU passes
    instead of six single-height ones (remat Z=[h;tc]@W, accumulate
    dW = [h;tc]^T @ [dz;dtcz] — the stacked contraction IS the sum of the
    two outer-product terms — and propagate [dh;dtc] = [dz;dtcz] @ W^T):
    identical FLOPs, half the per-pass MXU staging overhead (measured
    3.87 -> see RESULTS.md on the v5e at tile 256 -> 512-row passes).

    The stash is the POST-activation stack [act(z); tcz*s] — exactly the
    dW operand — and sigma is recovered from the stashed activation value
    itself via s = sigmoid(beta z) = 1 - exp(-beta*softplus(beta z)/beta
    * beta) = 1 - exp(-beta h) (one transcendental, vs act+sigmoid from a
    z stash). The ds chain term keeps the round-4 rewrite
    (dtc . Tcz) beta s (1-s) == (dtc . tc) beta (1-s)."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    n_lin = len(spec)

    def kernel(x_ref, a_ref, c_ref, *args):
        n_wb = sum(3 if k == "skip" else 2 for k, _ in spec)
        w_refs = args[:n_wb]
        acc_refs = args[n_wb : 2 * n_wb]
        # h_st[l]: (2*tile_p, h_pad) stacked [act(z); tcz*s] per hidden
        # layer; last_st: stacked last-layer (z, Tcz), tanh head only.
        h_st, last_st = args[2 * n_wb], args[2 * n_wb + 1]

        first = pl.program_id(0) == 0
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_p, LANE), 1)
        x_pad = x_ref[:].astype(compute_dtype)  # cols 0..2 = x
        c_pad = c_ref[:].astype(compute_dtype)  # cols 0..2 = c
        xs = jnp.concatenate([x_pad, c_pad], axis=0)  # (2T, LANE)
        a_mat = jnp.where(col == 0, a_ref[:].astype(F32), 0.0)

        # ---- remat: stacked primal + c-tangent chain -----------------------
        hs = xs
        ri = 0
        for l, (kind, _) in enumerate(spec):
            if kind == "skip":
                w_top, w_bot, b = w_refs[ri], w_refs[ri + 1], w_refs[ri + 2]
                ri += 3
                zs = (
                    jnp.dot(hs, w_top[:], preferred_element_type=F32)
                    + jnp.dot(xs, w_bot[:], preferred_element_type=F32)
                ) * inv_sqrt2
            else:
                w, b = w_refs[ri], w_refs[ri + 1]
                ri += 2
                zs = jnp.dot(hs, w[:], preferred_element_type=F32)
            if l < n_lin - 1:
                # bias belongs to the primal half only
                z = zs[:tile_p] + b[:]
                tcz = zs[tile_p:]
                s = _sigma(z, beta)
                hs = jnp.concatenate(
                    [_act(z, beta), tcz * s], axis=0
                ).astype(compute_dtype)
                h_st[l] = hs
            elif beta <= 0:
                last_st[0] = (
                    zs + jnp.concatenate(
                        [jnp.broadcast_to(b[:], (tile_p, LANE)),
                         jnp.zeros((tile_p, LANE), F32)], axis=0)
                ).astype(compute_dtype)

        # ---- seeds on the last layer's (z, Tcz) --------------------------
        e0 = jnp.where(col == 0, 1.0, 0.0)
        if beta > 0:
            dz = a_mat
            dtcz = e0
        else:  # tanh head: f = tanh(z), g = Tcz * (1 - f^2)
            zl = last_st[0]
            t = jnp.tanh(zl[:tile_p].astype(F32))
            fp = 1.0 - t * t
            tcz_l = zl[tile_p:].astype(F32)
            dz = jnp.where(col == 0, a_mat * fp - 2.0 * t * fp * tcz_l, 0.0)
            dtcz = jnp.where(col == 0, fp, 0.0)
        dzs = jnp.concatenate([dz, dtcz], axis=0)  # (2T, LANE)

        # ---- reverse sweep -------------------------------------------------
        rev_w = n_wb
        rev_a = n_wb
        for l in range(n_lin - 1, -1, -1):
            kind = spec[l][0]
            hs_prev = xs if l == 0 else h_st[l - 1][:]
            dzs_c = dzs.astype(compute_dtype)
            db = jnp.sum(dzs[:tile_p], axis=0, keepdims=True)

            if kind == "skip":
                w_top = w_refs[rev_w - 3]
                rev_w -= 3
                dwt_ref, dwb_ref, db_ref = (
                    acc_refs[rev_a - 3], acc_refs[rev_a - 2], acc_refs[rev_a - 1]
                )
                rev_a -= 3
                dwt = _dot_TN(hs_prev, dzs_c) * inv_sqrt2
                dwb = _dot_TN(xs, dzs_c) * inv_sqrt2

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
                    dhs = _dot_NT(dzs_c, w_top[:]) * inv_sqrt2
            else:
                w = w_refs[rev_w - 2]
                rev_w -= 2
                dw_ref, db_ref = acc_refs[rev_a - 2], acc_refs[rev_a - 1]
                rev_a -= 2
                dw = _dot_TN(hs_prev, dzs_c)

                @pl.when(first)
                def _():
                    dw_ref[:] = dw
                    db_ref[:] = db

                @pl.when(jnp.logical_not(first))
                def _():
                    dw_ref[:] = dw_ref[:] + dw
                    db_ref[:] = db_ref[:] + db

                if l > 0:
                    dhs = _dot_NT(dzs_c, w[:])

            if l > 0:
                hp = h_st[l - 1][:]
                h_prev = hp[:tile_p].astype(F32)
                tc_prev = hp[tile_p:].astype(F32)
                dh = dhs[:tile_p]
                dtc = dhs[tile_p:]
                if beta > 0:
                    # s = sigmoid(beta z) == 1 - exp(-beta * act(z))
                    s = 1.0 - jnp.exp(jnp.float32(-beta) * h_prev)
                    # (dtc . Tcz) beta s (1-s) == (dtc . tc) beta (1-s)
                    dz = dh * s + (dtc * tc_prev) * (beta * (1.0 - s))
                else:
                    s = (h_prev > 0).astype(F32)
                    dz = dh * s  # step'(z) = 0 a.e.
                dzs = jnp.concatenate([dz, dtc * s], axis=0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("model", "tile_p", "compute_dtype", "interpret")
)
def _fused_vag_bwd(model, params, x_pad, a_pad, c_pad, tile_p, compute_dtype,
                   interpret):
    weights, spec, h_pad = prepare_fused_weights(model, params, compute_dtype)
    n_tiles = x_pad.shape[0] // tile_p
    n_lin = len(spec)
    kernel = _make_bwd_kernel(spec, model.beta, tile_p, compute_dtype)

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
    grads = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[tile_spec, tile_spec, tile_spec] + const_specs,
        out_specs=acc_specs,
        out_shape=acc_shapes,
        scratch_shapes=[
            # stacked [act(z); tcz*s] per hidden layer — the dW operand
            pltpu.VMEM(
                (max(n_lin - 1, 1), 2 * tile_p, h_pad), compute_dtype
            ),
            pltpu.VMEM((1, 2 * tile_p, LANE), compute_dtype),  # last (z,Tcz)
        ],
        interpret=interpret,
    )(x_pad, a_pad, c_pad, *weights)
    return grads


# ---------------------------------------------------------------------------
# public: custom-VJP (value, grad) — params-only backward
# ---------------------------------------------------------------------------

def make_fused_value_and_grad(
    model: ImplicitNet,
    fwd_tile_p: int = 256,
    bwd_tile_p: int = 256,  # measured best on v5e (3.40 vs 3.23 M pts/s
    # at 128; 512 regresses — the (n_lin-1, tile, h_pad) scratch pair
    # starts spilling)
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Build ``vag(params, x) -> (f (N,), grad (N, d_in))`` with a fused
    Pallas forward and a fused params-only custom VJP.

    Drop-in for ``ops.diffops.implicitnet_value_and_grad`` inside training
    losses (the trainer installs it as the `_implicitnet_fast` hook).
    WARNING: the backward intentionally returns ZERO cotangent for ``x`` —
    valid only when x is data (true for every loss in the zoo).
    """
    d_in = model.d_in
    n_seg = 1 + d_in

    def _pad_cols(v, n_pad, dtype=F32):
        out = jnp.zeros((n_pad, LANE), dtype)
        if v.ndim == 1:
            return out.at[: v.shape[0], 0].set(v.astype(dtype))
        return out.at[: v.shape[0], : v.shape[1]].set(v.astype(dtype))

    def _forward(params, x):
        n = x.shape[0]
        n_pad = _round_up(max(n, fwd_tile_p), fwd_tile_p)
        x_pad = _pad_cols(x, n_pad)
        out = _fused_vag_fwd(
            model, params, x_pad, fwd_tile_p, compute_dtype, interpret
        )
        return out[:n, 0], out[:n, 1 : 1 + d_in]

    @jax.custom_vjp
    def vag(params, x):
        return _forward(params, x)

    def fwd_rule(params, x):
        return _forward(params, x), (params, x)

    def bwd_rule(res, cot):
        params, x = res
        a, c = cot  # dL/df (N,), dL/dg (N, d_in)
        n = x.shape[0]
        n_pad = _round_up(max(n, bwd_tile_p), bwd_tile_p)
        x_pad = _pad_cols(x, n_pad)
        a_pad = _pad_cols(jnp.asarray(a, F32), n_pad)
        c_pad = _pad_cols(jnp.asarray(c, F32), n_pad)
        grads_flat = _fused_vag_bwd(
            model, params, x_pad, a_pad, c_pad, bwd_tile_p, compute_dtype,
            interpret,
        )
        dparams = _unpack_grads(model, params, grads_flat)
        return dparams, jnp.zeros_like(x)

    vag.defvjp(fwd_rule, bwd_rule)
    return vag


def make_fused_value_and_grad_sharded(model: ImplicitNet, mesh, **kw):
    """``make_fused_value_and_grad`` over a device mesh: shard_map the
    single-device kernel along the 'data' axis (the kernel is per-point),
    params replicated. The shard_map transpose psums the params cotangent
    across the axis, so the custom VJP composes with data-parallel
    training exactly like the XLA derivation (tests/test_sharding.py
    proves gradient equality). Point counts that do not divide the mesh
    are zero-padded and sliced back — pad rows carry zero cotangent.

    Role match: torch.autograd.grad inside nn.DataParallel, reference
    model/losses.py:283-296 + executor/executor.py:53-55."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    fused = make_fused_value_and_grad(model, **kw)
    n_dev = mesh.devices.size
    mapped = shard_map(
        fused,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,  # pallas outputs carry no vma annotation
    )

    def vag(params, x):
        n = x.shape[0]
        n_pad = -(-n // n_dev) * n_dev
        if n_pad != n:
            x = jnp.concatenate(
                [x, jnp.zeros((n_pad - n, x.shape[1]), x.dtype)]
            )
        v, g = mapped(params, x)
        return v[:n], g[:n]

    return vag
