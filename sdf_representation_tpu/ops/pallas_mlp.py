"""Pallas fused MLP kernels — the speed-of-light ImplicitNet inference path.

Why: XLA evaluates the 8x512 MLP layer-by-layer, spilling every (batch, 512)
activation to HBM between matmuls. At 512^3 grid scale that is ~16 bytes of
HBM traffic per point per layer — the measured ceiling is ~40% MXU. These
kernels keep ALL layer weights resident in VMEM (8 x 512 x 512 bf16 = 4 MB)
and carry activations through the whole network inside one kernel invocation,
so HBM traffic collapses to (coords in, sdf out) — or just (sdf out) for the
grid kernel, which synthesises its coordinates from the tile index.

Skip-in handling without in-kernel concatenation: for a skip layer
    ([h, x]/sqrt(2)) @ W  ==  (h @ W_top + x @ W_bot) / sqrt(2)
so the concat (awkward on TPU tiling) becomes a second small matmul against
the input tile. All odd dimensions (d_in=3, hidden-d_in=509, d_out=1) are
zero-padded to lane multiples; padding contributes exact zeros.

Supports both ImplicitNet activations: Softplus(beta) when beta > 0, else
ReLU with tanh on the output (reference model/networks.py:79-83,104-105).
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.implicit_net import ImplicitNet

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def prepare_fused_weights(model: ImplicitNet, params, compute_dtype=jnp.bfloat16):
    """Pad/split weights for the fused kernel.

    Returns (flat list of arrays, static spec) where spec is a tuple of
    per-layer entries ('plain', h_pad) or ('skip', h_pad) consumed by the
    kernel factory. Hidden width is padded to a lane multiple.
    """
    dims = model.dims
    d_in = model.d_in
    n_lin = len(dims) - 1
    h_pad = _round_up(max(dims[1:-1]) if n_lin > 1 else LANE, LANE)
    in_pad = LANE  # input coords padded to one lane tile

    def pad_to(a, rows, cols):
        a = jnp.asarray(a, jnp.float32)
        return jnp.zeros((rows, cols), jnp.float32).at[
            : a.shape[0], : a.shape[1]
        ].set(a)

    out: List[jnp.ndarray] = []
    spec: List[Tuple[str, int]] = []
    layers = model.effective_layers(params)
    for l in range(n_lin):
        w = jnp.asarray(layers[l]["w"], jnp.float32)
        b = jnp.asarray(layers[l]["b"], jnp.float32)
        fan_in = w.shape[0]
        out_pad = h_pad if l < n_lin - 1 else LANE
        if l == 0:
            out.append(pad_to(w, in_pad, out_pad).astype(compute_dtype))
            spec.append(("first", 0))
        elif l in model.skip_in:
            # previous layer emitted hidden-d_in cols (zero-padded to h_pad);
            # split the matrix at the concat boundary instead of concatenating
            out.append(
                pad_to(w[: fan_in - d_in], h_pad, out_pad).astype(compute_dtype)
            )
            out.append(
                pad_to(w[fan_in - d_in :], in_pad, out_pad).astype(compute_dtype)
            )
            spec.append(("skip", 0))
        else:
            out.append(pad_to(w, h_pad, out_pad).astype(compute_dtype))
            spec.append(("plain", 0))
        # biases stay f32 for accumulation accuracy
        out.append(pad_to(b[None, :], 1, out_pad))
    return out, tuple(spec), h_pad


def _make_body(spec, beta, compute_dtype, mxu_precision="default"):
    """The fused ImplicitNet forward over one (tile_p, LANE) coordinate tile.

    Shared by the dense grid kernel, the point kernel and the sparse
    block-refinement kernel (ops/sparse_grid.py). ``refs`` is the flat weight
    ref list from prepare_fused_weights; ``x_pad`` is (tile_p, LANE) with
    cols 0..2 = coords, rest zero; the (tile_p,) result lands in out_ref as
    an (8, tile_p//8) block.

    mxu_precision: "default" lets the MXU run bf16 passes (fast; ~1e-2 abs
    error through 8 layers); "highest" forces multi-pass f32 matmuls (~3x
    slower, exact f32)."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    n_lin = len(spec)
    prec = (jax.lax.Precision.HIGHEST if mxu_precision == "highest"
            else jax.lax.Precision.DEFAULT)

    def act(h):
        if beta > 0:
            return (jax.nn.softplus(jnp.float32(beta) * h) / beta).astype(h.dtype)
        return jnp.maximum(h, 0)

    def body(refs, x_pad, out_ref):
        # x_pad: (tile_p, LANE) compute_dtype, cols 0..2 = coords
        h = x_pad
        ri = 0
        for l, (kind, _) in enumerate(spec):
            if kind == "skip":
                w_top, w_bot, b = refs[ri], refs[ri + 1], refs[ri + 2]
                ri += 3
                acc = (
                    jnp.dot(h, w_top[:], preferred_element_type=jnp.float32, precision=prec)
                    + jnp.dot(x_pad, w_bot[:], preferred_element_type=jnp.float32, precision=prec)
                ) * inv_sqrt2 + b[:]
            else:
                w, b = refs[ri], refs[ri + 1]
                ri += 2
                acc = jnp.dot(h, w[:], preferred_element_type=jnp.float32, precision=prec) + b[:]
            if l < n_lin - 1:
                h = act(acc.astype(compute_dtype))
            else:
                h = acc  # f32 logits
        if beta <= 0:
            h = jnp.tanh(h)
        # h: (tile_p, LANE) f32, col 0 = result. A (tile_p, 1) output column
        # would be lane-padded 128x in HBM, so emit the tile as an (8, lane)
        # block: transpose to a row then unflatten 1024 lanes -> 8 sublanes.
        row = h.astype(jnp.float32).T[:1, :]  # (1, tile_p)
        out_ref[:] = row.reshape(out_ref.shape)

    return body


def _make_kernel(model: ImplicitNet, spec, tile_p: int, n_grid: int | None,
                 compute_dtype, mxu_precision="default"):
    """Kernel factory for the dense grid evaluator (n_grid set: coordinates
    synthesised from the tile index) and the point evaluator (coords ref
    input)."""
    body = _make_body(spec, model.beta, compute_dtype, mxu_precision)

    if n_grid is not None:
        n = n_grid
        step = 2.0 / (n - 1)

        def kernel(base_ref, *args):
            refs, out_ref = args[:-1], args[-1]
            i = base_ref[0, 0] + pl.program_id(0)
            flat = i * tile_p + jax.lax.broadcasted_iota(
                jnp.int32, (tile_p, LANE), 0
            )
            z = jax.lax.rem(flat, n)
            y = jax.lax.rem(jax.lax.div(flat, n), n)
            x = jax.lax.div(flat, n * n)
            col = jax.lax.broadcasted_iota(jnp.int32, (tile_p, LANE), 1)
            coord = jnp.where(
                col == 0, x, jnp.where(col == 1, y, jnp.where(col == 2, z, 0))
            )
            mask = col < 3
            x_pad = jnp.where(
                mask, -1.0 + step * coord.astype(jnp.float32), 0.0
            ).astype(compute_dtype)
            body(refs, x_pad, out_ref)

        return kernel

    def kernel(x_ref, *args):
        refs, out_ref = args[:-1], args[-1]
        body(refs, x_ref[:].astype(compute_dtype), out_ref)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("model", "n", "tile_p", "tiles_per_call", "compute_dtype",
                     "interpret", "mxu_precision"),
)
def _fused_grid_slab(
    model, params, base, n, tile_p, tiles_per_call, compute_dtype, interpret,
    mxu_precision,
):
    """One bounded pallas sweep starting at tile index `base` (SMEM scalar —
    a single compilation serves every slab)."""
    weights, spec, _ = prepare_fused_weights(model, params, compute_dtype)
    kernel = _make_kernel(model, spec, tile_p, n, compute_dtype, mxu_precision)
    return pl.pallas_call(
        kernel,
        grid=(tiles_per_call,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        + [
            pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM)
            for w in weights
        ],
        out_specs=pl.BlockSpec(
            (8, tile_p // 8), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (tiles_per_call * 8, tile_p // 8), jnp.float32
        ),
        interpret=interpret,
    )(base, *weights)


def fused_grid_eval(
    model: ImplicitNet,
    params,
    n: int,
    tile_p: int = 1024,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    mxu_precision: str = "default",
) -> jnp.ndarray:
    """Evaluate the SDF on the dense n^3 grid in [-1,1]^3 (reference
    ordering). Returns (n, n, n) float32 (device array when one slab
    suffices). HBM traffic = weights + output.

    "highest" (multi-pass f32) mode keeps 8 MB of f32 weights in VMEM and the
    compiler stack-allocates slab outputs there too; slabs are bounded to 512
    tiles and looped from host (one compilation total) to fit the 16 MB
    budget — the device-side loop variant crashed the TPU compiler on
    512-tile x 262-call graphs.
    """
    total = n * n * n
    n_tiles = -(-total // tile_p)
    max_call = n_tiles if mxu_precision == "default" else 512
    tiles_per_call = min(n_tiles, max_call)

    def slab(base):
        return _fused_grid_slab(
            model, params, jnp.asarray([[base]], jnp.int32), n, tile_p,
            tiles_per_call, compute_dtype, interpret, mxu_precision,
        )

    if tiles_per_call == n_tiles:
        out = slab(0)
        return out.reshape(-1)[:total].reshape(n, n, n)

    # dispatch ALL slabs asynchronously, then fetch — per-call host syncs cost
    # ~1s each through the axon relay
    rows_per_call = tiles_per_call * tile_p
    parts = [slab(base) for base in range(0, n_tiles, tiles_per_call)]
    flat = np.empty(n_tiles * tile_p, np.float32)
    for k, part in enumerate(parts):
        start = k * rows_per_call
        flat[start : start + rows_per_call] = np.asarray(part).reshape(-1)[
            : len(flat) - start
        ]
    return flat[:total].reshape(n, n, n)


@functools.partial(
    jax.jit, static_argnames=("model", "tile_p", "compute_dtype", "interpret",
                              "mxu_precision")
)
def _fused_apply_padded(
    model, params, x_pad, tile_p, compute_dtype, interpret, mxu_precision="default"
):
    weights, spec, h_pad = prepare_fused_weights(model, params, compute_dtype)
    n_tiles = x_pad.shape[0] // tile_p
    kernel = _make_kernel(model, spec, tile_p, None, compute_dtype, mxu_precision)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_p, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        + [
            pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM)
            for w in weights
        ],
        out_specs=pl.BlockSpec(
            (8, tile_p // 8), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, tile_p // 8), jnp.float32),
        interpret=interpret,
    )(x_pad, *weights)
    return out.reshape(-1)


def fused_apply(
    model: ImplicitNet,
    params,
    points,
    tile_p: int = 1024,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    mxu_precision: str = "default",
) -> jnp.ndarray:
    """Fused forward over arbitrary points (N, 3) -> (N,) float32."""
    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]
    n_pad = _round_up(n, tile_p)
    x_pad = jnp.zeros((n_pad, LANE), jnp.float32)
    x_pad = x_pad.at[:n, :3].set(pts)
    out = _fused_apply_padded(model, params, x_pad, tile_p, compute_dtype, interpret, mxu_precision)
    return out[:n]
