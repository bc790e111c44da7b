"""Hierarchical (coarse -> refine) sparse dense-grid SDF evaluation.

For SDF *extraction* only cells straddling the zero level set matter — the
role the reference delegates to its C++ octree consumer
(reference ops/DeepTrace/src/deeptrace.cpp:59-81 refines octree cells by
re-querying the network near the surface). This module performs the same
refinement ON-DEVICE in two levels:

  1. **Coarse sweep**: the n^3 grid is partitioned into ``block``^3-point
     tiles (512 points each for block=8). The field is evaluated once at
     every tile *center* (f32 XLA pass; (n/block)^3 points, ~0.2% of the
     grid).
  2. **Selection**: a tile can contain (or touch, through a marching cell
     shared with a neighbour) a zero crossing only if
         |f(center)| <= safety * max(1, L_est) * s * sqrt(3) * (block+1)/2 + eps
     where s = grid step and L_est is the field's local Lipschitz constant
     MEASURED from the coarse sweep's own neighbour differences (dilated one
     block; see adaptive_threshold for the derivation). The unit floor keeps
     SDF-like fields (L ~ 1) at the historical activity fraction; steep
     fields (Siren omega_0=30 is ~30-Lipschitz) grow the margin with the
     field instead of missing surface. ``eps`` absorbs the bf16-kernel vs
     f32-coarse numeric skew. Active tile ids come from jnp.nonzero with a
     STATIC bound ``k_max`` so the whole pipeline is one jitted dispatch.
  3. **Refinement**: a Pallas kernel (weights VMEM-resident, scalar-prefetched
     tile ids, coordinates synthesised in-kernel — zero coordinate HBM
     traffic) evaluates all 512 fine points of each active tile, bitwise
     identical to the dense fused kernel (ops/pallas_mlp.py). Inactive tiles
     are filled with their (correct-sign) center value.

The resulting volume matches the dense fused evaluation EXACTLY on every
cell within an active tile — in particular on the whole zero-crossing shell
— so marching cubes/tetrahedra extract the identical mesh while evaluating
~5-15% of the volume (tests/test_sparse_grid.py proves mesh equality).

Grid convention matches the reference: linspace(-1,1,n), 'ij' indexing,
flat = x*n^2 + y*n + z (reference executor/executor.py:353-356).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.implicit_net import ImplicitNet
from .pallas_mlp import LANE, _make_body, prepare_fused_weights

# settled active-block budgets per static shape (see sparse_grid_eval)
_KMAX_CACHE: dict = {}


def active_threshold(n: int, block: int, safety: float, eps: float) -> float:
    """|f(center)| bound below which a block might touch a zero crossing.

    A crossing inside a marching cell with ANY corner in this block lies
    within s*sqrt(3)*(block+1)/2 of the block center ((block-1)/2 half-width
    + 1 step for boundary-straddling cells). This is the unit-Lipschitz
    floor; the selection additionally scales it by the field's MEASURED
    local Lipschitz constant (adaptive_threshold below)."""
    s = 2.0 / (n - 1)
    return safety * s * math.sqrt(3.0) * (block + 1) / 2.0 + eps


def adaptive_threshold(coarse, n: int, block: int, safety: float,
                       eps: float):
    """Per-block activity threshold tau_b, (nb^3,) float32 — the margin
    DERIVATION (replaces the round-3 swept constant):

    A block must be refined if the field can reach ``level`` anywhere a
    marching cell touching the block samples it, i.e. within
    r = s*sqrt(3)*(block+1)/2 of the block center. For a field with local
    Lipschitz constant L around the block that region is reachable only
    when |f(center) - level| <= L*r (+ eps for the bf16-refinement vs
    f32-coarse numeric skew). The reference assumption L ~ 1 holds for an
    eikonal/SDF-like field but NOT in general (Siren omega_0=30 fields are
    ~30-Lipschitz), so L is ESTIMATED from the coarse sweep itself: for
    every face-adjacent center pair, |f(a) - f(b)| / (block*s) lower-bounds
    the Lipschitz constant on the segment between them; each block takes
    the max over its own 6 faces and (one dilation step) its face
    neighbours' faces, so a steep flank one block away still raises the
    margin. tau_b = safety * max(1, L_est) * r + eps:

      * SDF-like fields (L <= 1): identical selection to the historical
        safety=1.5 constant — no activity-fraction regression;
      * steep fields: the margin grows WITH the field, so the zero-crossing
        shell is selected by construction instead of being caught after
        the fact by the certificate (which remains as the backstop for
        sub-block variation that center differences cannot see: an interior
        dip steeper than every surrounding center difference).

    ``safety`` multiplies the estimate because center differences
    lower-bound L (a kink midway between centers halves the observed
    slope; 1.5 covers curvature up to that geometric factor)."""
    nb = n // block
    s = 2.0 / (n - 1)
    r = s * math.sqrt(3.0) * (block + 1) / 2.0
    c3 = coarse.reshape(nb, nb, nb)
    l3 = jnp.zeros((nb, nb, nb), jnp.float32)
    inv = 1.0 / (block * s)
    for ax in range(3):
        d = jnp.abs(jnp.diff(c3, axis=ax)) * inv
        pad_lo = [(0, 0)] * 3
        pad_lo[ax] = (1, 0)
        pad_hi = [(0, 0)] * 3
        pad_hi[ax] = (0, 1)
        l3 = jnp.maximum(l3, jnp.pad(d, pad_lo))
        l3 = jnp.maximum(l3, jnp.pad(d, pad_hi))
    # one face-neighbour dilation: steep flanks raise adjacent margins too
    dil = l3
    for ax in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(None, -1)
        hi[ax] = slice(1, None)
        dil = dil.at[tuple(lo)].max(l3[tuple(hi)])
        dil = dil.at[tuple(hi)].max(l3[tuple(lo)])
    tau = safety * jnp.maximum(1.0, dil) * r + eps
    return tau.reshape(-1)


def _make_block_kernel(spec, beta, nb, block, step, tile_blocks, k_max,
                       compute_dtype, mxu_precision):
    pts = block * block * block
    tile_p = tile_blocks * pts
    body = _make_body(spec, beta, compute_dtype, mxu_precision)

    def kernel(ids_ref, *args):
        refs, out_ref = args[:-1], args[-1]
        i = pl.program_id(0)
        # ids_ref carries [ids..., count]; tiles past the live count skip
        # all compute (their scatter rows are dropped by the caller)
        count = ids_ref[k_max]

        @pl.when(i * tile_blocks < count)
        def _():
            row = jax.lax.broadcasted_iota(jnp.int32, (tile_p, LANE), 0)
            # per-row block id: tile_blocks scalar SMEM reads broadcast to rows
            bvec = jnp.full((tile_p, LANE), ids_ref[i * tile_blocks], jnp.int32)
            for t in range(1, tile_blocks):
                bvec = jnp.where(
                    row >= t * pts, ids_ref[i * tile_blocks + t], bvec
                )
            local = jax.lax.rem(row, pts)
            lz = jax.lax.rem(local, block)
            ly = jax.lax.rem(jax.lax.div(local, block), block)
            lx = jax.lax.div(local, block * block)
            bz = jax.lax.rem(bvec, nb)
            by = jax.lax.rem(jax.lax.div(bvec, nb), nb)
            bx = jax.lax.div(bvec, nb * nb)
            ix = bx * block + lx
            iy = by * block + ly
            iz = bz * block + lz
            col = jax.lax.broadcasted_iota(jnp.int32, (tile_p, LANE), 1)
            ci = jnp.where(col == 0, ix, jnp.where(col == 1, iy, iz))
            # identical arithmetic to the dense grid kernel -> bitwise-equal
            # coords
            x_pad = jnp.where(
                col < 3, -1.0 + step * ci.astype(jnp.float32), 0.0
            ).astype(compute_dtype)
            body(refs, x_pad, out_ref)

    return kernel


def coarse_and_certificate(model, params, n, block, safety, eps,
                           level=0.0):
    """Coarse center sweep + activity mask + exactness certificate around
    the ``level`` set (traced helper shared by the full sparse evaluator
    here and the slab-streamed giga extractor, ops/giga_extract.py — ONE
    copy of the selection rule).

    Certificate: no pair of adjacent INACTIVE blocks may disagree in
    center side-of-level — that would prove a crossing between two centers
    the selection skipped (the segment between adjacent centers only
    passes through those two blocks). For a field of local Lipschitz L the
    pair violates |c_a - c_b| > 2*tau only when L > safety*sqrt(3)*
    (block+1)/block (~1.95*safety), so fields within the assumed bound can
    NEVER trip it: zero false positives by construction, and it fires
    exactly when the safety assumption materially failed (e.g. Siren-sharp
    fields). Cost: three shifted compares over the (nb, nb, nb) coarse
    grid — noise next to the refinement pass."""
    nb = n // block
    nb3 = nb * nb * nb
    s = 2.0 / (n - 1)
    flat = jnp.arange(nb3, dtype=jnp.int32)
    cz = flat % nb
    cy = (flat // nb) % nb
    cx = flat // (nb * nb)
    half = (block - 1) / 2.0
    centers = jnp.stack(
        [
            -1.0 + s * (cx.astype(jnp.float32) * block + half),
            -1.0 + s * (cy.astype(jnp.float32) * block + half),
            -1.0 + s * (cz.astype(jnp.float32) * block + half),
        ],
        axis=-1,
    )
    coarse = model.apply(params, centers).astype(jnp.float32)  # (nb3,)
    tau = adaptive_threshold(coarse, n, block, safety, eps)
    mask = jnp.abs(coarse - level) <= tau
    return coarse, mask, certificate_violations(coarse, mask, nb, level)


def certificate_violations(coarse, mask, nb, level=0.0):
    """Count adjacent INACTIVE block pairs whose centers straddle the
    level — each one proves a crossing the selection skipped (traced; the
    single copy of the certificate, shared with ops/sharded_eval.py)."""
    c3 = (coarse <= level).reshape(nb, nb, nb)
    i3 = jnp.logical_not(mask).reshape(nb, nb, nb)
    viol = jnp.int32(0)
    for ax in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(None, -1)
        hi[ax] = slice(1, None)
        bad = (
            (c3[tuple(lo)] != c3[tuple(hi)])
            & i3[tuple(lo)]
            & i3[tuple(hi)]
        )
        viol = viol + jnp.sum(bad.astype(jnp.int32))
    return viol


def refine_blocks(model, params, ids, count, n, block, k_max, tile_blocks,
                  compute_dtype, interpret, mxu_precision):
    """Pallas refinement of ``count`` active blocks (global flat ids) —
    (k_max, block^3) fine values; rows past the live count are skipped.
    Traced helper shared with ops/giga_extract.py."""
    nb = n // block
    pts = block * block * block
    s = 2.0 / (n - 1)
    weights, spec, _ = prepare_fused_weights(model, params, compute_dtype)
    tile_p = tile_blocks * pts
    n_tiles = k_max // tile_blocks
    kernel = _make_block_kernel(
        spec, model.beta, nb, block, s, tile_blocks, k_max, compute_dtype,
        mxu_precision,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(w.shape, lambda i, ids_ref, nd=w.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for w in weights
        ],
        out_specs=pl.BlockSpec((8, tile_p // 8), lambda i, ids_ref: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    fine = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, tile_p // 8),
                                       jnp.float32),
        interpret=interpret,
    )(jnp.concatenate([ids, count[None].astype(jnp.int32)]), *weights)
    return fine.reshape(k_max, pts)


def assemble_block_rows(vol_blocked, nrows, nb, block, n):
    """(nrows*nb^2, block^3) block-major values -> (nrows*block, n, n)
    plane-major volume.

    NOT a single whole-volume transpose: XLA materialises that as a 6-d
    copy whose minor dim ``block``(=8) is lane-padded to 128 — a 16x
    blowup that is 8.6 GB at 512^3 (fit, wastefully) and 19.9 GB at
    1024^3-slab scale, a compile-time HBM OOM on the v5e (first-hardware
    finding, round 5). One x-block-row per lax.map iteration bounds the
    padded scratch at ~0.5 GB, reused across iterations."""
    nb2 = nb * nb
    pts = block * block * block
    rows = vol_blocked.reshape(nrows, nb2, pts)

    def one_row(row):
        return (
            row.reshape(nb, nb, block, block, block)
            .transpose(2, 0, 3, 1, 4)
            .reshape(block, n, n)
        )

    return jax.lax.map(one_row, rows).reshape(nrows * block, n, n)


@functools.partial(
    jax.jit,
    static_argnames=("model", "n", "block", "k_max", "tile_blocks", "safety",
                     "eps", "level", "compute_dtype", "interpret",
                     "mxu_precision"),
)
def _sparse_grid_device(
    model, params, n, block, k_max, tile_blocks, safety, eps, level,
    compute_dtype, interpret, mxu_precision,
):
    nb = n // block
    nb3 = nb * nb * nb
    pts = block * block * block

    coarse, mask, viol = coarse_and_certificate(
        model, params, n, block, safety, eps, level
    )
    # --- selection (static k_max keeps the dispatch single-compilation) ---
    count = jnp.sum(mask.astype(jnp.int32))
    (ids,) = jnp.nonzero(mask, size=k_max, fill_value=0)
    ids = ids.astype(jnp.int32)

    vals = refine_blocks(
        model, params, ids, count, n, block, k_max, tile_blocks,
        compute_dtype, interpret, mxu_precision,
    )

    # --- assemble: coarse fill (correct sign everywhere off-shell) + scatter
    # (rows past the live count were skipped by the kernel: route their
    # scatter index out of range and drop them) ---
    valid = jnp.arange(k_max, dtype=jnp.int32) < count
    ids_sc = jnp.where(valid, ids, nb3)
    vol_blocked = jnp.broadcast_to(coarse[:, None], (nb3, pts))
    vol_blocked = vol_blocked.at[ids_sc].set(vals, mode="drop")
    vol = assemble_block_rows(vol_blocked, nb, nb, block, n)
    return vol, count, viol


def sparse_grid_eval(
    model: ImplicitNet,
    params,
    n: int,
    block: int = 8,
    k_max_frac: float = 0.1875,
    safety: float = 1.5,
    eps: float = 0.01,
    tile_blocks: int = 2,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    mxu_precision: str = "default",
    return_count: bool = False,
    on_violation: str = "dense",
    level: float = 0.0,
):
    """Sparse hierarchical SDF evaluation of the dense n^3 grid.

    ``level``: the iso-level the caller will extract — selection and the
    certificate track the f=level shell (the fill is exact only on blocks
    near THAT level; default 0, the SDF surface).

    Returns an (n, n, n) float32 device array that agrees with
    ``fused_grid_eval`` bitwise on every active (near-surface) block and
    carries correct-sign coarse fill elsewhere. If the active-block count
    exceeds the static budget, the call transparently re-runs with a larger
    budget (recompile) and finally falls back to dense when >50% of blocks
    are active.

    The activity margin is ADAPTIVE: safety * max(1, L_est) per block,
    where L_est is the local Lipschitz constant measured from the coarse
    sweep's neighbour differences (adaptive_threshold documents the
    derivation; safety=1.5 covers the center-difference underestimate).
    SDF-like fields select exactly what the historical swept constant did;
    steep fields are selected by construction. Every call ALSO runs a
    runtime CERTIFICATE for the one case the estimate cannot see (a
    sub-block interior dip steeper than every surrounding center
    difference): two adjacent inactive blocks whose center signs disagree
    prove a missed crossing. ``on_violation`` picks the response: "dense"
    (default) re-evaluates the whole grid densely — exactness is restored
    at dense-eval cost — with a printed warning; "error" raises
    ValueError; "warn" only prints. Role match: the octree refinement
    correctness contract of reference ops/DeepTrace/src/deeptrace.cpp:59-81.
    """
    if n % block:
        raise ValueError(f"n={n} must be divisible by block={block}")
    if on_violation not in ("dense", "error", "warn"):
        raise ValueError(f"on_violation={on_violation!r}")
    nb3 = (n // block) ** 3

    def _dense():
        from .pallas_mlp import fused_grid_eval

        return jnp.asarray(fused_grid_eval(
            model, params, n, compute_dtype=compute_dtype,
            interpret=interpret, mxu_precision=mxu_precision,
        ))

    # start from the last settled budget for this static shape: without the
    # cache EVERY call would re-pay a wasted undersized pass before growing
    # (~0.6 s at 512^3), and thanks to the in-kernel early exit an oversized
    # budget costs nothing but scatter rows
    cache_key = (model, n, block, tile_blocks, float(safety), float(eps),
                 float(level), str(compute_dtype), mxu_precision)
    k_max = _KMAX_CACHE.get(
        cache_key, max(tile_blocks, int(nb3 * k_max_frac))
    )
    k_max = -(-k_max // tile_blocks) * tile_blocks

    while True:
        vol, count, viol = _sparse_grid_device(
            model, params, n, block, k_max, tile_blocks, float(safety),
            float(eps), float(level), compute_dtype, interpret,
            mxu_precision,
        )
        count = int(count)
        viol = int(viol)
        if viol > 0:
            msg = (
                f"sparse_grid_eval certificate: {viol} adjacent inactive "
                f"block pair(s) disagree in center sign at n={n}, "
                f"block={block}, safety={safety} — the field's local "
                "Lipschitz exceeds the selection margin and the sparse "
                "sweep WOULD have missed surface"
            )
            if on_violation == "error":
                raise ValueError(msg)
            print(f"[sparse_grid] {msg}; "
                  + ("re-evaluating densely" if on_violation == "dense"
                     else "proceeding (on_violation='warn')"),
                  flush=True)
            if on_violation == "dense":
                vol = _dense()
                break
        if count <= k_max:
            _KMAX_CACHE[cache_key] = k_max
            break
        if count > nb3 // 2:
            vol = _dense()
            break
        k_max = -(-int(count * 1.25) // tile_blocks) * tile_blocks
    if return_count:
        return vol, count
    return vol
