"""Multi-chip dense-grid evaluation: shard the point axis over the mesh.

The BASELINE target ("512^3 < 2 s") is a v5e-8 figure — a single v5e's bf16
speed-of-light for the 496-TFLOP sweep is ~2.5 s, so the last 2x+ comes from
chips, not kernels. The grid is an embarrassingly parallel point set: under
``shard_map`` each device runs the SAME fused Pallas kernel over its
contiguous slab of tiles (slab start = axis_index * tiles_per_device fed to
the kernel's SMEM base offset), and the sharded output never needs a
collective — each shard lands in its own HBM slice.

Works identically on the 8-virtual-CPU test mesh (interpret=True) and a real
multi-chip mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..models.implicit_net import ImplicitNet
from ..parallel.mesh import DATA_AXIS
from .pallas_mlp import _make_kernel, _round_up, prepare_fused_weights


def _local_sweep_pallas(weights, spec, model, n, tile_p, tiles_local,
                        compute_dtype, interpret, base):
    kernel = _make_kernel(model, spec, tile_p, n, compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(tiles_local,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        + [
            pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for w in weights
        ],
        out_specs=pl.BlockSpec((8, tile_p // 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles_local * 8, tile_p // 8),
                                       jnp.float32),
        interpret=interpret,
    )(base, *weights)


@partial(
    jax.jit,
    static_argnames=("model", "n", "mesh", "tile_p", "compute_dtype",
                     "interpret", "use_pallas"),
)
def sharded_grid_eval(
    model: ImplicitNet,
    params,
    n: int,
    mesh,
    tile_p: int = 1024,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Evaluate the n^3 grid with the point axis sharded over mesh's
    'data' axis. Returns (n, n, n) float32 (sharded on the first axis)."""
    n_dev = mesh.devices.size
    total = n * n * n
    n_tiles = _round_up(-(-total // tile_p), n_dev)
    tiles_local = n_tiles // n_dev

    weights, spec, _ = prepare_fused_weights(model, params, compute_dtype)

    def device_fn(params, *weights_shard):
        idx = jax.lax.axis_index(DATA_AXIS)
        base = (idx * tiles_local).astype(jnp.int32).reshape(1, 1)
        if use_pallas:
            return _local_sweep_pallas(
                weights_shard, spec, model, n, tile_p, tiles_local,
                compute_dtype, interpret, base,
            )
        # XLA fallback (CPU test path): generate this slab's coords and apply
        start = base[0, 0] * tile_p
        flat = start + jax.lax.broadcasted_iota(
            jnp.int32, (tiles_local * tile_p, 1), 0
        )[:, 0]
        step = 2.0 / (n - 1)
        coords = jnp.stack(
            [
                -1.0 + step * (flat // (n * n)).astype(jnp.float32),
                -1.0 + step * ((flat // n) % n).astype(jnp.float32),
                -1.0 + step * (flat % n).astype(jnp.float32),
            ],
            axis=-1,
        )
        vals = model.apply(params, coords.astype(compute_dtype))
        return vals.astype(jnp.float32).reshape(tiles_local * 8, tile_p // 8)

    out = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(),) + tuple(P() for _ in weights),
        out_specs=P(DATA_AXIS),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )(params, *weights)
    return out.reshape(-1)[:total].reshape(n, n, n)


# ---------------------------------------------------------------------------
# Sharded SPARSE evaluation: distribute the ACTIVE blocks over the mesh
# ---------------------------------------------------------------------------

# settled active budgets per static config (same trick as sparse_grid)
_KMAX_CACHE_SHARDED: dict = {}


@partial(
    jax.jit,
    static_argnames=("model", "n", "block", "k_max", "tile_blocks", "safety",
                     "eps", "mesh", "compute_dtype", "interpret", "use_pallas",
                     "mxu_precision"),
)
def _sparse_sharded_device(
    model, params, n, block, k_max, tile_blocks, safety, eps, mesh,
    compute_dtype, interpret, use_pallas, mxu_precision,
):
    from .sparse_grid import _make_block_kernel, adaptive_threshold

    n_dev = mesh.devices.size
    nb = n // block
    nb3 = nb * nb * nb
    nb3_loc = nb3 // n_dev
    pts = block * block * block
    k_loc = k_max // n_dev
    s = 2.0 / (n - 1)
    half = (block - 1) / 2.0

    weights, spec, _ = prepare_fused_weights(model, params, compute_dtype)

    def device_fn(params, *weights_shard):
        idx = jax.lax.axis_index(DATA_AXIS)

        # ---- 1. coarse sweep over MY slice of block centers --------------
        flat = idx * nb3_loc + jax.lax.iota(jnp.int32, nb3_loc)
        cz = flat % nb
        cy = (flat // nb) % nb
        cx = flat // (nb * nb)
        centers = jnp.stack(
            [
                -1.0 + s * (cx.astype(jnp.float32) * block + half),
                -1.0 + s * (cy.astype(jnp.float32) * block + half),
                -1.0 + s * (cz.astype(jnp.float32) * block + half),
            ],
            axis=-1,
        )
        coarse_loc = model.apply(params, centers).astype(jnp.float32)
        coarse = jax.lax.all_gather(
            coarse_loc, DATA_AXIS, tiled=True
        )  # (nb3,) replicated

        # ---- 2. selection (identical on every device; cheap) -------------
        # per-block margin scaled by the measured local Lipschitz constant
        # (same rule as the single-device path — ops/sparse_grid.py)
        tau = adaptive_threshold(coarse, n, block, safety, eps)
        mask = jnp.abs(coarse) <= tau
        count = jnp.sum(mask.astype(jnp.int32))
        (ids,) = jnp.nonzero(mask, size=k_max, fill_value=0)
        ids = ids.astype(jnp.int32)

        # certificate (replicated): the single shared copy — adjacent
        # inactive blocks with disagreeing center signs prove a missed
        # crossing, only possible when local Lipschitz > ~1.95*safety
        from .sparse_grid import certificate_violations

        viol = certificate_violations(coarse, mask, nb)

        # ---- 3. refine MY contiguous slice of the active list ------------
        # (actives spread over the whole surface, so equal slices of the
        # sorted list balance within ~1 tile)
        ids_loc = jax.lax.dynamic_slice(ids, (idx * k_loc,), (k_loc,))
        count_loc = jnp.clip(count - idx * k_loc, 0, k_loc)
        if use_pallas:
            tile_p = tile_blocks * pts
            n_tiles = k_loc // tile_blocks
            kernel = _make_block_kernel(
                spec, model.beta, nb, block, s, tile_blocks, k_loc,
                compute_dtype, mxu_precision,
            )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(w.shape, lambda i, ids_ref, nd=w.ndim: (0,) * nd,
                                 memory_space=pltpu.VMEM)
                    for w in weights_shard
                ],
                out_specs=pl.BlockSpec((8, tile_p // 8), lambda i, ids_ref: (i, 0),
                                       memory_space=pltpu.VMEM),
            )
            fine_loc = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (n_tiles * 8, tile_p // 8), jnp.float32
                ),
                interpret=interpret,
            )(
                jnp.concatenate([ids_loc, count_loc[None].astype(jnp.int32)]),
                *weights_shard,
            ).reshape(k_loc, pts)
        else:
            # XLA fallback (CPU mesh tests / dryrun): same coords, plain apply
            lf = jax.lax.iota(jnp.int32, pts)
            lz = lf % block
            ly = (lf // block) % block
            lx = lf // (block * block)
            bz = ids_loc % nb
            by = (ids_loc // nb) % nb
            bx = ids_loc // (nb * nb)
            ix = bx[:, None] * block + lx[None, :]
            iy = by[:, None] * block + ly[None, :]
            iz = bz[:, None] * block + lz[None, :]
            coords = jnp.stack(
                [
                    -1.0 + s * ix.astype(jnp.float32),
                    -1.0 + s * iy.astype(jnp.float32),
                    -1.0 + s * iz.astype(jnp.float32),
                ],
                axis=-1,
            ).reshape(k_loc * pts, 3)
            fine_loc = (
                model.apply(params, coords.astype(compute_dtype))
                .astype(jnp.float32)
                .reshape(k_loc, pts)
            )

        # ---- 4. exchange refined rows; assemble MY x-slab ----------------
        fine_all = jax.lax.all_gather(
            fine_loc, DATA_AXIS, tiled=True
        )  # (k_max, pts)
        row_valid = jax.lax.iota(jnp.int32, k_max) < count
        tgt = ids - idx * nb3_loc
        tgt = jnp.where(
            row_valid & (tgt >= 0) & (tgt < nb3_loc), tgt, nb3_loc
        )
        vol_loc = jnp.broadcast_to(coarse_loc[:, None], (nb3_loc, pts))
        vol_loc = vol_loc.at[tgt].set(fine_all, mode="drop")
        vol_loc = (
            vol_loc.reshape(nb // n_dev, nb, nb, block, block, block)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(n // n_dev, n, n)
        )
        return vol_loc, count[None], viol[None]

    vol, counts, viols = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(),) + tuple(P() for _ in weights),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )(params, *weights)
    return vol, counts[0], viols[0]


def sparse_sharded_grid_eval(
    model: ImplicitNet,
    params,
    n: int,
    mesh,
    block: int = 8,
    k_max_frac: float = 0.1875,
    safety: float = 1.5,
    eps: float = 0.01,
    tile_blocks: int = 2,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    use_pallas: bool = True,
    mxu_precision: str = "default",
    return_count: bool = False,
    on_violation: str = "dense",
):
    """Sparse hierarchical grid eval with ACTIVE BLOCKS sharded over the
    mesh (the multi-chip form of ops.sparse_grid.sparse_grid_eval;
    ``on_violation`` has the same semantics — the runtime certificate is
    evaluated on the replicated coarse field, the dense response re-runs
    ``sharded_grid_eval``).

    Every device coarse-sweeps its slice of block centers (all_gather to
    replicate the tiny coarse field), refines an equal contiguous slice of
    the active list with the same Pallas block kernel, then an all_gather
    of the refined rows lets each device assemble the x-slab of the volume
    it owns. Output: (n, n, n) float32 sharded on axis 0; bitwise-matches
    the single-device sparse path (tests/test_sharded_eval.py).

    Requires n % block == 0, (n // block) % n_dev == 0.
    """
    n_dev = mesh.devices.size
    if n % block:
        raise ValueError(f"n={n} must be divisible by block={block}")
    nb = n // block
    if nb % n_dev:
        raise ValueError(
            f"block-grid {nb}^3 must split over {n_dev} devices (nb % n_dev"
            " == 0)"
        )
    nb3 = nb ** 3
    quantum = tile_blocks * n_dev
    cache_key = (model, n, block, tile_blocks, float(safety), float(eps),
                 str(compute_dtype), mxu_precision, n_dev)
    k_max = _KMAX_CACHE_SHARDED.get(
        cache_key, max(quantum, int(nb3 * k_max_frac))
    )
    k_max = -(-k_max // quantum) * quantum

    if on_violation not in ("dense", "error", "warn"):
        raise ValueError(f"on_violation={on_violation!r}")
    while True:
        vol, count, viol = _sparse_sharded_device(
            model, params, n, block, k_max, tile_blocks, float(safety),
            float(eps), mesh, compute_dtype, interpret, use_pallas,
            mxu_precision,
        )
        count = int(count)
        viol = int(viol)
        if viol > 0:
            msg = (
                f"sparse_sharded_grid_eval certificate: {viol} adjacent "
                f"inactive block pair(s) disagree in center sign at n={n}, "
                f"block={block}, safety={safety}"
            )
            if on_violation == "error":
                raise ValueError(msg)
            print(f"[sharded_eval] {msg}; "
                  + ("re-evaluating densely" if on_violation == "dense"
                     else "proceeding (on_violation='warn')"),
                  flush=True)
            if on_violation == "dense":
                vol = sharded_grid_eval(
                    model, params, n, mesh, compute_dtype=compute_dtype,
                    interpret=interpret, use_pallas=use_pallas,
                )
                break
        if count <= k_max:
            _KMAX_CACHE_SHARDED[cache_key] = k_max
            break
        if count > nb3 // 2:
            vol = sharded_grid_eval(
                model, params, n, mesh, compute_dtype=compute_dtype,
                interpret=interpret, use_pallas=use_pallas,
            )
            break
        k_max = -(-int(count * 1.25) // quantum) * quantum
    if return_count:
        return vol, count
    return vol
