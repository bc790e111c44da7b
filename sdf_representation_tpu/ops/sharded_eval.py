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
