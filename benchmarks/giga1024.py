"""Field->mesh at 1024^3 on one chip via slab-streamed extraction.

The single-dispatch extractor caps at ~645^3 (int32 slot space) and 2^24
vertices; ops/giga_extract lifts both. This measures the full wall
(coarse sweep + per-slab refine + march + host merge) on the flagship
8x512 ImplicitNet, plus a 512^3 run through the same path for comparison
against the single-dispatch number (bench.py's extract stage).

Run on the TPU: `python benchmarks/giga1024.py [n]` (default 1024).
"""

import sys
import time

import jax
import jax.numpy as jnp
import jax.random as jr

from sdf_representation_tpu.models.implicit_net import ImplicitNet
from sdf_representation_tpu.ops.giga_extract import (
    default_slab,
    extract_mesh_giga,
)

args = sys.argv[1:]
hash_mode = "hash" in args
nums = [a for a in args if a.isdigit()]
n = int(nums[0]) if nums else 1024
if hash_mode:
    from sdf_representation_tpu.models.hash_mlp import HashMLP

    model = HashMLP()
    params = model.init(jr.PRNGKey(0))
    # bias the head so the level set is non-trivial on a random init
    probe = jr.uniform(jr.PRNGKey(1), (8192, 3), minval=-1.0, maxval=1.0)
    med = float(jnp.median(model.apply(params, probe)))
    params["mlp"][-1]["b"] = params["mlp"][-1]["b"] - med
else:
    model = ImplicitNet(d_in=3, hidden_dims=(512,) * 8, skip_in=(4,),
                        beta=100.0, radius_init=0.75)
    params = model.init(jr.PRNGKey(0))
params = jax.device_put(params)
jax.block_until_ready(params)
slab = default_slab(n)
print(f"n={n} slab={slab} planes/slab={slab + 1} "
      f"slabs={-(-(n - 1) // slab)}", flush=True)

for run in ("warmup(compile)", "timed"):
    t0 = time.time()
    verts, faces = extract_mesh_giga(model, params, n, wire="packed")
    wall = time.time() - t0
    print(f"{run}: {wall:.2f}s verts={len(verts):,} faces={len(faces):,}",
          flush=True)
