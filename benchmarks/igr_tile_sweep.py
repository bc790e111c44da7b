import sys, time, itertools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sdf_representation_tpu.models import ImplicitNet
from sdf_representation_tpu.ops.pallas_igr import make_fused_value_and_grad

model = ImplicitNet(d_in=3, hidden_dims=(512,)*8, skip_in=(4,), beta=100.0)
params = model.init(jax.random.PRNGKey(0))
B = 2**18
x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3), minval=-1, maxval=1)

results = {}
for ft, bt in itertools.product((128, 256, 512), repeat=2):
    try:
        vag = make_fused_value_and_grad(model, fwd_tile_p=ft, bwd_tile_p=bt)

        def loss(p, x):
            f, g = vag(p, x)
            return jnp.mean(jnp.abs(f)) + jnp.mean((jnp.linalg.norm(g, axis=1) - 1.0) ** 2)

        step = jax.jit(jax.grad(loss))
        g = step(params, x); float(jax.device_get(jnp.sum(g["lin0"]["w"] if "lin0" in g else list(g.values())[0]["w"] if isinstance(list(g.values())[0], dict) else list(g.values())[0])))
    except Exception as e:
        print(f"ft={ft} bt={bt}: FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
        continue
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        for _ in range(5):
            g = step(params, x)
        leaf = jax.tree_util.tree_leaves(g)[0]
        float(jax.device_get(jnp.sum(leaf)))
        dt = (time.time() - t0) / 5
        best = max(best, B / dt)
    results[(ft, bt)] = best
    print(f"ft={ft} bt={bt}: {best/1e6:.2f} M pts/s", flush=True)

best = max(results, key=results.get)
print(f"BEST: ft={best[0]} bt={best[1]} -> {results[best]/1e6:.2f} M pts/s", flush=True)
