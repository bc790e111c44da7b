import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, optax
from sdf_representation_tpu.models.hash_mlp import HashMLP

m = HashMLP()
params = m.init(jax.random.PRNGKey(0))
B = 65536
x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3), minval=-1, maxval=1)
y = jnp.linalg.norm(x, axis=-1) - 0.5
opt = optax.adam(1e-3)


def encode_old(params, xx):
    x01 = jnp.clip((xx + 1.0) * 0.5, 0.0, 1.0)
    feats = [m._encode_level(t, x01, m.level_resolution(l))
             for l, t in enumerate(params["tables"])] + [xx]
    return jnp.concatenate(feats, axis=-1)


def apply_with(encode, p, xx):
    h = encode(p, xx)
    for i, layer in enumerate(p["mlp"]):
        h = h @ layer["w"] + layer["b"]
        if i < len(p["mlp"]) - 1:
            h = jax.nn.relu(h)
    return h[..., 0]


def bench(name, encode):
    st = opt.init(params)

    @jax.jit
    def step(p, s, xx, yy):
        def loss(p):
            return jnp.mean((apply_with(encode, p, xx) - yy) ** 2)
        l, g = jax.value_and_grad(loss)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    p2, st, l = step(params, st, x, y)
    float(jax.device_get(l))
    best = 0
    for _ in range(3):
        t0 = time.time()
        for _ in range(20):
            p2, st, l = step(p2, st, x, y)
        float(jax.device_get(l))
        dt = (time.time() - t0) / 20
        best = max(best, B / dt)
    print(f"{name}: {best/1e6:.2f} M pts/s ({B/best*1e3:.2f} ms/step)", flush=True)
    return best


t_new = bench("fused-gather train", lambda p, xx: m.encode(p, xx))
t_old = bench("per-level train   ", encode_old)
print(f"speedup: {t_new/t_old:.2f}x", flush=True)
