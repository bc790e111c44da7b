import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sdf_representation_tpu.geometry.primitives import make_icosphere
from sdf_representation_tpu.ops.sdf_culled import (
    _dist_stream, _wind_stream, _morton_order, _stream_steps,
)
from sdf_representation_tpu.ops.pallas_streams import (
    dist_stream_pallas, wind_stream_pallas,
)
from sdf_representation_tpu.ops.sdf_exact import _triangle_tables

# realistic shapes: M=2048 points/block, T=1024 tri/chunk, bracket-ish
mesh = make_icosphere(subdivisions=6, radius=0.6)  # 81920 faces
rng = np.random.default_rng(0)
N, M, T = 2**20, 2048, 1024
pts = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
pts = pts[_morton_order(pts)]
B = N // M
P_blocks = pts.reshape(B, M, 3)
tables_np, F = _triangle_tables(mesh.vertices.astype(np.float64), mesh.faces, T)
C = tables_np["a"].shape[0]
keep = rng.uniform(size=(B, C)) < 0.5
keep[:, 0] = True
sb, sc, S = _stream_steps(keep, B)
print(f"B={B} C={C} steps={S} (padded {len(sb)})", flush=True)

# pallas path
t0 = time.time()
d2p, bestp = dist_stream_pallas(P_blocks, sb, sc, tables_np, T)
float(jax.device_get(jnp.sum(bestp)))
print(f"pallas dist compile+run: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
d2p, bestp = dist_stream_pallas(P_blocks, sb, sc, tables_np, T)
float(jax.device_get(jnp.sum(bestp)))
tp = time.time() - t0
print(f"pallas dist steady: {tp:.2f}s ({S/tp:.0f} steps/s, {tp/S*1e6:.0f} us/step)", flush=True)

t0 = time.time()
wp = wind_stream_pallas(P_blocks, sb, sc, tables_np, T)
float(jax.device_get(jnp.sum(wp)))
print(f"pallas wind compile+run: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
wp = wind_stream_pallas(P_blocks, sb, sc, tables_np, T)
float(jax.device_get(jnp.sum(wp)))
twp = time.time() - t0
print(f"pallas wind steady: {twp:.2f}s ({twp/S*1e6:.0f} us/step)", flush=True)

# XLA path
tables = {k: jnp.asarray(v) for k, v in tables_np.items()}
t0 = time.time()
d2x, bestx = _dist_stream(P_blocks, sb, sc, tables, T)
float(jax.device_get(jnp.sum(bestx)))
print(f"xla dist compile+run: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
d2x, bestx = _dist_stream(P_blocks, sb, sc, tables, T)
float(jax.device_get(jnp.sum(bestx)))
tx = time.time() - t0
print(f"xla dist steady: {tx:.2f}s ({tx/S*1e6:.0f} us/step) -> pallas speedup {tx/tp:.2f}x", flush=True)

t0 = time.time()
wx = _wind_stream(P_blocks, sb, sc, tables)
float(jax.device_get(jnp.sum(wx)))
t0 = time.time()
wx = _wind_stream(P_blocks, sb, sc, tables)
float(jax.device_get(jnp.sum(wx)))
twx = time.time() - t0
print(f"xla wind steady: {twx:.2f}s -> pallas speedup {twx/twp:.2f}x", flush=True)

# parity on device results. NOTE: winner ties and relative SQUARED-distance
# error near d2 -> 0 are both expected f32 noise; the meaningful contract is
# DISTANCE-space absolute error (feeds the upper bound) and the winding sign
# margin (2*pi quantum).
bp = np.asarray(bestp)[:B]; bx = np.asarray(bestx)[:B]
mis = np.mean(bp != bx)
d2p_h = np.asarray(d2p)[:B]; d2x_h = np.asarray(d2x)[:B]
derr = np.nanmax(np.abs(np.sqrt(np.maximum(d2p_h, 0))
                        - np.sqrt(np.maximum(d2x_h, 0))))
print(f"winner mismatch frac: {mis:.2e} (ties); max |dist| err: "
      f"{derr:.2e} (mesh scale 1.2)", flush=True)
werr = np.abs(np.asarray(wp)[:B] - np.asarray(wx)[:B]).max()
print(f"wind max abs err: {werr:.2e} (sign margin 2pi)", flush=True)
