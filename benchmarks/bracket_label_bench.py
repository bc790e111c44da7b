import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ["SDF_CULLED_DEBUG"] = "1"
import numpy as np, jax
from sdf_representation_tpu.geometry.primitives import make_bracket
from sdf_representation_tpu.ops.sdf_culled import signed_distance_culled

tri_chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
use_pallas = (sys.argv[2] != "xla") if len(sys.argv) > 2 else True

t0 = time.time()
mesh = make_bracket(128)
print(f"bracket: {len(mesh.faces)} faces in {time.time()-t0:.1f}s", flush=True)
n = 256
ax = np.linspace(-1, 1, n, dtype=np.float32)
X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
print(f"grid pts: {len(pts)}", flush=True)
t0 = time.time()
d, g = signed_distance_culled(pts, mesh, tri_chunk=tri_chunk,
                              use_pallas=use_pallas)
t = time.time() - t0
print(f"256^3 x {len(mesh.faces)} faces, tri_chunk={tri_chunk}, "
      f"pallas={use_pallas}: {t:.1f}s", flush=True)
# correctness spot check vs dense oracle on a small subset
from sdf_representation_tpu.ops.sdf_exact import signed_distance
sub_idx = np.random.default_rng(0).choice(len(pts), 2000, replace=False)
dd, _ = signed_distance(pts[sub_idx], mesh, method="dense")
err = np.abs(d[sub_idx] - dd).max()
agree = np.mean(np.sign(d[sub_idx]) == np.sign(dd))
print(f"max |err| vs dense: {err:.2e}, sign agreement: {agree:.6f}", flush=True)
