import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ["SDF_CULLED_DEBUG"] = "1"
import numpy as np
from sdf_representation_tpu.geometry.primitives import make_icosphere
from sdf_representation_tpu.ops.sdf_exact import signed_distance

t0 = time.time()
mesh = make_icosphere(10, 0.5)  # 20.97M faces
print(f"mesh: {len(mesh.faces)} faces, built in {time.time()-t0:.1f}s", flush=True)
rng = np.random.default_rng(0)
pts = rng.uniform(-1, 1, (1_000_000, 3))
t0 = time.time()
d, nrm = signed_distance(pts, mesh, method="culled")
t_label = time.time() - t0
print(f"1M pts x {len(mesh.faces)} faces: {t_label:.1f}s "
      f"({1_000_000*len(mesh.faces)/t_label/1e9:.1f} G pairs/s equiv)", flush=True)
# exactness: analytic sphere SDF (radius 0.5) — the icosphere is a faceted
# approximation; compare against the DENSE exact path on a small subset
sub = pts[:2000]
t0 = time.time()
dd, _ = signed_distance(sub, mesh, method="dense")
print(f"dense check subset: {time.time()-t0:.1f}s", flush=True)
err = np.abs(d[:2000] - dd).max()
sign_agree = np.mean(np.sign(d[:2000]) == np.sign(dd))
print(f"culled-vs-dense max |err|: {err:.2e}  sign agreement: {sign_agree:.6f}", flush=True)
ana = np.linalg.norm(pts, axis=1) - 0.5
print(f"vs analytic sphere: max |d - analytic| = {np.abs(d - ana).max():.2e} (facet error ~r*(1-cos) ~ 1e-7 at lvl10)", flush=True)
