import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ["SDF_CULLED_DEBUG"] = "1"
import numpy as np
from sdf_representation_tpu.ops.sdf_culled import signed_distance_streamed

verts = np.load("/tmp/big_verts.npy")
faces = np.load("/tmp/big_faces.npy")
print(f"mesh: {len(faces)} faces", flush=True)
rng = np.random.default_rng(0)
pts = rng.uniform(-1, 1, (1_000_000, 3))
t0 = time.time()
d, nrm = signed_distance_streamed(pts, verts, faces, slab_faces=1 << 24)
t = time.time() - t0
print(f"1M pts x {len(faces)} faces (streamed slabs): {t:.1f}s "
      f"({1e6*len(faces)/t/1e9:.1f} G pairs/s equiv)", flush=True)
ana = np.linalg.norm(pts, axis=1) - 0.5
print(f"vs analytic sphere: max |d - analytic| = {np.abs(d - ana).max():.2e}",
      flush=True)
np.save("/tmp/label84m_d.npy", d[:4000])
np.save("/tmp/label84m_pts.npy", pts[:4000])
print("done", flush=True)
