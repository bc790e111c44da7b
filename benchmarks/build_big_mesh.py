import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from sdf_representation_tpu.geometry.primitives import make_icosphere
t0 = time.time()
mesh = make_icosphere(11, 0.5)  # 83.9M faces
print(f"built {len(mesh.faces)} faces in {time.time()-t0:.0f}s", flush=True)
np.save("/tmp/big_verts.npy", mesh.vertices)
np.save("/tmp/big_faces.npy", mesh.faces)
print("saved", flush=True)
