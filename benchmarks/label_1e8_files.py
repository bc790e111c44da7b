"""End-to-end sharded-corpus labeling at the 10^8-face scale.

Builds a synthetic geometry corpus the way massive scans ship (the
reference's DAVID scenario, datagenerator/data_generator.py:674-676,
:745-801): 24 .ply shard files of ~5.2M faces each (24 closed icospheres
on a 4x3x2 grid, ~126M faces total) that never co-reside in host RAM.
Then the reference pipeline roles end to end:

1. `write_signed_distance_distributed` walks the shards (journaled,
   resumable) and emits surface.csv — the reference's distributed
   sampling role.
2. `signed_distance_files` labels 1M uniform points EXACTLY against the
   whole corpus: shards stream through host RAM one at a time and through
   the device in face slabs; distances combine by running min, signs by
   summed winding.
3. Exactness oracle: the union-of-spheres analytic SDF (facet error at
   icosphere level 9 is ~r*2e-6).

Run on the TPU: `python benchmarks/label_1e8_files.py [n_shards]`
(default 24; pass 4 for a ~21M-face smoke). Shards cached in
/tmp/shard_corpus — delete to rebuild.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SDF_CULLED_DEBUG", "1")

import numpy as np

from sdf_representation_tpu.geometry.mesh_io import Mesh, save_mesh
from sdf_representation_tpu.geometry.primitives import make_icosphere
from sdf_representation_tpu.ops.sdf_culled import signed_distance_files
from sdf_representation_tpu.sampling.distributed import (
    write_signed_distance_distributed,
)

N_SHARDS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
R = 0.12
CORPUS = "/tmp/shard_corpus"
GRID = [(x, y, z) for x in (-0.7, -0.23, 0.23, 0.7)
        for y in (-0.5, 0.0, 0.5) for z in (-0.35, 0.35)][:N_SHARDS]

os.makedirs(CORPUS, exist_ok=True)
base = None
t0 = time.time()
paths = []
for i, c in enumerate(GRID):
    p = os.path.join(CORPUS, f"shard{i:02d}.ply")
    paths.append(p)
    if os.path.exists(p):
        continue
    if base is None:
        base = make_icosphere(9, R)  # 5.24M faces
    save_mesh(Mesh(base.vertices + np.asarray(c), base.faces), p)
    print(f"shard {i}: {p}", flush=True)
n_faces = N_SHARDS * 5242880
print(f"corpus: {N_SHARDS} shards, {n_faces/1e6:.0f}M faces total, "
      f"built/cached in {time.time()-t0:.0f}s", flush=True)

# 1. distributed sampling role: journaled walk, surface.csv
t0 = time.time()
csv = write_signed_distance_distributed(CORPUS, os.path.join(CORPUS, "out"),
                                        num_points_surface=1000)
import pandas as pd

n_rows = len(pd.read_csv(csv))
print(f"distributed sampling: {n_rows} surface rows -> {csv} "
      f"({time.time()-t0:.0f}s)", flush=True)

# 2. exact labeling of 1M uniform points against the whole sharded corpus
rng = np.random.default_rng(0)
pts = rng.uniform(-1, 1, (1_000_000, 3))
t0 = time.time()
d, nrm = signed_distance_files(pts, paths, slab_faces=1 << 22)
t = time.time() - t0
print(f"1M pts x {n_faces/1e6:.0f}M faces (sharded files): {t:.1f}s "
      f"({1e6 * n_faces / t / 1e9:.1f} G pairs/s equiv)", flush=True)

# 3. exactness: union-of-spheres analytic oracle
ana = np.full(len(pts), np.inf)
for c in GRID:
    ana = np.minimum(ana, np.linalg.norm(pts - np.asarray(c), axis=1) - R)
err = np.abs(d - ana).max()
sign_ok = np.mean(np.sign(d) == np.sign(ana))
print(f"vs analytic union-of-spheres: max |err| = {err:.2e}, "
      f"sign agreement = {sign_ok:.6f}", flush=True)
assert err < 1e-4 and sign_ok > 0.99999
print("done", flush=True)
