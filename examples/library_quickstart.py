"""Programmatic (non-CLI) use of sdf_representation_tpu, end to end.

The INI-driven CLI (`python main.py config.ini`) mirrors the reference
workflow; this example shows the same pipeline as a library — build or
load a mesh, label points with the exact SDF, train a model, evaluate a
grid, extract a mesh, and audit accuracy — with everything sized to run
in about a minute on CPU (scale the constants up on a TPU).

Run:  python examples/library_quickstart.py [out_dir]
"""

import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main(out_dir=None):
    out_dir = out_dir or tempfile.mkdtemp(prefix="sdf_quickstart_")

    # 1. Geometry: any STL/OBJ/PLY via geometry.mesh_io.load_mesh, or a
    #    procedural test solid
    from sdf_representation_tpu.geometry.primitives import make_torus
    from sdf_representation_tpu.geometry.rescale import rescale_mesh

    mesh = make_torus()
    mesh = rescale_mesh(mesh)  # unit-cube convention ([-1,1]^3 * 0.85)

    # 2. Labeled samples: uniform + surface + narrow-band, exact signed
    #    distances computed on-device (the igl.signed_distance role)
    from sdf_representation_tpu.sampling.sampler import (
        generate_signed_distance_data,
    )

    import pandas as pd

    dfs = generate_signed_distance_data(
        mesh, num_points_uniform=20000, num_points_surface=2,
        num_points_narrow_band=2, dense_width=0.1,
    )
    df = pd.concat(dfs, ignore_index=True)
    X = jnp.asarray(df[["x", "y", "z"]].to_numpy(np.float32))
    Y = jnp.asarray(df[["S", "nx", "ny", "nz"]].to_numpy(np.float32))

    # 3. Model + loss + jitted whole-epoch training loop
    from sdf_representation_tpu.losses import WeightedSmoothL2Loss
    from sdf_representation_tpu.models import ImplicitNet
    from sdf_representation_tpu.training.trainer import make_epoch_fn

    model = ImplicitNet(d_in=3, hidden_dims=(64,) * 4, skip_in=(2,),
                        beta=100.0, geometric_init=True)
    trainable = {"params": model.init(jax.random.PRNGKey(0)), "aux": {}}
    opt = optax.adam(1e-3)
    opt_state = opt.init(trainable)
    n_points = X.shape[0]
    epoch_fn = make_epoch_fn(model, WeightedSmoothL2Loss(), opt, 4096,
                             n_points, matmul_precision="bfloat16")
    key = jax.random.PRNGKey(1)
    for epoch in range(60):
        key, sub = jax.random.split(key)
        trainable, opt_state, losses = epoch_fn(
            trainable, opt_state, X, Y, sub, epoch
        )
    print(f"final train loss: {float(jnp.mean(losses)):.2e}")

    # 4. Dense-grid evaluation + mesh extraction (sparse evaluator and
    #    device marching kick in automatically on TPU backends)
    from sdf_representation_tpu.evaluations.reconstruct import (
        reconstruct_mesh,
    )
    from sdf_representation_tpu.geometry.mesh_io import save_mesh

    recon = reconstruct_mesh(model.apply, trainable["params"], 64,
                             model=model)
    out_stl = f"{out_dir}/reconstructed.stl"
    save_mesh(recon, out_stl)
    print(f"reconstructed {len(recon.faces)} faces -> {out_stl}")

    # 5. Accuracy audit vs the exact SDF
    from sdf_representation_tpu.ops.grid_eval import evaluate_grid
    from sdf_representation_tpu.ops.sdf_exact import signed_distance

    n = 48
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    pts = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"),
                   axis=-1).reshape(-1, 3)
    pred = np.asarray(
        evaluate_grid(model.apply, trainable["params"], n, chunk=32768)
    ).reshape(-1)
    true, _ = signed_distance(pts, mesh, return_normals=False)
    acc = float(np.mean(np.sign(pred) == np.sign(true)))
    print(f"{n}^3 sign accuracy vs exact SDF: {acc:.4f}")
    assert acc > 0.97
    return acc


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
