"""Embed a trained SDF in a non-JAX application via the C ABI.

Train (or load) a model in Python, export it once, then evaluate it from
ANY language through `libsdfnet_c.so` — here via the zero-build-step
ctypes wrapper `export.NativeSDF`. The same artifacts feed the C++
consumers directly (`parity_main`, `deeptrace`); a C caller uses the five
functions in native/src/sdfnet_c.cpp the same way. This replaces the
reference's pattern of linking LibTorch (reference
ops/conversion_test/main.cpp) or ONNX Runtime (reference
ops/DeepTrace/src/deeptrace.cpp:30-71) into every consumer.

Requires the native build: cmake -S native -B build && cmake --build build
Run:  python examples/native_embedding.py [out_dir]
"""

import os
import sys
import tempfile

import jax
import numpy as np


def main(out_dir=None, lib_path=None):
    out_dir = out_dir or tempfile.mkdtemp(prefix="sdf_embed_")

    # 1. A model (snapshot-initialised here; in practice, load a trained
    #    checkpoint with training.checkpoint.load_checkpoint)
    from sdf_representation_tpu.models import ImplicitNet

    model = ImplicitNet(d_in=3, hidden_dims=(64,) * 4, skip_in=(2,),
                        beta=100.0, radius_init=0.5)
    params = model.init(jax.random.PRNGKey(0))

    # 2. Export both native artifacts: model.sdfw (binary weights for the
    #    threaded C++ runtime) and model.onnx (open interchange)
    from sdf_representation_tpu.export import save_for_native

    save_for_native(out_dir, model, params, onnx=True)

    # 3. Evaluate through the shared library — values AND analytic input
    #    gradients, no JAX on the consumer side
    from sdf_representation_tpu.export import NativeSDF

    pts = np.random.default_rng(0).uniform(-1, 1, (10_000, 3)).astype(
        np.float32
    )
    with NativeSDF(os.path.join(out_dir, "model.sdfw"),
                   lib_path=lib_path) as net:
        sdf, grads = net.evaluate(pts, gradients=True)

    # 4. Parity against the JAX forward (f32 eps)
    ref = np.asarray(model.apply(params, pts))
    err = float(np.abs(sdf - ref).max())
    print(f"max |native - jax| over {len(pts):,} points: {err:.2e}")
    print(f"gradient norms ~1 (geometric init): "
          f"{float(np.linalg.norm(grads, axis=1).mean()):.3f}")
    return err


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
