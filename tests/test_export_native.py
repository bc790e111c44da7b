"""Export formats + C++ native runtime parity (the reference's
conversion_test pattern: export -> independent runtime -> elementwise diff,
cf. reference ops/conversion_test/difference.csv ~1e-7)."""

import os
import subprocess

import jax
import numpy as np
import pytest

from sdf_representation_tpu.export import (
    load_sdfw,
    save_as_onnx,
    save_for_native,
    save_sdfw,
    write_parity_fixtures,
)
from sdf_representation_tpu.models import ImplicitNet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def model_and_params():
    model = ImplicitNet(d_in=3, hidden_dims=(64,) * 4, skip_in=(2,), beta=100.0)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_sdfw_roundtrip(tmp_path, model_and_params):
    model, params = model_and_params
    p = str(tmp_path / "m.sdfw")
    save_sdfw(p, model, params)
    arch, loaded = load_sdfw(p)
    assert arch["d_in"] == 3
    assert arch["hidden_dims"] == [64] * 4
    assert arch["skip_in"] == [2]
    assert arch["beta"] == 100.0
    for orig, got in zip(params["layers"], loaded["layers"]):
        np.testing.assert_allclose(np.asarray(orig["w"], np.float32), got["w"])
        np.testing.assert_allclose(np.asarray(orig["b"], np.float32), got["b"])


def test_onnx_structure(tmp_path, model_and_params):
    """Decode our own protobuf output and validate the ModelProto shape."""
    from sdf_representation_tpu.export import protobuf_min as pb

    model, params = model_and_params
    p = str(tmp_path / "m.onnx")
    save_as_onnx(p, model, params)
    data = open(p, "rb").read()
    top = pb.decode(data)
    ir = pb.fields(top, 1)
    assert ir and ir[0] == 8
    graphs = pb.fields(top, 7)
    assert len(graphs) == 1
    g = pb.decode(graphs[0])
    nodes = [pb.decode(n) for n in pb.fields(g, 1)]
    op_types = [pb.fields(n, 4)[0].decode() for n in nodes]
    assert op_types.count("Gemm") == 5  # 5 linear layers
    assert op_types.count("Concat") == 1
    assert op_types.count("Softplus") == 4
    inits = pb.fields(g, 5)
    names = []
    for t in inits:
        names.append(pb.fields(pb.decode(t), 8)[0].decode())
    assert "W0" in names and "B4" in names
    # opset import present
    opsets = pb.fields(top, 8)
    assert pb.fields(pb.decode(opsets[0]), 2)[0] == 15


# native_build fixture lives in conftest.py (shared with test_marching's
# wire-decode parity test)


def test_native_parity(tmp_path, model_and_params, native_build):
    """C++ forward AND analytic input gradients match JAX to f32 precision."""
    model, params = model_and_params
    out = str(tmp_path)
    save_for_native(out, model, params, onnx=False)
    fixtures = write_parity_fixtures(out, model, params, n_points=128)

    cpp_out = os.path.join(out, "cpp_output.csv")
    cpp_grad = os.path.join(out, "cpp_gradient.csv")
    subprocess.run(
        [
            os.path.join(native_build, "parity_main"),
            os.path.join(out, "model.sdfw"),
            fixtures["input"], cpp_out, cpp_grad,
        ],
        check=True, capture_output=True,
    )
    ref_out = np.loadtxt(fixtures["output"], delimiter=",")
    got_out = np.loadtxt(cpp_out, delimiter=",")
    np.testing.assert_allclose(got_out, ref_out, rtol=1e-4, atol=1e-5)

    ref_grad = np.loadtxt(fixtures["gradient"], delimiter=",")
    got_grad = np.loadtxt(cpp_grad, delimiter=",")
    np.testing.assert_allclose(got_grad, ref_grad, rtol=1e-3, atol=1e-4)


def test_native_parity_relu_mode(tmp_path, native_build):
    model = ImplicitNet(
        d_in=3, hidden_dims=(32,) * 3, skip_in=(), beta=0.0, geometric_init=False
    )
    params = model.init(jax.random.PRNGKey(1))
    out = str(tmp_path)
    save_for_native(out, model, params, onnx=False)
    fixtures = write_parity_fixtures(out, model, params, n_points=64)
    cpp_out = os.path.join(out, "o.csv")
    cpp_grad = os.path.join(out, "g.csv")
    subprocess.run(
        [os.path.join(native_build, "parity_main"),
         os.path.join(out, "model.sdfw"), fixtures["input"], cpp_out, cpp_grad],
        check=True, capture_output=True,
    )
    np.testing.assert_allclose(
        np.loadtxt(cpp_out, delimiter=","),
        np.loadtxt(fixtures["output"], delimiter=","),
        rtol=1e-4, atol=1e-5,
    )


def test_deeptrace_octree(tmp_path, model_and_params, native_build):
    """The octree engine refines around the learned surface (config.txt format
    of the reference sample, ops/DeepTrace/sample_inputs/config.txt) —
    consuming model.onnx DIRECTLY like the reference's ORT bridge
    (reference ops/DeepTrace/src/deeptrace.cpp:30-71)."""
    model, params = model_and_params
    out = str(tmp_path)
    save_for_native(out, model, params, onnx=True)
    cfg = tmp_path / "config.txt"
    cfg.write_text(
        """#################### Refinement setting ####################
refine_lvl_uni = 2
refine_lvl_bd = 4
cubeDomainMin = [-1.0, -1.0, -1.0]
cubeDomainMax = [1.0, 1.0, 1.0]
ModelFileName = \"%s/model.onnx\"
useDeepLearning = true
""" % out
    )
    res = subprocess.run(
        [os.path.join(native_build, "deeptrace"), str(cfg), out],
        check=True, capture_output=True, text=True,
    )
    assert "leaf cells" in res.stdout
    cells = np.loadtxt(os.path.join(out, "cells.csv"), delimiter=",")
    points = np.loadtxt(os.path.join(out, "points.csv"), delimiter=",")
    assert len(cells) == len(points)
    # boundary cells exist and refine deeper than non-boundary average
    boundary = cells[:, 5] > 0.5
    assert boundary.sum() > 0
    assert cells[boundary][:, 4].max() == 4
    # geometric-init net ~ sphere of radius ~1: near-surface points have small |S|
    near = points[boundary]
    assert np.abs(near[:, 3]).mean() < np.abs(points[~boundary][:, 3]).mean()


def test_deeptrace_disabled(tmp_path, native_build):
    cfg = tmp_path / "c.txt"
    cfg.write_text("useDeepLearning = false\n")
    res = subprocess.run(
        [os.path.join(native_build, "deeptrace"), str(cfg)],
        capture_output=True, text=True,
    )
    assert res.returncode == 0
    assert "nothing to do" in res.stderr


def test_export_cli(tmp_path):
    """python -m sdf_representation_tpu.export drives checkpoint -> files."""
    import subprocess, sys

    from tests.test_trainer import sphere_dataset, tiny_config
    from sdf_representation_tpu.training import Trainer

    cfg = tiny_config(tmp_path, epochs=2)
    Trainer(cfg).train(dataset=sphere_dataset(1500))
    out = tmp_path / "exported"
    r = subprocess.run(
        [sys.executable, "-m", "sdf_representation_tpu.export",
         str(tmp_path / "c.ini"), str(out), "--quantize", "--fixtures", "8"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-500:]
    for f in ("model.sdfw", "model.onnx", "model_int8.sdfw", "input.csv",
              "output.csv", "gradient.csv"):
        assert (out / f).exists(), f


def test_native_parity_lipschitz(tmp_path, native_build):
    """Exports of the Lipschitz variant bake the row scaling: the C++
    runtime (which knows only plain {w,b} layers) must match the Lipschitz
    forward to f32 precision."""
    import jax.numpy as jnp

    model = ImplicitNet(d_in=3, hidden_dims=(48,) * 3, skip_in=(2,),
                        beta=100.0, lipschitz=True)
    params = model.init(jax.random.PRNGKey(3))
    # non-trivial scaling on every layer
    params["layers"] = [
        {**l, "c": jnp.asarray(0.8)} for l in params["layers"]
    ]
    out = str(tmp_path)
    save_for_native(out, model, params, onnx=False)
    fixtures = write_parity_fixtures(out, model, params, n_points=64)
    cpp_out = os.path.join(out, "cpp_output.csv")
    cpp_grad = os.path.join(out, "cpp_gradient.csv")
    subprocess.run(
        [
            os.path.join(native_build, "parity_main"),
            os.path.join(out, "model.sdfw"),
            fixtures["input"], cpp_out, cpp_grad,
        ],
        check=True, capture_output=True,
    )
    ref_out = np.loadtxt(fixtures["output"], delimiter=",")
    got_out = np.loadtxt(cpp_out, delimiter=",")
    np.testing.assert_allclose(got_out, ref_out, rtol=1e-4, atol=1e-5)


def test_deeptrace_onnx_matches_sdfw(tmp_path, model_and_params, native_build):
    """The native ONNX wire reader (onnx_net.hpp) and the optimized .sdfw
    runtime must produce the same octree and f32-eps-equal SDF + analytic
    gradients for the same checkpoint — closing the reference's model.onnx
    artifact contract end-to-end in this image."""
    model, params = model_and_params
    out = str(tmp_path)
    save_for_native(out, model, params, onnx=True)
    results = {}
    for kind in ("onnx", "sdfw"):
        sub = tmp_path / kind
        sub.mkdir()
        cfg = sub / "config.txt"
        cfg.write_text(
            f"refine_lvl_uni = 2\nrefine_lvl_bd = 4\n"
            f"cubeDomainMin = [-1.0, -1.0, -1.0]\n"
            f"cubeDomainMax = [1.0, 1.0, 1.0]\n"
            f'ModelFileName = "{out}/model.{kind}"\n'
            f"useDeepLearning = true\n"
        )
        subprocess.run(
            [os.path.join(native_build, "deeptrace"), str(cfg), str(sub)],
            check=True, capture_output=True,
        )
        results[kind] = (
            np.loadtxt(sub / "cells.csv", delimiter=","),
            np.loadtxt(sub / "points.csv", delimiter=","),
        )
    cells_o, pts_o = results["onnx"]
    cells_s, pts_s = results["sdfw"]
    assert cells_o.shape == cells_s.shape  # identical refinement decisions
    np.testing.assert_array_equal(cells_o[:, :5], cells_s[:, :5])
    # SDF values and analytic gradients agree to f32 eps across runtimes
    np.testing.assert_allclose(pts_o[:, 3], pts_s[:, 3], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(pts_o[:, 4:], pts_s[:, 4:], rtol=1e-4,
                               atol=1e-5)


def test_deeptrace_onnx_relu_tanh_mode(tmp_path, native_build):
    """ONNX consumption of the ReLU+Tanh variant (beta=0) — exercises the
    Relu and Tanh interpreter ops end to end."""
    model = ImplicitNet(
        d_in=3, hidden_dims=(32,) * 3, skip_in=(), beta=0.0,
        geometric_init=False,
    )
    params = model.init(jax.random.PRNGKey(1))
    out = str(tmp_path)
    save_for_native(out, model, params, onnx=True)
    fixtures = write_parity_fixtures(out, model, params, n_points=64)
    cfg = tmp_path / "config.txt"
    cfg.write_text(
        f"refine_lvl_uni = 1\nrefine_lvl_bd = 3\n"
        f'ModelFileName = "{out}/model.onnx"\nuseDeepLearning = true\n'
    )
    subprocess.run(
        [os.path.join(native_build, "deeptrace"), str(cfg), out],
        check=True, capture_output=True,
    )
    pts = np.loadtxt(os.path.join(out, "points.csv"), delimiter=",")
    # spot-check interpreter values against JAX at the leaf centers
    ref = np.asarray(model.apply(params, pts[:, :3].astype(np.float32)))
    np.testing.assert_allclose(pts[:, 3], ref, rtol=1e-4, atol=1e-5)


def test_c_abi_shared_library(tmp_path, model_and_params, native_build):
    """libsdfnet_c.so: the C ABI embedding surface (the reference's
    LibTorch-linking consumer role, reference ops/conversion_test/main.cpp)
    loads BOTH model formats through ctypes and matches JAX to f32 eps."""
    import ctypes

    lib_path = os.path.join(native_build, "libsdfnet_c.so")
    if not os.path.exists(lib_path):
        pytest.skip("shared library not built")
    lib = ctypes.CDLL(lib_path)
    lib.sdfnet_load.restype = ctypes.c_void_p
    lib.sdfnet_load.argtypes = [ctypes.c_char_p]
    lib.sdfnet_last_error.restype = ctypes.c_char_p
    lib.sdfnet_d_in.argtypes = [ctypes.c_void_p]
    lib.sdfnet_evaluate.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.sdfnet_free.argtypes = [ctypes.c_void_p]

    model, params = model_and_params
    out = str(tmp_path)
    save_for_native(out, model, params, onnx=True)

    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (257, 3)).astype(np.float32)
    ref = np.asarray(model.apply(params, pts))
    gfun = jax.vmap(jax.grad(lambda x: model.apply(params, x[None])[0]))
    ref_g = np.asarray(gfun(pts))

    fptr = ctypes.POINTER(ctypes.c_float)
    for name in ("model.sdfw", "model.onnx"):
        h = lib.sdfnet_load(os.path.join(out, name).encode())
        assert h, lib.sdfnet_last_error().decode()
        assert lib.sdfnet_d_in(h) == 3
        vals = np.empty(len(pts), np.float32)
        grads = np.empty((len(pts), 3), np.float32)
        rc = lib.sdfnet_evaluate(
            h, pts.ctypes.data_as(fptr), len(pts),
            vals.ctypes.data_as(fptr), grads.ctypes.data_as(fptr), 2,
        )
        assert rc == 0, lib.sdfnet_last_error().decode()
        np.testing.assert_allclose(vals, ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(grads, ref_g, rtol=1e-3, atol=1e-4)
        lib.sdfnet_free(h)

    # error path: missing file -> NULL handle + message
    assert not lib.sdfnet_load(b"/nonexistent/x.sdfw")
    assert b"cannot open" in lib.sdfnet_last_error()


def test_native_runtime_python_wrapper(tmp_path, model_and_params,
                                       native_build):
    """export.NativeSDF: the zero-build-step Python consumer of the C ABI."""
    from sdf_representation_tpu.export import NativeSDF

    lib_path = os.path.join(native_build, "libsdfnet_c.so")
    model, params = model_and_params
    out = str(tmp_path)
    save_for_native(out, model, params, onnx=False)
    rng = np.random.default_rng(5)
    pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    ref = np.asarray(model.apply(params, pts))
    with NativeSDF(os.path.join(out, "model.sdfw"),
                   lib_path=lib_path) as net:
        assert net.d_in == 3
        vals, grads = net.evaluate(pts, gradients=True)
        np.testing.assert_allclose(vals, ref, rtol=1e-4, atol=1e-5)
        assert grads.shape == (100, 3)
        np.testing.assert_allclose(net(pts), vals)
        with pytest.raises(ValueError, match="expected"):
            net.evaluate(pts[:, :2])
    with pytest.raises(FileNotFoundError, match="not built"):
        NativeSDF("x.sdfw", lib_path="/nonexistent/lib.so")


def test_c_abi_reads_proto3_packed_onnx(tmp_path, model_and_params,
                                        native_build):
    """External serializers (proto3: packed TensorProto.dims, float_data
    instead of raw_data) must parse identically — regression: packed dims
    were silently dropped, mis-typing weight tensors as scalars."""
    import ctypes
    import struct

    from sdf_representation_tpu.export import protobuf_min as pb

    model, params = model_and_params
    out = str(tmp_path)
    save_for_native(out, model, params, onnx=True)
    src = open(os.path.join(out, "model.onnx"), "rb").read()

    def reencode_tensor(tbuf):
        dims, dtype, name, raw = [], 1, b"", b""
        for f, w, v in pb.decode(tbuf):
            if f == 1 and w == 0:
                dims.append(v)
            elif f == 2 and w == 0:
                dtype = v
            elif f == 8 and w == 2:
                name = v
            elif f == 9 and w == 2:
                raw = v
        floats = struct.unpack(f"<{len(raw) // 4}f", raw)
        return (pb.f_packed_varints(1, dims) + pb.f_varint(2, dtype)
                + pb.f_packed_floats(4, floats)
                + pb.f_bytes(8, name))

    def reencode(buf, transform_graph):
        outb = b""
        for f, w, v in pb.decode(buf):
            if w == 0:
                outb += pb.f_varint(f, v)
            elif w == 2:
                if transform_graph and f == 7:  # ModelProto.graph
                    outb += pb.f_message(f, reencode(v, False))
                elif not transform_graph and f == 5:  # initializer
                    outb += pb.f_message(f, reencode_tensor(v))
                else:
                    outb += pb.f_bytes(f, v)
            elif w == 5:
                outb += pb.f_float(f, v)
            else:
                raise AssertionError(f"wire {w}")
        return outb

    packed_path = os.path.join(out, "model_packed.onnx")
    open(packed_path, "wb").write(reencode(src, True))

    lib = ctypes.CDLL(os.path.join(native_build, "libsdfnet_c.so"))
    lib.sdfnet_load.restype = ctypes.c_void_p
    lib.sdfnet_load.argtypes = [ctypes.c_char_p]
    lib.sdfnet_last_error.restype = ctypes.c_char_p
    lib.sdfnet_evaluate.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.sdfnet_free.argtypes = [ctypes.c_void_p]
    h = lib.sdfnet_load(packed_path.encode())
    assert h, lib.sdfnet_last_error().decode()
    pts = np.random.default_rng(7).uniform(-1, 1, (64, 3)).astype(np.float32)
    vals = np.empty(64, np.float32)
    fptr = ctypes.POINTER(ctypes.c_float)
    rc = lib.sdfnet_evaluate(h, pts.ctypes.data_as(fptr), 64,
                             vals.ctypes.data_as(fptr), None, 1)
    assert rc == 0, lib.sdfnet_last_error().decode()
    ref = np.asarray(model.apply(params, pts))
    np.testing.assert_allclose(vals, ref, rtol=1e-4, atol=1e-5)
    lib.sdfnet_free(h)
