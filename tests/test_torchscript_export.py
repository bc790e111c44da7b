"""TorchScript export round-trip + parity tests (torch CPU is in the image).

Validates the save_as_libtorch-equivalent contract
(reference utils/inference_conversion.py:23-64 and the LibTorch consumer
ops/conversion_test/test_loading.cpp): exported .pt evaluates identically to
model.apply, autograd input gradients match our diffops, and the .pt
round-trips back into our params pytree exactly."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sdf_representation_tpu.export.torchscript_export import (
    eval_torchscript,
    import_torchscript,
    save_as_torchscript,
)
from sdf_representation_tpu.models import ImplicitNet
from sdf_representation_tpu.ops.diffops import sdf_and_gradient


@pytest.mark.parametrize("skip,beta", [((2,), 100.0), ((), 0.0)])
def test_torchscript_value_parity(tmp_path, skip, beta):
    model = ImplicitNet(d_in=3, hidden_dims=(64,) * 4, skip_in=skip, beta=beta)
    params = model.init(jax.random.PRNGKey(0))
    pt, in_csv, out_csv = save_as_torchscript(str(tmp_path), model, params)
    assert os.path.exists(pt)

    # fixture files agree with model.apply (the difference.csv contract:
    # reference ops/conversion_test/difference.csv diffs ~1e-7)
    pts = np.loadtxt(in_csv, delimiter=",").astype(np.float32)
    fixture_out = np.loadtxt(out_csv, delimiter=",").astype(np.float32)
    ref = np.asarray(model.apply(params, jnp.asarray(pts)))
    np.testing.assert_allclose(fixture_out.reshape(-1), ref,
                               rtol=1e-5, atol=1e-6)

    # fresh points through the saved artifact
    pts2 = np.random.default_rng(7).uniform(-1, 1, (333, 3)).astype(np.float32)
    got = eval_torchscript(pt, pts2)
    ref2 = np.asarray(model.apply(params, jnp.asarray(pts2)))
    np.testing.assert_allclose(got, ref2, rtol=1e-5, atol=1e-6)


def test_torchscript_input_gradients_match(tmp_path):
    """The DeepTrace/LibTorch consumers need autograd input gradients
    (reference test_loading.cpp:99); they must match our diffops."""
    model = ImplicitNet(d_in=3, hidden_dims=(32,) * 3, skip_in=(1,), beta=100.0)
    params = model.init(jax.random.PRNGKey(1))
    pt, _, _ = save_as_torchscript(str(tmp_path), model, params)
    pts = np.random.default_rng(8).uniform(-1, 1, (64, 3)).astype(np.float32)
    vals_t, grads_t = eval_torchscript(pt, pts, gradients=True)
    vals_j, grads_j = sdf_and_gradient(
        lambda p, x: model.apply(p, x), params, jnp.asarray(pts)
    )
    np.testing.assert_allclose(vals_t, np.asarray(vals_j), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(grads_t, np.asarray(grads_j), rtol=1e-4,
                               atol=1e-5)


def test_torchscript_roundtrip_exact(tmp_path):
    """ours -> .pt -> ours must reproduce weights bit-exactly and recover
    the architecture (hidden dims + skip positions)."""
    model = ImplicitNet(d_in=3, hidden_dims=(48,) * 4, skip_in=(2,), beta=99.0)
    params = model.init(jax.random.PRNGKey(2))
    pt, _, _ = save_as_torchscript(str(tmp_path), model, params)
    params2, hidden, skip = import_torchscript(pt)
    assert hidden == model.hidden_dims
    assert skip == model.skip_in
    for a, b in zip(params["layers"], params2["layers"]):
        np.testing.assert_array_equal(np.asarray(a["w"], np.float32), b["w"])
        np.testing.assert_array_equal(np.asarray(a["b"], np.float32), b["b"])
