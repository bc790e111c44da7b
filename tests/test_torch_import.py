"""Torch-checkpoint migration: build a reference-style torch ImplicitNet,
save its checkpoint, import, and require forward parity."""

import math
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from sdf_representation_tpu.export.torch_import import (
    import_torch_state_dict,
    infer_architecture,
    load_reference_checkpoint,
)
from sdf_representation_tpu.models import ImplicitNet


def make_torch_net(d_in=3, hidden=32, n_hidden=4, skip=(2,), beta=100.0):
    """A reference-equivalent torch ImplicitNet (skip-in, softplus-beta),
    with lin{i} attribute naming like reference networks.py:77."""

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            dims = [d_in] + [hidden] * n_hidden + [1]
            self.skip = skip
            self.n = len(dims) - 1
            for layer in range(self.n):
                out_dim = dims[layer + 1]
                if layer + 1 in skip:
                    out_dim -= d_in
                setattr(self, f"lin{layer}", torch.nn.Linear(dims[layer], out_dim))
            self.act = torch.nn.Softplus(beta=beta)

        def forward(self, x):
            inp = x
            h = x
            for layer in range(self.n):
                if layer in self.skip:
                    h = torch.cat([h, inp], dim=-1) / math.sqrt(2.0)
                h = getattr(self, f"lin{layer}")(h)
                if layer < self.n - 1:
                    h = self.act(h)
            return h

    torch.manual_seed(0)
    return Net()


def test_state_dict_import_forward_parity():
    tnet = make_torch_net()
    params = import_torch_state_dict(tnet.state_dict())
    hidden, skip = infer_architecture(params)
    assert hidden == (32,) * 4
    assert skip == (2,)
    model = ImplicitNet(d_in=3, hidden_dims=hidden, skip_in=skip, beta=100.0)

    pts = np.random.default_rng(0).uniform(-1, 1, (64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(pts)).numpy()[:, 0]
    got = np.asarray(model.apply(params, jnp.asarray(pts)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_module_prefix_stripped():
    tnet = make_torch_net(hidden=16, n_hidden=2, skip=())
    sd = {f"module.{k}": v for k, v in tnet.state_dict().items()}
    params = import_torch_state_dict(sd)
    assert len(params["layers"]) == 3


def test_load_reference_checkpoint(tmp_path):
    """Round-trip through the reference's pickle checkpoint format
    (executor.py:237-257)."""
    tnet = make_torch_net(hidden=16, n_hidden=2, skip=(1,))
    ckpt = {
        "epoch": 123,
        "model_state_dict": tnet.state_dict(),
        "optimizer_state_dict": {},
        "loss": [0.5, 0.4],
        "val_loss": [0.6, 0.5],
    }
    p = tmp_path / "best_model.pkl"
    torch.save(ckpt, str(p))
    params, epoch = load_reference_checkpoint(str(p))
    assert epoch == 123
    hidden, skip = infer_architecture(params)
    model = ImplicitNet(d_in=3, hidden_dims=hidden, skip_in=skip, beta=100.0)
    pts = np.random.default_rng(1).uniform(-1, 1, (32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(pts)).numpy()[:, 0]
    got = np.asarray(model.apply(params, jnp.asarray(pts)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_bad_state_dict_raises():
    with pytest.raises(ValueError, match="No lin"):
        import_torch_state_dict({"foo.weight": np.zeros((2, 2))})
