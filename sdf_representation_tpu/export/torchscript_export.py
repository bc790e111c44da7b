"""TorchScript export — serve models to the reference's LibTorch consumers.

Role of the reference's ``save_as_libtorch``
(reference utils/inference_conversion.py:23-64: rebuild
``ImplicitNetCompatible``, remap ``lin{i}`` -> ``layers.{i}`` keys,
``torch.jit.script(...).save("implicit_model.pt")``, write random
input.csv/output.csv parity fixtures). A user with the reference's C++
harnesses (ops/conversion_test/test_loading.cpp:18 loads the .pt and
computes input gradients) can consume models trained in this framework.

The torch module here is a scriptable re-statement of ImplicitNet semantics
(skip concat / sqrt(2), Softplus(beta) or ReLU+tanh — reference
model/networks.py:114-179); weights transpose from our (in, out) layout to
torch Linear's (out, in). Round-trip (ours -> .pt -> ours) is regression-
tested via export/torch_import.py.
"""

# NOTE: no `from __future__ import annotations` here — it stringifies the
# class-body annotation TorchScript needs to resolve (`skip_in: list[int]`).
import math
import os
from typing import List, Tuple

import numpy as np


def _build_torch_module(model, params):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F  # noqa: N812 (resolved by the scripter)

    class ImplicitNetCompatibleTorch(nn.Module):
        """Scriptable twin of reference ImplicitNetCompatible
        (model/networks.py:114-179)."""

        # class-level annotation: TorchScript cannot infer the element type
        # of an EMPTY list (no-skip models); this torch build resolves the
        # builtin generic, not typing.List
        skip_in: list[int]

        def __init__(self, shapes: List[Tuple[int, int]], skip_in: List[int],
                     beta: float):
            super().__init__()
            self.layers = nn.ModuleList(
                [nn.Linear(fi, fo) for fi, fo in shapes]
            )
            self.skip_in = list(skip_in)
            self.beta: float = float(beta)
            self.n_lin: int = len(shapes)
            self.inv_sqrt2: float = 1.0 / math.sqrt(2.0)

        def forward(self, x):
            inp = x
            h = x
            i = 0
            for lin in self.layers:
                if i in self.skip_in:
                    h = torch.cat([h, inp], dim=-1) * self.inv_sqrt2
                h = lin(h)
                if i < self.n_lin - 1:
                    if self.beta > 0.0:
                        h = F.softplus(h * self.beta) / self.beta
                    else:
                        h = F.relu(h)
                elif self.beta <= 0.0:
                    h = torch.tanh(h)
                i = i + 1
            return h

    if hasattr(model, "export_params"):
        params = model.export_params(params)
    shapes = [tuple(int(d) for d in l["w"].shape) for l in params["layers"]]
    net = ImplicitNetCompatibleTorch(shapes, list(model.skip_in), model.beta)
    with torch.no_grad():
        for lin, layer in zip(net.layers, params["layers"]):
            w = np.asarray(layer["w"], np.float32)
            b = np.asarray(layer["b"], np.float32)
            lin.weight.copy_(torch.from_numpy(w.T.copy()))  # ours (in,out)
            lin.bias.copy_(torch.from_numpy(b.copy()))
    net.eval()
    return net


def save_as_torchscript(
    out_dir: str,
    model,
    params,
    n_fixture: int = 100,
    seed: int = 0,
) -> Tuple[str, str, str]:
    """Export implicit_model.pt + input.csv/output.csv parity fixtures
    (fixture convention of reference inference_conversion.py:56-64).

    Returns (pt_path, input_csv_path, output_csv_path)."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    net = _build_torch_module(model, params)
    scripted = torch.jit.script(net)
    pt_path = os.path.join(out_dir, "implicit_model.pt")
    scripted.save(pt_path)

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.0, 1.0, (n_fixture, model.d_in)).astype(np.float32)
    with torch.no_grad():
        out = scripted(torch.from_numpy(pts)).numpy()
    in_path = os.path.join(out_dir, "input.csv")
    out_path = os.path.join(out_dir, "output.csv")
    np.savetxt(in_path, pts, delimiter=",", fmt="%.8g")
    np.savetxt(out_path, out, delimiter=",", fmt="%.8g")
    return pt_path, in_path, out_path


def eval_torchscript(pt_path: str, points: np.ndarray,
                     gradients: bool = False):
    """Load implicit_model.pt and evaluate (the role of the reference C++
    harness ops/conversion_test/test_loading.cpp — SDF values and, when
    ``gradients``, autograd input gradients)."""
    import torch

    scripted = torch.jit.load(pt_path)
    x = torch.from_numpy(np.asarray(points, np.float32))
    if not gradients:
        with torch.no_grad():
            return scripted(x).numpy().reshape(len(points))
    x.requires_grad_(True)
    y = scripted(x)
    (grad,) = torch.autograd.grad(y.sum(), x)
    return y.detach().numpy().reshape(len(points)), grad.numpy()


def import_torchscript(pt_path: str):
    """Round-trip: load a .pt (ours or the reference's) back into a params
    pytree + inferred architecture."""
    import torch

    from .torch_import import import_torch_state_dict, infer_architecture

    scripted = torch.jit.load(pt_path)
    params = import_torch_state_dict(dict(scripted.state_dict()))
    hidden, skip = infer_architecture(params)
    return params, hidden, skip
