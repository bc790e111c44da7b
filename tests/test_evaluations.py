"""Evaluation-layer tests: metrics, reconstruction E2E, octree comparison,
normal comparison, 2D contour — all on analytic fields (CPU)."""

import os

import jax
import numpy as np
import pandas as pd
import pytest

from sdf_representation_tpu.evaluations.metrics import (
    chamfer_distance,
    sign_accuracy,
    thresholded_nmse,
)
from sdf_representation_tpu.evaluations.reconstruct import reconstruct_mesh
from sdf_representation_tpu.evaluations.compare_octree_dl import (
    compare_octree_dl,
    load_octree_nodes,
)
from sdf_representation_tpu.geometry.primitives import make_icosphere


class SphereModel:
    """Duck-typed 'model' with apply(params, x) = |x| - 0.5."""

    @staticmethod
    def apply(params, x):
        import jax.numpy as jnp

        return jnp.linalg.norm(x, axis=-1) - 0.5


def test_metrics_values():
    true = np.array([0.1, -0.2, 0.3, -0.4])
    pred = np.array([0.1, -0.2, 0.35, 0.4])
    assert sign_accuracy(pred, true) == 0.75
    nmse = thresholded_nmse(pred, true, 0.04)
    expected = (0.05**2 + 0.8**2) / np.sum(true**2)
    assert nmse == pytest.approx(expected)
    assert thresholded_nmse(true, true, 0.01) == 0.0


def test_chamfer_identity_and_offset():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 3))
    assert chamfer_distance(a, a) == 0.0
    b = a + np.array([0.1, 0, 0])
    assert chamfer_distance(a, b) <= 0.2 + 1e-9


def test_reconstruct_mesh_sphere():
    mesh = reconstruct_mesh(SphereModel.apply, {}, 48, chunk=4096)
    r = np.linalg.norm(mesh.vertices, axis=1)
    np.testing.assert_allclose(r, 0.5, atol=0.05)
    assert abs(mesh.volume - 4 / 3 * np.pi * 0.5**3) / (4 / 3 * np.pi * 0.5**3) < 0.05


def test_octree_compare_csv(tmp_path):
    pts = np.random.default_rng(0).uniform(-1, 1, (200, 3))
    sdf = np.linalg.norm(pts, axis=1) - 0.5
    csv = tmp_path / "points.csv"
    np.savetxt(csv, np.column_stack([pts, sdf]), delimiter=",")
    out = compare_octree_dl(SphereModel, {}, str(csv), str(tmp_path / "cmp.csv"))
    assert out["n_nodes"] == 200
    assert out["rmse"] < 1e-6
    assert out["sign_agreement"] == 1.0
    cmp_df = pd.read_csv(tmp_path / "cmp.csv")
    assert {"x", "y", "z", "model_sdf", "octree_sdf", "error"} <= set(cmp_df.columns)


def test_octree_compare_vtu(tmp_path):
    pts = np.random.default_rng(1).uniform(-1, 1, (50, 3))
    sdf = np.linalg.norm(pts, axis=1) - 0.5
    vtu = tmp_path / "octree.vtu"
    pts_txt = "\n".join(" ".join(f"{v:.9g}" for v in p) for p in pts)
    sdf_txt = " ".join(f"{v:.9g}" for v in sdf)
    vtu.write_text(f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid">
  <UnstructuredGrid>
    <Piece NumberOfPoints="{len(pts)}" NumberOfCells="0">
      <Points>
        <DataArray type="Float64" NumberOfComponents="3" format="ascii">
{pts_txt}
        </DataArray>
      </Points>
      <PointData>
        <DataArray type="Float64" Name="sdf" format="ascii">
{sdf_txt}
        </DataArray>
      </PointData>
    </Piece>
  </UnstructuredGrid>
</VTKFile>
""")
    loaded, scal = load_octree_nodes(str(vtu))
    np.testing.assert_allclose(loaded, pts, rtol=1e-6)
    np.testing.assert_allclose(scal, sdf, rtol=1e-6)
    out = compare_octree_dl(SphereModel, {}, str(vtu))
    assert out["rmse"] < 1e-6


def test_pvtu_multi_piece(tmp_path):
    # two vtu pieces + a pvtu referencing them
    for k in range(2):
        pts = np.full((3, 3), float(k))
        pts_txt = "\n".join(" ".join(str(v) for v in p) for p in pts)
        (tmp_path / f"piece{k}.vtu").write_text(f"""<VTKFile type="UnstructuredGrid">
<UnstructuredGrid><Piece NumberOfPoints="3">
<Points><DataArray NumberOfComponents="3" format="ascii">{pts_txt}</DataArray></Points>
</Piece></UnstructuredGrid></VTKFile>""")
    (tmp_path / "all.pvtu").write_text("""<VTKFile type="PUnstructuredGrid">
<PUnstructuredGrid>
<Piece Source="piece0.vtu"/><Piece Source="piece1.vtu"/>
</PUnstructuredGrid></VTKFile>""")
    pts, scal = load_octree_nodes(str(tmp_path / "all.pvtu"))
    assert pts.shape == (6, 3)
    assert scal is None


def test_normal_comparison(tmp_path):
    from sdf_representation_tpu.evaluations.normal_comparison import (
        compute_normal_for_model,
    )
    from sdf_representation_tpu.geometry.mesh_io import save_mesh
    from sdf_representation_tpu.models import ImplicitNet

    # coords + ground-truth mesh in the save dir
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.9, 0.9, (200, 3))
    pd.DataFrame(pts, columns=["x", "y", "z"]).to_csv(
        tmp_path / "nodes_coordinates.csv", index=False
    )
    save_mesh(make_icosphere(2, 0.5), str(tmp_path / "sphere.stl"))

    model = ImplicitNet(d_in=3, hidden_dims=(32,) * 2, skip_in=(1,), beta=100.0)
    params = model.init(jax.random.PRNGKey(0))
    out = compute_normal_for_model(model, params, str(tmp_path), plot=False)
    assert "rmse" in out and np.isfinite(out["rmse"])
    assert -1.0 <= out["cos_mean"] <= 1.0
    for f in ("computed.csv", "error_points.csv", "similarity_points.csv",
              "similarity.csv", "exact_wf.csv"):
        assert (tmp_path / f).exists(), f


def test_classification_report_matches_sklearn():
    """The analytic report must equal sklearn's on the same labels."""
    import pandas as pd
    from sklearn.metrics import classification_report as sk_report

    from sdf_representation_tpu.evaluations.metrics import (
        classification_report_frame,
        sign_confusion_counts,
    )

    rng = np.random.default_rng(0)
    true = rng.normal(size=5000)
    noisy = true + rng.normal(scale=0.5, size=5000)
    ours = classification_report_frame(noisy, true)
    sk = pd.DataFrame(
        sk_report((true < 0).astype(int), (noisy < 0).astype(int),
                  output_dict=True, zero_division=0)
    ).transpose()
    for row in ("0", "1", "macro avg", "weighted avg"):
        for col in ("precision", "recall", "f1-score", "support"):
            assert abs(ours.loc[row, col] - sk.loc[row, col]) < 1e-9, (row, col)
    cm = sign_confusion_counts(noisy, true)
    assert cm.sum() == 5000


def test_compute_grid_metrics_subsample():
    """Device-side mismatch subsampling: true counts, valid indices, and
    exact index recovery when the count fits under the cap."""
    from sdf_representation_tpu.evaluations.metrics import compute_grid_metrics

    rng = np.random.default_rng(3)
    true = rng.uniform(-1, 1, 5000).astype(np.float32)
    pred = true.copy()
    bad = rng.choice(5000, 800, replace=False)
    pred[bad] += rng.uniform(0.05, 0.5, 800).astype(np.float32) * np.sign(
        rng.normal(size=800)
    )
    gm = compute_grid_metrics(pred, true, thresholds=(0.01, 0.0001),
                              max_mismatch=100)
    err = np.abs(pred - true)
    for k, thr in enumerate((0.01, 0.0001)):
        assert gm["mismatch_counts"][k] == int(np.count_nonzero(err > thr))
        idx = gm["mismatch_indices"][k]
        assert len(idx) <= 100
        assert len(idx) > 50  # Bernoulli decimation should land near the cap
        assert np.all(err[idx] > thr)
        assert len(np.unique(idx)) == len(idx)
    assert gm["nmse_0.01"] == pytest.approx(
        thresholded_nmse(pred, true, 0.01), rel=1e-5
    )
    # cap >= count: the index set is EXACTLY the mismatch set
    gm2 = compute_grid_metrics(pred, true, thresholds=(0.01,),
                               max_mismatch=5000)
    np.testing.assert_array_equal(
        np.sort(gm2["mismatch_indices"][0]), np.nonzero(err > 0.01)[0]
    )
    assert gm2["sign_accuracy"] == sign_accuracy(pred, true)
