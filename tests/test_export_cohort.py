"""export_cohort: real-layout data dir -> serving npz -> iggcn-serve.

The full real-data deployment loop in one test: fabricate the reference
.mat layout, export the preprocessed cohort with the training loaders,
build a matching bundle, and score the exported npz through the serve
CLI's one-shot path.
"""
import os

import numpy as np
import pytest

from iggcn_tpu.tools import export_cohort
from tests.test_real_loaders import _write_mat_cohort


def test_export_matches_training_loader(tmp_path):
    base = str(tmp_path / "data") + os.sep
    _write_mat_cohort(base, np.random.default_rng(3))
    out = str(tmp_path / "cohort.npz")
    rc = export_cohort.main(["--data_path", base, "--disease_id", "0",
                             "--out", out])
    assert rc == 0
    from iggcn_tpu.config import DataConfig
    from iggcn_tpu.data.adni import load_adni874

    want = load_adni874(DataConfig(data_path=base, knn=5, disease_id=0))
    with np.load(out) as zf:
        np.testing.assert_array_equal(zf["x"], want.x.astype(np.float32))
        np.testing.assert_array_equal(zf["adj"],
                                      want.adj.astype(np.float32))
        np.testing.assert_array_equal(zf["snps"],
                                      want.snps.astype(np.float32))
        np.testing.assert_array_equal(zf["y"], want.y)


def test_export_respects_diffusion_flags(tmp_path):
    base = str(tmp_path / "data") + os.sep
    _write_mat_cohort(base, np.random.default_rng(4))
    a = str(tmp_path / "ppr.npz")
    b = str(tmp_path / "heat.npz")
    export_cohort.main(["--data_path", base, "--disease_id", "0",
                        "--out", a])
    export_cohort.main(["--data_path", base, "--disease_id", "0",
                        "--no-isPPr", "--out", b])
    with np.load(a) as za, np.load(b) as zb:
        assert not np.allclose(za["adj"], zb["adj"])   # different diffusion
        np.testing.assert_array_equal(za["x"], zb["x"])


def test_export_snps_only(tmp_path):
    d = tmp_path / "snps" / "data_AH"
    d.mkdir(parents=True)
    rng = np.random.default_rng(5)
    with open(d / "snp.csv", "w") as fh:
        fh.write("h\n")
        np.savetxt(fh, rng.integers(0, 10, (8, 54)), delimiter=",",
                   fmt="%d")
    with open(d / "dia.csv", "w") as fh:
        fh.write("h\n")
        np.savetxt(fh, rng.integers(0, 2, 8), fmt="%d")
    out = str(tmp_path / "snps.npz")
    rc = export_cohort.main(["--snps_csv_root", str(tmp_path / "snps"),
                             "--disease_id", "0", "--out", out,
                             "--no-with_labels"])
    assert rc == 0
    with np.load(out) as zf:
        assert zf["snps"].shape == (8, 54)
        assert "y" not in zf.files


def test_export_requires_a_source(tmp_path):
    with pytest.raises(SystemExit):
        export_cohort.main(["--out", str(tmp_path / "x.npz")])


def test_exported_cohort_serves_end_to_end(tmp_path):
    """Deployment loop: export real-layout data -> bundle -> serve CLI."""
    import jax

    from iggcn_tpu.config import ModelConfig
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.fused_sgcn import FusedSGCN
    from iggcn_tpu.tools import serve
    from iggcn_tpu.tools.serve import save_bundle

    base = str(tmp_path / "data") + os.sep
    _write_mat_cohort(base, np.random.default_rng(6))
    cohort_npz = str(tmp_path / "cohort.npz")
    export_cohort.main(["--data_path", base, "--disease_id", "0",
                        "--out", cohort_npz])

    # a bundle whose dims match the fixture cohort (12 ROIs, 3 feats)
    topo = synthetic_topology(np.random.default_rng(6))
    mcfg = ModelConfig(num_layers=1, hidden=4, rois=12, feat_dim=3,
                       hidden_linear=8, l_dim=8)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((4, 12, 3), np.float32),
        np.zeros((4, 12, 12), np.float32), np.zeros((4, 54), np.float32))
    bundle = str(tmp_path / "bundle.npz")
    save_bundle(bundle, model, variables["params"],
                variables["batch_stats"])

    preds = str(tmp_path / "preds.npz")
    serve.main([bundle, "--npz", cohort_npz, "--out", preds, "--batch", "8"])
    with np.load(preds) as zf, np.load(cohort_npz) as cz:
        assert zf["pred"].shape[0] == cz["x"].shape[0]
        assert np.isfinite(zf["log_probs"]).all()


def test_serve_reports_accuracy_for_labeled_cohort(tmp_path, capsys):
    """A labeled export (y kept) gets an offline evaluation line from the
    serve CLI; an unlabeled one does not."""
    import jax

    from iggcn_tpu.config import ModelConfig
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.fused_sgcn import FusedSGCN
    from iggcn_tpu.tools import serve
    from iggcn_tpu.tools.serve import save_bundle

    base = str(tmp_path / "data") + os.sep
    _write_mat_cohort(base, np.random.default_rng(7))
    labeled = str(tmp_path / "labeled.npz")
    bare = str(tmp_path / "bare.npz")
    export_cohort.main(["--data_path", base, "--disease_id", "0",
                        "--out", labeled])
    export_cohort.main(["--data_path", base, "--disease_id", "0",
                        "--no-with_labels", "--out", bare])

    topo = synthetic_topology(np.random.default_rng(7))
    mcfg = ModelConfig(num_layers=1, hidden=4, rois=12, feat_dim=3,
                       hidden_linear=8, l_dim=8)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), np.zeros((4, 12, 3), np.float32),
        np.zeros((4, 12, 12), np.float32), np.zeros((4, 54), np.float32))
    bundle = str(tmp_path / "bundle.npz")
    save_bundle(bundle, model, variables["params"],
                variables["batch_stats"])

    serve.main([bundle, "--npz", labeled,
                "--out", str(tmp_path / "p1.npz"), "--batch", "8"])
    err = capsys.readouterr().err
    assert "accuracy vs provided labels:" in err and "auc:" in err

    serve.main([bundle, "--npz", bare,
                "--out", str(tmp_path / "p2.npz"), "--batch", "8"])
    assert "accuracy vs provided labels" not in capsys.readouterr().err
