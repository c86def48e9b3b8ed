"""Real-file-format loader tests: a tiny .mat cohort written with scipy.io
through `load_adni874`, and a CSV/mat task cohort through `load_adni_csv`,
each driven through a short CV run. Pins the exact mat key names and shapes
(`data/adni.py:147-266`, parity `sgcn_data.py:62-111,113-292`)."""
import os

import numpy as np
import pytest
import scipy.io as sio

from iggcn_tpu.config import DataConfig, LossWeights, ModelConfig, TrainConfig
from iggcn_tpu.data.adni import load_adni874, load_adni_csv

S, N, D, SNPS = 24, 12, 3, 54


def _write_mat_cohort(base, rng, s=S, n=N, d=D, num_snps=SNPS):
    """Fabricate the reference .mat layout under <base>/knn/5/.
    Dims are parameterizable: the CLI integration test
    (`test_cli_real_data.py`) needs the reference's hardcoded 90 ROIs."""
    kdir = os.path.join(base, "knn", "5")
    os.makedirs(os.path.join(kdir, "center_2"), exist_ok=True)
    sio.savemat(os.path.join(kdir, "sbjID_int.mat"),
                {"sbjID_int": np.arange(s).reshape(-1, 1)})
    scores = rng.normal(size=(s, 9))
    scores[2, 5] = np.nan   # demographics carry NaNs pre-imputation
    sio.savemat(os.path.join(kdir, "score_excel_val_adni874.mat"),
                {"info_score_val_subs": scores})
    sio.savemat(os.path.join(kdir, "score_excel_val_adni874_fill.mat"),
                {"info_score_val_fill": rng.normal(size=(s, 9))})
    np.save(os.path.join(kdir, "center_2", "clusters_pred_label.npy"),
            rng.integers(0, 2, s))
    np.save(os.path.join(kdir, "pet_for_similarity.npy"),
            rng.normal(size=(s, 8)).astype(np.float32))
    sio.savemat(os.path.join(kdir, "SNPS_data.mat"),
                {"SNPS_data": rng.random((s, num_snps))})
    # raw labels 1..5 in the mat; loader subtracts 1 -> {HC..AD}
    labels = np.array([1, 5] * (s // 2)).reshape(-1, 1)
    sio.savemat(os.path.join(kdir, "BL_DXGrp_label.mat"),
                {"BL_DXGrp_label": labels})
    corr = np.abs(rng.normal(size=(s, n, n))) + 0.1
    sio.savemat(os.path.join(kdir, "corr_data.mat"), {"corr_data": corr})
    img = rng.normal(size=(s, n, d))
    img[0, 0, 0] = np.nan   # loader zero-fills NaNs
    sio.savemat(os.path.join(kdir, "imgData_mat_normalized_fix.mat"),
                {"imgData_mat_normalized": img})
    return corr


@pytest.fixture(scope="module")
def mat_cohort(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("adnimat")) + "/"
    rng = np.random.default_rng(0)
    corr = _write_mat_cohort(base, rng)
    cfg = DataConfig(data_path=base, knn=5, disease_id=0)
    return load_adni874(cfg), corr


def test_load_adni874_shapes(mat_cohort):
    cohort, corr = mat_cohort
    assert len(cohort) == S            # disease_id 0 selects HC+AD = all here
    assert cohort.x.shape == (S, N, D)
    assert cohort.adj.shape == (S, N, N)
    assert cohort.snps.shape == (S, SNPS)
    assert cohort.clini_score.shape == (S, 3)   # tau/adas13/mmse selection
    assert cohort.demographics.shape == (S, 9)
    assert set(cohort.y.tolist()) == {0, 1}
    assert np.isfinite(cohort.x).all(), "NaN image values must be zero-filled"
    np.testing.assert_array_equal(cohort.raw_adj,
                                  corr.astype(np.float32))
    # diffusion ran: column-stochastic top-k adjacency
    np.testing.assert_allclose(cohort.adj.sum(axis=1), 1.0, atol=1e-5)
    assert np.isnan(cohort.demographics[2, 5]), \
        "raw demographics keep NaNs for per-fold imputation"


def test_load_adni874_through_cv(mat_cohort):
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.train.cv import cross_validation
    cohort, _ = mat_cohort
    topo = synthetic_topology(np.random.default_rng(1))
    res = cross_validation(
        cohort, topo,
        ModelConfig(num_layers=1, hidden=4, hidden_linear=8, l_dim=8,
                    rois=N, feat_dim=D),
        TrainConfig(epochs=2, batch_size=8, folds=3, seed=0,
                    loss=LossWeights(disease=1.0)),
        res_dir=None, verbose=False)
    assert np.isfinite(res.mean_test_loss)
    assert res.score_result.shape == (3, 2, 5)


def test_load_adni874_multi_fusion(tmp_path):
    """Multi-fusion mode: three per-modality correlation matrices become one
    block-diagonal 3N-node graph with the imaging channels flattened to one
    (parity `sgcn_data.py:221-281`)."""
    base = str(tmp_path) + "/"
    rng = np.random.default_rng(5)
    _write_mat_cohort(base, rng)
    mods = {}
    for mod in ("MRI", "FDG-PET", "AV45-PET"):
        mdir = os.path.join(base, mod, "knn", "5")
        os.makedirs(mdir)
        m = np.abs(rng.normal(size=(S, N, N))) + 0.1
        sio.savemat(os.path.join(mdir, "corr_data.mat"), {"corr_data": m})
        mods[mod] = m
    cfg = DataConfig(data_path=base, knn=5, disease_id=0,
                     is_multi_fusion=True)
    cohort = load_adni874(cfg)
    assert cohort.x.shape == (S, 3 * N, 1)
    assert cohort.raw_adj.shape == (S, 3 * N, 3 * N)
    for k, mod in enumerate(("MRI", "FDG-PET", "AV45-PET")):
        blk = cohort.raw_adj[:, k * N:(k + 1) * N, k * N:(k + 1) * N]
        np.testing.assert_allclose(blk, mods[mod].astype(np.float32),
                                   rtol=1e-6)
    # off-diagonal blocks stay zero (modalities are not cross-wired)
    assert cohort.raw_adj[:, :N, N:2 * N].sum() == 0


def test_load_adni_csv(tmp_path):
    rng = np.random.default_rng(2)
    base = tmp_path / "data_AH"         # disease_id 0 task directory
    kdir = base / "knn" / "5"
    kdir.mkdir(parents=True)
    header = ",".join(f"snp{i}" for i in range(SNPS))
    rows = rng.random((S, SNPS))
    rows[1, 3] = np.nan
    np.savetxt(base / "snp.csv", rows, delimiter=",", header=header,
               comments="")
    sio.savemat(str(kdir / "BL_DXGrp_label.mat"),
                {"BL_DXGrp_label": np.array([0, 1] * (S // 2)).reshape(-1, 1)})
    corr = np.abs(rng.normal(size=(S, N, N))) + 0.1
    sio.savemat(str(kdir / "corr_data.mat"), {"corr_data": corr})
    sio.savemat(str(kdir / "imgData_mat_normalized_fix.mat"),
                {"imgData_mat_normalized": rng.normal(size=(S, N, D))})
    cfg = DataConfig(data_path=str(tmp_path), knn=5, disease_id=0)
    cohort = load_adni_csv(cfg)
    assert cohort.x.shape == (S, N, D)
    assert cohort.snps.shape == (S, SNPS)
    assert np.isfinite(cohort.snps).all()       # NaN -> 0 before scaling
    assert cohort.snps.min() >= 0 and cohort.snps.max() <= 1
    assert set(cohort.y.tolist()) == {0, 1}
    assert cohort.num_classes == 2


def test_load_snps_csv(tmp_path):
    """Standalone SNP csv cohort (parity snps_graph.py:295-331 SnpsDataset):
    header row skipped, /10 scaling, disease-id folder mapping."""
    import pytest

    from iggcn_tpu.data.snps import load_snps_csv

    base = tmp_path / "data_AH"
    base.mkdir()
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 3, size=(12, 5)).astype(float)
    lab = rng.integers(0, 2, size=12).astype(float)
    header = ",".join(f"rs{i}" for i in range(5))
    (base / "snp.csv").write_text(
        header + "\n" + "\n".join(",".join(map(str, r)) for r in raw) + "\n")
    (base / "dia.csv").write_text(
        "dia\n" + "\n".join(str(v) for v in lab) + "\n")
    x, y = load_snps_csv(str(tmp_path), disease_id=0)
    assert x.shape == (12, 5) and y.shape == (12,)
    np.testing.assert_allclose(x, raw / 10.0, rtol=1e-6)
    np.testing.assert_array_equal(y, lab)
    with pytest.raises(FileNotFoundError):
        load_snps_csv(str(tmp_path), disease_id=1)  # data_MH absent

    # end-to-end through the SNP trainer (the CLI route's consumer)
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.train.snps_trainer import cross_validation_snps
    topo = synthetic_topology(np.random.default_rng(1))
    # trainer expects the reference's 54-SNP width for the GO incidence
    x54 = np.tile(x, (1, 11))[:, :54].astype(np.float32)
    res = cross_validation_snps(x54, y, topo, folds=3, epochs=1,
                                batch_size=4, model_kind="go")
    assert np.isfinite(res.mean_loss)


def test_load_adni874_without_trailing_slash(tmp_path):
    """Path assembly must tolerate a --data_path with no trailing slash
    (string concatenation used to mangle it into <path>knn/5/)."""
    base = str(tmp_path / "pre")          # no trailing separator
    os.makedirs(base)
    _write_mat_cohort(base + os.sep, np.random.default_rng(2))
    cohort = load_adni874(DataConfig(data_path=base, knn=5, disease_id=0))
    assert len(cohort) == S
