"""Seed-replication batch (`--cv_seeds`, `cross_validation_seed_batch`).

The replication check — rerun the SAME experiment across N CV seeds on one
fixed cohort — costs the reference N full processes. Here each seed changes
only the stratified splits, per-fold imputation, parameter inits and epoch
shuffling; StratifiedKFold's per-fold-index sizes depend only on the label
multiset and k, so all seeds x folds entries share shapes and one device
cohort and train as ONE `fold_mesh(S*k)` program. These tests pin the
load-bearing contract: every per-seed output is IDENTICAL to a standalone
fold-parallel run with that `tcfg.seed` on the same cohort.
"""
import dataclasses
import glob
import os

import numpy as np
import pytest

import main as cli
from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
from iggcn_tpu.train.cv import (cross_validation,
                                cross_validation_seed_batch)

SEEDS = (3, 7)
FOLDS = 3


def _assert_records_match(path_a, path_b):
    """Same tolerance story as the permutation batch: bitwise on one
    device; ~1-ulp float reduction-order drift when fold_mesh(S*k) and
    fold_mesh(k) factorize (fold, data) differently on a multi-device
    mesh."""
    with np.load(path_a) as za, np.load(path_b) as zb:
        assert set(za.files) == set(zb.files)
        for k in za.files:
            va, vb = np.asarray(za[k]), np.asarray(zb[k])
            if va.dtype.kind in "fc":
                np.testing.assert_allclose(va, vb, rtol=1e-6, atol=1e-6,
                                           err_msg=f"{path_a}:{k}")
            else:
                assert np.array_equal(va, vb), (path_a, k)


def _tcfg(**over):
    base = dict(epochs=2, batch_size=8, folds=FOLDS, seed=0,
                fold_parallel=True,
                loss=LossWeights(disease=1.0, regr=1.0, prob=0.5,
                                 reco=1.5e-6, simi=0.1))
    base.update(over)
    return TrainConfig(**base)


def test_seed_batch_matches_per_seed_fold_parallel(cohort, topo, tmp_path):
    """One seeds x folds SPMD program == per-seed standalone fold-parallel
    runs with tcfg.seed = s on the same cohort: fold records bit-identical,
    aggregates equal, full artifact set (not a permutation run)."""
    mcfg = ModelConfig(num_layers=1, hidden=4, hidden_linear=8, l_dim=8)
    tcfg = _tcfg()

    bdirs = [str(tmp_path / f"b{s}") for s in SEEDS]
    for d in bdirs:
        os.makedirs(d)
    res_batch = cross_validation_seed_batch(
        cohort, SEEDS, topo, mcfg, tcfg, res_dirs=bdirs,
        result_file_name="r", verbose=False)

    for s, bdir, rb in zip(SEEDS, bdirs, res_batch):
        sdir = str(tmp_path / f"s{s}")
        os.makedirs(sdir)
        rs = cross_validation(cohort, topo, mcfg,
                              dataclasses.replace(tcfg, seed=s),
                              res_dir=sdir, result_file_name="r",
                              verbose=False)
        np.testing.assert_allclose(rb.best_acc, rs.best_acc,
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(rb.mean_test_loss, rs.mean_test_loss,
                                   rtol=1e-6)
        np.testing.assert_allclose(rb.score_result, rs.score_result,
                                   rtol=1e-6, atol=1e-6)
        for f in range(FOLDS):
            _assert_records_match(
                os.path.join(bdir, f"fold_result_r_fold_{f}.npz"),
                os.path.join(sdir, f"fold_result_r_fold_{f}.npz"))
        # a replication run is NOT a permutation run: the full artifact
        # set (importances, checkpoints) is written per seed
        assert glob.glob(os.path.join(bdir, "node_importance_*.npy"))
        assert glob.glob(os.path.join(bdir, "gcn_state_dict_*fold_0.msgpack"))
    # distinct seeds draw distinct splits (test membership differs)
    with np.load(os.path.join(bdirs[0], "fold_result_r_fold_0.npz")) as z1, \
            np.load(os.path.join(bdirs[1],
                                 "fold_result_r_fold_0.npz")) as z2:
        assert not np.array_equal(z1["subid"], z2["subid"])


def test_seed_batch_flag_validation(cohort, topo, tmp_path):
    mcfg = ModelConfig(num_layers=1, hidden=4, hidden_linear=8, l_dim=8)
    dirs = [str(tmp_path)] * len(SEEDS)
    with pytest.raises(ValueError, match="fold_parallel"):
        cross_validation_seed_batch(
            cohort, SEEDS, topo, mcfg, _tcfg(fold_parallel=False),
            res_dirs=dirs, verbose=False)
    with pytest.raises(ValueError, match="device_gather"):
        cross_validation_seed_batch(
            cohort, SEEDS, topo, mcfg, _tcfg(device_gather=False),
            res_dirs=dirs, verbose=False)
    with pytest.raises(ValueError, match="permut"):
        cross_validation_seed_batch(
            cohort, SEEDS, topo, mcfg, _tcfg(is_permut_test=True),
            res_dirs=dirs, verbose=False)
    with pytest.raises(ValueError, match="one res_dir per seed"):
        cross_validation_seed_batch(
            cohort, SEEDS, topo, mcfg, _tcfg(), res_dirs=dirs[:1],
            verbose=False)


def _fake_result():
    import iggcn_tpu.train.cv as cvmod
    return cvmod.CVResult(
        mean_test_loss=1.0, best_acc=0.5, best_acc_std=0.0,
        score_result=np.zeros((FOLDS, 1, 5)), durations=[0.0],
        throughput_graphs_per_sec=1.0, regression_summary={})


def test_cli_routes_seed_batch(tmp_path, monkeypatch, capsys):
    """--cv_seeds + --fold_parallel (fused family) routes to the SPMD seed
    batch: per-seed results/ dirs, per-seed Result lines, and the
    across-seed replication summary."""
    import iggcn_tpu.train.cv as cvmod

    calls = {"seeds": [], "res_dirs": [], "programs": 0}

    def fake_batch(cohort, seeds, topo, mcfg, tcfg, *, res_dirs,
                   loggers=None, **kw):
        calls["programs"] += 1
        calls["seeds"].extend(seeds)
        calls["res_dirs"].extend(res_dirs)
        calls["is_permut_test"] = tcfg.is_permut_test
        return [_fake_result() for _ in seeds]

    monkeypatch.setattr(cvmod, "cross_validation_seed_batch", fake_batch)
    monkeypatch.chdir(tmp_path)
    cli.main(["--synthetic", "--synthetic_subjects", "24", "--no-search",
              "--epochs", "1", "--fold", str(FOLDS), "--fold_parallel",
              "--cv_seeds", "3,7", "--save_appendix", "_sb",
              "--cohort_cache_dir", ""])
    assert calls["seeds"] == [3, 7]
    assert calls["programs"] == 1
    assert calls["is_permut_test"] is False
    assert calls["res_dirs"][0].endswith(os.path.join("results",
                                                      "ADNI_sb_seed3"))
    out = capsys.readouterr().out
    assert "Replication over 2 seeds" in out
    # per-seed dirs carry their own log with the summary line
    for s in (3, 7):
        with open(os.path.join(str(tmp_path), "results", f"ADNI_sb_seed{s}",
                               "log.txt")) as fh:
            log = fh.read()
        assert "Result -" in log and "Replication over 2 seeds" in log


def test_cli_seed_batch_chunks_and_sequential_fallback(tmp_path, monkeypatch,
                                                       capsys):
    """--spmd_batch_entries chunks the seed axis (3 seeds, 3-entry cap ->
    3 programs); without --fold_parallel the seeds run sequentially through
    cross_validation with per-seed tcfg.seed."""
    import iggcn_tpu.train.cv as cvmod

    programs = []

    def fake_batch(cohort, seeds, topo, mcfg, tcfg, *, res_dirs,
                   loggers=None, **kw):
        programs.append(list(seeds))
        return [_fake_result() for _ in seeds]

    monkeypatch.setattr(cvmod, "cross_validation_seed_batch", fake_batch)
    monkeypatch.chdir(tmp_path)
    cli.main(["--synthetic", "--synthetic_subjects", "24", "--no-search",
              "--epochs", "1", "--fold", str(FOLDS), "--fold_parallel",
              "--cv_seeds", "1:3", "--spmd_batch_entries", "3",
              "--save_appendix", "_chk", "--cohort_cache_dir", ""])
    assert programs == [[1], [2], [3]]
    assert "3 SPMD programs" in capsys.readouterr().out

    seq_seeds = []

    def fake_cv(cohort, topo, mcfg, tcfg, **kw):
        seq_seeds.append(tcfg.seed)
        return _fake_result()

    monkeypatch.setattr(cvmod, "cross_validation", fake_cv)
    cli.main(["--synthetic", "--synthetic_subjects", "24", "--no-search",
              "--epochs", "1", "--fold", str(FOLDS),
              "--cv_seeds", "4,6", "--save_appendix", "_seq",
              "--cohort_cache_dir", ""])
    assert seq_seeds == [4, 6]
    assert "Replication over 2 seeds" in capsys.readouterr().out


def test_cli_cv_seeds_validation(tmp_path, monkeypatch, capsys):
    """--cv_seeds excludes the permutation modes."""
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit):
        cli.main(["--synthetic", "--cv_seeds", "1:2",
                  "--permut_seeds", "1:2"])
    assert "replicates the OBSERVED" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cli.main(["--synthetic", "--cv_seeds", "1:2", "--isPermutTest"])


def test_cli_cv_seeds_zoo_sequential(tmp_path, monkeypatch, capsys):
    """--cv_seeds with a zoo family replicates sequentially: per-seed
    trainer seeds, ONE fixed dataset object across every seed, per-seed
    results dirs, and the replication summary in each per-seed log."""
    import iggcn_tpu.train.generic_cv as gmod

    calls = {"seeds": [], "datasets": set(), "dirs": []}

    def fake_generic(dataset, model, *, seed, record_dir, **kw):
        calls["seeds"].append(seed)
        calls["datasets"].add(id(dataset))
        calls["dirs"].append(record_dir)
        return gmod.GenericCVResult(
            best_acc=0.5 + 0.01 * seed, best_acc_std=0.0,
            accs=np.zeros((FOLDS, 1)), mean_loss=1.0)

    monkeypatch.setattr(gmod, "cross_validation_generic", fake_generic)
    monkeypatch.chdir(tmp_path)
    cli.main(["--synthetic", "--synthetic_subjects", "24", "--no-search",
              "--epochs", "1", "--fold", str(FOLDS), "--model", "GIN",
              "--cv_seeds", "3,7", "--save_appendix", "_zs",
              "--cohort_cache_dir", ""])
    assert calls["seeds"] == [3, 7]
    assert len(calls["datasets"]) == 1          # ONE fixed dataset
    assert calls["dirs"][0].endswith(os.path.join("results", "ADNI_zs_seed3"))
    out = capsys.readouterr().out
    assert "Replication over 2 seeds" in out
    assert "0.530" in out and "0.570" in out    # per-seed accs in summary
    for s in (3, 7):
        with open(os.path.join(str(tmp_path), "results", f"ADNI_zs_seed{s}",
                               "log.txt")) as fh:
            log = fh.read()
        assert "Result -" in log and "Replication over 2 seeds" in log


def test_cli_cv_seeds_snps_sequential(tmp_path, monkeypatch, capsys):
    """--cv_seeds with an SNP-only family: per-seed trainer seeds on ONE
    fixed SNP matrix, plus the across-seed summary."""
    import iggcn_tpu.train.snps_trainer as smod

    calls = {"seeds": [], "snps": set()}

    def fake_snps(snps, labels, topo, *, seed, record_dir=None, **kw):
        calls["seeds"].append(seed)
        calls["snps"].add(id(snps))
        return smod.SnpsCVResult(
            accs=np.zeros((FOLDS, 1)), best_acc=0.6, mean_loss=1.0,
            score_result=np.zeros((FOLDS, 1, 5)), best_acc_std=0.0)

    monkeypatch.setattr(smod, "cross_validation_snps", fake_snps)
    monkeypatch.chdir(tmp_path)
    cli.main(["--synthetic", "--synthetic_subjects", "24", "--no-search",
              "--epochs", "1", "--fold", str(FOLDS), "--model", "MLP_Model",
              "--disease_id", "0", "--cv_seeds", "1:2",
              "--save_appendix", "_ss", "--cohort_cache_dir", ""])
    assert calls["seeds"] == [1, 2]
    assert len(calls["snps"]) == 1              # ONE fixed SNP cohort
    assert "Replication over 2 seeds" in capsys.readouterr().out


def test_cli_cv_seeds_zoo_real_records(tmp_path, monkeypatch):
    """A real (tiny) zoo replication writes per-seed fold records whose
    training trajectories differ across seeds (splits/inits redrawn) while
    both derive from the one base-seed cohort."""
    monkeypatch.chdir(tmp_path)
    cli.main(["--synthetic", "--synthetic_subjects", "24", "--no-search",
              "--epochs", "2", "--fold", str(FOLDS), "--model", "GCN",
              "--layers", "1", "--hiddens", "4",
              "--cv_seeds", "5,9", "--save_appendix", "_zr",
              "--cohort_cache_dir", ""])
    rec = "fold_result_generic_GCN_layers1_hidden4_h2_fold_0.npz"
    paths = [os.path.join(str(tmp_path), "results", f"ADNI_zr_seed{s}", rec)
             for s in (5, 9)]
    assert all(os.path.exists(p) for p in paths), paths
    with np.load(paths[0]) as za, np.load(paths[1]) as zb:
        la, lb = np.asarray(za["losses"]), np.asarray(zb["losses"])
    assert la.shape == lb.shape == (2,)
    assert not np.array_equal(la, lb)           # seed actually redraws
