"""SPMD permutation-null batch (`cross_validation_permut_batch`).

The permutation test changes ONLY the subject->score pairing
(`sgcn_data.py:205-208`): labels, fold splits and every non-score tensor
are seed-invariant, so the seeds x folds grid trains as ONE sharded device
program over `fold_mesh(S*k)` with a single shared device cohort. These
tests pin the load-bearing contract: every per-seed output is IDENTICAL to
a standalone fold-parallel run of that seed (which `test_parallel.py` in
turn pins against sequential CV, and `test_cli_dispatch.py` against
standalone --isPermutTest processes).
"""
import dataclasses
import glob
import os

import numpy as np
import pytest

import main as cli
from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
from iggcn_tpu.data.adni import permute_regression_targets
from iggcn_tpu.train.cv import (cross_validation,
                                cross_validation_permut_batch)

SEEDS = (1, 2)
FOLDS = 3


def _assert_records_match(path_a, path_b):
    """Per-seed batch records vs a standalone run of the same seed: exact
    for every non-float payload; float payloads to one-ulp tolerance. On a
    single device both paths build the same 1-D mesh and agree bitwise, but
    on a multi-device mesh `fold_mesh(S*k)` and `fold_mesh(k)` can pick
    DIFFERENT (fold, data) factorizations (e.g. 6 entries -> (6,1) vs
    3 -> (3,2) on 8 devices), and the data-axis sharding changes the float
    reduction order — measured worst drift one float32 ulp (6e-8) in
    test_losses, everything else bit-equal."""
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
    base = dict(epochs=2, batch_size=8, folds=FOLDS, seed=3,
                is_permut_test=True, fold_parallel=True,
                loss=LossWeights(regr=1.0, prob=0.5, reco=1.5e-6, simi=0.1))
    base.update(over)
    return TrainConfig(**base)


def _variants(cohort):
    return [(s, permute_regression_targets(cohort, s)) for s in SEEDS]


def test_batch_matches_per_seed_fold_parallel(cohort, topo, tmp_path):
    """One seeds x folds SPMD program == per-seed fold-parallel runs:
    fold records bit-identical, CVResult aggregates equal."""
    mcfg = ModelConfig(num_layers=1, hidden=4, hidden_linear=8, l_dim=8)
    tcfg = _tcfg()
    variants = _variants(cohort)

    bdirs = [str(tmp_path / f"b{s}") for s in SEEDS]
    for d in bdirs:
        os.makedirs(d)
    res_batch = cross_validation_permut_batch(
        variants, topo, mcfg, tcfg, res_dirs=bdirs,
        result_file_name="r", verbose=False)

    for (s, var), bdir, rb in zip(variants, bdirs, res_batch):
        sdir = str(tmp_path / f"s{s}")
        os.makedirs(sdir)
        rs = cross_validation(var, topo, mcfg, tcfg, res_dir=sdir,
                              result_file_name="r", verbose=False)
        # same tolerance story as _assert_records_match: bitwise on one
        # device, ulp-level reduction-order drift when the two mesh
        # factorizations differ — so float aggregates compare with the
        # same tolerance, not ==
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
    # distinct seeds actually hold distinct shuffled pairings
    with np.load(os.path.join(bdirs[0], "fold_result_r_fold_0.npz")) as z1, \
            np.load(os.path.join(bdirs[1],
                                 "fold_result_r_fold_0.npz")) as z2:
        assert not np.array_equal(z1["true_scores"], z2["true_scores"])


def test_batch_flag_validation(cohort, topo, tmp_path):
    mcfg = ModelConfig(num_layers=1, hidden=4, hidden_linear=8, l_dim=8)
    variants = _variants(cohort)
    dirs = [str(tmp_path)] * len(variants)
    with pytest.raises(ValueError, match="fold_parallel"):
        cross_validation_permut_batch(
            variants, topo, mcfg, _tcfg(fold_parallel=False),
            res_dirs=dirs, verbose=False)
    with pytest.raises(ValueError, match="is_permut_test"):
        cross_validation_permut_batch(
            variants, topo, mcfg, _tcfg(is_permut_test=False),
            res_dirs=dirs, verbose=False)
    with pytest.raises(ValueError, match="device_gather"):
        cross_validation_permut_batch(
            variants, topo, mcfg, _tcfg(device_gather=False),
            res_dirs=dirs, verbose=False)
    with pytest.raises(ValueError, match="one res_dir per variant"):
        cross_validation_permut_batch(
            variants, topo, mcfg, _tcfg(), res_dirs=dirs[:1], verbose=False)


def test_batch_rejects_disagreeing_variants(cohort, topo, tmp_path):
    """Only the subject->score pairing may differ across seeds: a variant
    with different imaging tensors would silently train seed 0's data for
    every seed — it must be rejected up front."""
    mcfg = ModelConfig(num_layers=1, hidden=4, hidden_linear=8, l_dim=8)
    bad = dataclasses.replace(
        permute_regression_targets(cohort, 2),
        x=cohort.x + 1.0)
    with pytest.raises(ValueError, match="disagrees .* on cohort field"):
        cross_validation_permut_batch(
            [(1, permute_regression_targets(cohort, 1)), (2, bad)],
            topo, mcfg, _tcfg(), res_dirs=[str(tmp_path)] * 2,
            verbose=False)


def test_cli_routes_fold_parallel_batch(tmp_path, monkeypatch, capsys):
    """--permut_seeds + --fold_parallel (fused family) routes to the SPMD
    batch; --resume falls back to the sequential per-seed loop."""
    import iggcn_tpu.train.cv as cvmod

    calls = {"seeds": [], "res_dirs": [], "programs": 0}

    def fake_batch(variants, topo, mcfg, tcfg, *, res_dirs, loggers=None,
                   **kw):
        calls["programs"] += 1
        calls["seeds"].extend(s for s, _ in variants)
        calls["res_dirs"].extend(res_dirs)
        calls["fold_parallel"] = tcfg.fold_parallel
        calls["is_permut_test"] = tcfg.is_permut_test
        r = cvmod.CVResult(
            mean_test_loss=1.0, best_acc=0.5, best_acc_std=0.0,
            score_result=np.zeros((FOLDS, 1, 5)), durations=[0.0],
            throughput_graphs_per_sec=1.0, regression_summary={})
        return [r for _ in variants]

    monkeypatch.setattr(cvmod, "cross_validation_permut_batch", fake_batch)
    monkeypatch.chdir(tmp_path)
    cli.main(["--synthetic", "--synthetic_subjects", "24", "--no-search",
              "--epochs", "1", "--fold", str(FOLDS), "--fold_parallel",
              "--permut_seeds", "5,9", "--save_appendix", "_fpb",
              "--cohort_cache_dir", ""])
    assert calls["seeds"] == [5, 9]
    assert calls["programs"] == 1   # both seeds fit one SPMD program
    assert calls["fold_parallel"] and calls["is_permut_test"]
    assert calls["res_dirs"][0].endswith(
        os.path.join("results_permuttest", "ADNI_fpb_permut5"))
    out = capsys.readouterr().out
    assert "one SPMD program per" in out
    # per-seed Result lines land in the per-seed logs
    for s in (5, 9):
        log = (tmp_path / "results_permuttest" / f"ADNI_fpb_permut{s}"
               / "log.txt").read_text()
        assert "Result -" in log


def test_cli_batch_chunks_by_spmd_batch_entries(tmp_path, monkeypatch,
                                                  capsys):
    """--spmd_batch_entries bounds seeds x folds per SPMD program: 3
    seeds at 3 folds with a 3-entry cap run as 3 one-seed programs (HBM for
    the gathered fold copies scales with the entry count)."""
    import iggcn_tpu.train.cv as cvmod

    calls = {"programs": [], "seeds": []}

    def fake_batch(variants, topo, mcfg, tcfg, *, res_dirs, loggers=None,
                   **kw):
        calls["programs"].append([s for s, _ in variants])
        calls["seeds"].extend(s for s, _ in variants)
        r = cvmod.CVResult(
            mean_test_loss=1.0, best_acc=0.5, best_acc_std=0.0,
            score_result=np.zeros((FOLDS, 1, 5)), durations=[0.0],
            throughput_graphs_per_sec=1.0, regression_summary={})
        return [r for _ in variants]

    monkeypatch.setattr(cvmod, "cross_validation_permut_batch", fake_batch)
    monkeypatch.chdir(tmp_path)
    cli.main(["--synthetic", "--synthetic_subjects", "24", "--no-search",
              "--epochs", "1", "--fold", str(FOLDS), "--fold_parallel",
              "--permut_seeds", "1:3", "--spmd_batch_entries", "3",
              "--save_appendix", "_chk", "--cohort_cache_dir", ""])
    assert calls["programs"] == [[1], [2], [3]]
    assert calls["seeds"] == [1, 2, 3]
    assert "3 SPMD programs" in capsys.readouterr().out


def test_negative_spmd_batch_entries_rejected_before_loading(capsys):
    """--spmd_batch_entries < 0 fails at argument validation (before any
    cohort is loaded or trained)."""
    with pytest.raises(SystemExit):
        cli.main(["--synthetic", "--permut_seeds", "1:2", "--fold_parallel",
                  "--spmd_batch_entries", "-1"])
    assert "--spmd_batch_entries must be >= 0" in capsys.readouterr().err


def test_dedup_cohort_aliases_seed_invariant_fields(cohort):
    """The batch loader aliases every seed-invariant array to seed 0's
    (ONE host copy of the big tensors regardless of N seeds) and leaves
    the per-seed score/demographic arrays alone."""
    a = permute_regression_targets(cohort, 1)
    b = permute_regression_targets(cohort, 2)
    deduped = cli._dedup_cohort(a, b)
    for f in ("x", "adj", "raw_adj", "y", "snps", "tsne_fdim"):
        assert getattr(deduped, f) is getattr(a, f), f
    # score pairing stays seed 2's own
    np.testing.assert_array_equal(deduped.clini_score, b.clini_score)
    assert not np.array_equal(deduped.clini_score, a.clini_score)
    # a genuinely differing field is NOT aliased (validation rejects later)
    bad = dataclasses.replace(b, x=b.x + 1.0)
    assert cli._dedup_cohort(a, bad).x is bad.x


def test_cli_spmd_batch_matches_standalone_run(tmp_path, monkeypatch):
    """Full CLI integration: one --permut_seeds --fold_parallel batch run's
    per-seed records are bit-identical to a standalone --isPermutTest
    process of the same seed."""
    monkeypatch.chdir(tmp_path)
    common = ["--synthetic", "--synthetic_subjects", "24", "--no-search",
              "--epochs", "1", "--fold", str(FOLDS), "--batch_size", "8",
              "--cohort_cache_dir", "./cc"]
    cli.main(common + ["--permut_seeds", "1:2", "--fold_parallel",
                       "--save_appendix", "_spmd"])
    cli.main(common + ["--isPermutTest", "--Seed4PermutTest", "1",
                       "--fold_parallel", "--save_appendix", "_alone"])
    root = tmp_path / "results_permuttest"
    a = sorted(glob.glob(str(root / "ADNI_spmd_permut1"
                             / "fold_result_*.npz")))
    b = sorted(glob.glob(str(root / "ADNI_alone" / "fold_result_*.npz")))
    assert len(a) == len(b) == FOLDS
    for pa, pb in zip(a, b):
        _assert_records_match(pa, pb)
    assert len(glob.glob(str(root / "ADNI_spmd_permut2"
                             / "fold_result_*.npz"))) == FOLDS
