"""Experiment resume: an interrupted CV run restarts at the first
unfinished fold and reproduces the uninterrupted run's aggregates exactly.

New capability (no reference equivalent — upstream keeps per-fold results
only in process memory until the end, `kernel/train_eval_sgcn_img_snps.py:
440-470`, so a crash loses everything). The per-fold record is
`fold_result_<name>_fold_<k>.npz`, written atomically after each fold.
"""
import dataclasses
import glob
import os

import numpy as np
import pytest

from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
from iggcn_tpu.train import cv as cv_mod
from iggcn_tpu.train.cv import cross_validation


@pytest.fixture(scope="module")
def cfgs():
    mcfg = ModelConfig(num_layers=1, hidden=4, rois=90, feat_dim=3,
                       num_classes=2, num_regr=3, hidden_linear=8, l_dim=8)
    tcfg = TrainConfig(epochs=2, batch_size=8, lr=1e-3, folds=3, seed=7,
                       loss=LossWeights(disease=1.0, regr=1.0, prob=0.5,
                                        reco=1.5e-6, simi=0.1))
    return mcfg, tcfg


def _run(cohort, topo, mcfg, tcfg, res_dir, **kw):
    return cross_validation(cohort, topo, mcfg, tcfg, res_dir=res_dir,
                            result_file_name="res", verbose=False, **kw)


@pytest.fixture(scope="module")
def base_run(cohort, topo, cfgs, tmp_path_factory):
    """ONE uninterrupted base run shared by every fused-resume test (each
    test works on its own copy of the records dir)."""
    mcfg, tcfg = cfgs
    d = str(tmp_path_factory.mktemp("resume_base"))
    res = _run(cohort, topo, mcfg, tcfg, d)
    return d, res


def _copy_base(base_run, tmp_path):
    import shutil

    src_dir, res = base_run
    d = str(tmp_path / "run")
    shutil.copytree(src_dir, d)
    return d, res


def _assert_same(a, b, rtol=1e-6, atol=0.0):
    np.testing.assert_allclose(a.mean_test_loss, b.mean_test_loss,
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(a.score_result, b.score_result,
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(a.best_acc, b.best_acc, rtol=rtol, atol=atol)
    for nm in a.regression_summary:
        np.testing.assert_allclose(
            a.regression_summary[nm]["corr"],
            b.regression_summary[nm]["corr"], rtol=max(rtol, 1e-5),
            atol=max(atol, 1e-7))


def test_full_resume_skips_all_training(cohort, topo, cfgs, base_run,
                                        tmp_path, monkeypatch):
    mcfg, tcfg = cfgs
    d, base = _copy_base(base_run, tmp_path)
    assert len(glob.glob(os.path.join(d, "fold_result_res_fold_*.npz"))) == 3

    # resuming a COMPLETE run must never build a fold runner or train
    def boom(*a, **k):
        raise AssertionError("training was attempted on a complete resume")

    monkeypatch.setattr(cv_mod, "make_fold_runner", boom)
    monkeypatch.setattr(cv_mod, "make_epoch_fns", boom)
    resumed = _run(cohort, topo, mcfg, tcfg, d, resume=True)
    _assert_same(base, resumed)
    # nothing trained -> no steady-state throughput claim
    assert resumed.throughput_graphs_per_sec == 0.0


def test_partial_resume_reproduces_uninterrupted_run(cohort, topo, cfgs,
                                                     base_run, tmp_path):
    mcfg, tcfg = cfgs
    d, base = _copy_base(base_run, tmp_path)
    # simulate an interruption after fold 1: folds 1-2 never finished
    for f in (1, 2):
        os.remove(os.path.join(d, f"fold_result_res_fold_{f}.npz"))
    resumed = _run(cohort, topo, mcfg, tcfg, d, resume=True)
    _assert_same(base, resumed)
    # the retrained folds re-wrote their records
    assert len(glob.glob(os.path.join(d, "fold_result_res_fold_*.npz"))) == 3


@pytest.mark.parametrize("change", [
    dict(seed=8), dict(no_val=True),
    # fingerprint-guarded axes (review finding: the old int-only meta let
    # these silently mix into the aggregates on --resume)
    dict(lr=2e-3),
    dict(loss=LossWeights(disease=0.0, regr=1.0, prob=0.5,
                          reco=1.5e-6, simi=0.1)),
])
def test_resume_discards_mismatched_config(cohort, topo, cfgs, base_run,
                                           tmp_path, capsys, change):
    mcfg, tcfg = cfgs
    d, _ = _copy_base(base_run, tmp_path)
    # a changed seed (splits differ), mode (no_val folds val into train),
    # or hyperparameter (lr / loss weighting) invalidates every saved fold
    tcfg2 = dataclasses.replace(tcfg, **change)
    resumed = _run(cohort, topo, mcfg, tcfg2, d, resume=True)
    out = capsys.readouterr().out
    assert "different config" in out
    # everything retrained -> real throughput again
    assert resumed.throughput_graphs_per_sec > 0.0


def test_resume_discards_other_model_family(cohort, topo, cfgs, base_run,
                                            tmp_path, capsys):
    """Records trained by one model family must not resume into another —
    the record filename is the same for every fused family, so only the
    meta fingerprint separates them (review finding)."""
    mcfg, tcfg = cfgs
    d, _ = _copy_base(base_run, tmp_path)
    resumed = _run(cohort, topo, mcfg, tcfg, d, resume=True,
                   model_kind="gcn_imgsnp")
    assert "different config" in capsys.readouterr().out
    assert resumed.throughput_graphs_per_sec > 0.0


def test_resume_allows_execution_strategy_flip(cohort, topo, cfgs, base_run,
                                               tmp_path, capsys):
    """Execution-strategy knobs with identical results (use_fold_scan here)
    are EXCLUDED from the fingerprint: a resume may switch them and still
    restore every fold."""
    mcfg, tcfg = cfgs
    d, base = _copy_base(base_run, tmp_path)
    tcfg2 = dataclasses.replace(tcfg, use_fold_scan=not tcfg.use_fold_scan)
    resumed = _run(cohort, topo, mcfg, tcfg2, d, resume=True)
    assert "different config" not in capsys.readouterr().out
    _assert_same(base, resumed)
    # nothing trained -> no steady-state throughput claim
    assert resumed.throughput_graphs_per_sec == 0.0


def test_resume_ignores_corrupt_record(cohort, topo, cfgs, base_run,
                                       tmp_path, capsys):
    mcfg, tcfg = cfgs
    d, base = _copy_base(base_run, tmp_path)
    with open(os.path.join(d, "fold_result_res_fold_0.npz"), "wb") as fh:
        fh.write(b"not an npz")
    resumed = _run(cohort, topo, mcfg, tcfg, d, resume=True)
    assert "unreadable" in capsys.readouterr().out
    _assert_same(base, resumed)


def test_fold_parallel_partial_set_retrains_all(cohort, topo, cfgs, base_run,
                                                tmp_path, capsys):
    mcfg, tcfg = cfgs
    d, base = _copy_base(base_run, tmp_path)
    os.remove(os.path.join(d, "fold_result_res_fold_2.npz"))
    tcfg_par = dataclasses.replace(tcfg, fold_parallel=True)
    resumed = _run(cohort, topo, mcfg, tcfg_par, d, resume=True)
    assert "retraining everything" in capsys.readouterr().out
    # fold-parallel == sequential only to its own documented tolerance
    # (test_parallel.py: one vmapped program, different reduction order)
    _assert_same(base, resumed, rtol=1e-3, atol=2e-3)


def test_cli_resume_flag_validation():
    import main

    with pytest.raises(SystemExit):
        main.main(["--resume", "--synthetic", "--no-search"])  # no appendix


def test_snps_trainer_resume(topo, tmp_path, monkeypatch, capsys):
    from iggcn_tpu.train import snps_trainer as st
    from iggcn_tpu.train.snps_trainer import cross_validation_snps

    rng = np.random.default_rng(0)
    y = (rng.random(36) < 0.5).astype(np.int64)
    snps = rng.random((36, topo.num_snps)).astype(np.float32)
    d = str(tmp_path)
    kw = dict(folds=3, epochs=2, batch_size=8, model_kind="mlp",
              record_dir=d)
    base = cross_validation_snps(snps, y, topo, **kw)
    assert len(glob.glob(os.path.join(d, "fold_result_snps_mlp_*.npz"))) == 3
    # partial resume: fold 1 lost
    os.remove(os.path.join(d, "fold_result_snps_mlp_fold_1.npz"))
    resumed = cross_validation_snps(snps, y, topo, resume=True, **kw)
    out = capsys.readouterr().out
    assert "fold 0 restored" in out and "fold 2 restored" in out
    np.testing.assert_allclose(base.score_result, resumed.score_result,
                               rtol=1e-6)
    np.testing.assert_allclose(base.mean_loss, resumed.mean_loss, rtol=1e-6)

    # a complete resume must never CALL a step function (they are built
    # once up front, before the fold loop — that stays)
    def build_exploding_steps(*a, **k):
        def boom(*a2, **k2):
            raise AssertionError("training attempted on a complete resume")
        return boom, boom

    monkeypatch.setattr(st, "build_snps_steps", build_exploding_steps)
    full = cross_validation_snps(snps, y, topo, resume=True, **kw)
    np.testing.assert_allclose(base.score_result, full.score_result,
                               rtol=1e-6)


def test_generic_trainer_resume(tmp_path, capsys):
    from iggcn_tpu.data.tu import synthetic_tu_dataset
    from iggcn_tpu.models.baselines import GIN
    from iggcn_tpu.train.generic_cv import cross_validation_generic

    ds = synthetic_tu_dataset(np.random.default_rng(3), num_graphs=36)
    d = str(tmp_path)

    def run(**kw):
        return cross_validation_generic(
            ds, GIN(num_layers=2, hidden=8, num_classes=ds.num_classes),
            folds=3, epochs=2, batch_size=8, takes_weight=True,
            record_dir=d, record_tag="GIN_layers2_hidden8_h2", **kw)

    base = run()
    assert len(glob.glob(os.path.join(d, "fold_result_generic_*.npz"))) == 3
    os.remove(os.path.join(d, "fold_result_generic_GIN_layers2_hidden8_h2"
                              "_fold_2.npz"))
    resumed = run(resume=True)
    out = capsys.readouterr().out
    assert "fold 0 restored" in out and "fold 1 restored" in out
    np.testing.assert_allclose(base.accs, resumed.accs, rtol=1e-6)
    np.testing.assert_allclose(base.mean_loss, resumed.mean_loss, rtol=1e-6)
    np.testing.assert_allclose(base.best_acc, resumed.best_acc, rtol=1e-6)
