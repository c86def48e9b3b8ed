"""Integration: the whole-fold on-device scan path of `cross_validation`
produces the same results as the per-epoch python driver.

The scan path (`train/fold_scan.py`) runs one jitted dispatch per fold; the
python path dispatches ~4 calls per epoch. Both consume the same numpy
shuffle permutations and the same per-epoch dropout key splits, so metric
trajectories must agree to float tolerance.
"""
import dataclasses

import numpy as np
import pytest

from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
from iggcn_tpu.train.cv import cross_validation


@pytest.fixture(scope="module")
def tiny_cfgs():
    mcfg = ModelConfig(num_layers=2, hidden=4, rois=90, feat_dim=3,
                      num_classes=2, num_regr=3, hidden_linear=8, l_dim=8)
    tcfg = TrainConfig(epochs=2, batch_size=8, lr=1e-3, folds=3, seed=7,
                       loss=LossWeights(disease=0.0, regr=1.0, prob=0.5,
                                        reco=1.5e-6, simi=0.1, orth=0.0))
    return mcfg, tcfg


def _run(cohort, topo, mcfg, tcfg, use_scan):
    tcfg = dataclasses.replace(tcfg, use_fold_scan=use_scan)
    return cross_validation(cohort, topo, mcfg, tcfg, res_dir=None,
                            verbose=False)


def test_fold_scan_matches_python_driver(cohort, topo, tiny_cfgs):
    mcfg, tcfg = tiny_cfgs
    res_scan = _run(cohort, topo, mcfg, tcfg, True)
    res_py = _run(cohort, topo, mcfg, tcfg, False)
    np.testing.assert_allclose(res_scan.mean_test_loss, res_py.mean_test_loss,
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(res_scan.score_result, res_py.score_result,
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(res_scan.best_acc, res_py.best_acc,
                               rtol=2e-4, atol=1e-5)
    for nm in res_scan.regression_summary:
        a = res_scan.regression_summary[nm]
        b = res_py.regression_summary[nm]
        np.testing.assert_allclose(a["corr"], b["corr"], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(a["rmse"], b["rmse"], rtol=1e-3, atol=1e-5)


def test_fold_scan_no_val_runs(cohort, topo, tiny_cfgs):
    mcfg, tcfg = tiny_cfgs
    tcfg = dataclasses.replace(tcfg, no_val=True, epochs=1)
    res = cross_validation(cohort, topo, mcfg, tcfg, res_dir=None,
                           verbose=False)
    assert np.isfinite(res.mean_test_loss)
    assert res.score_result.shape == (3, 1, 5)


@pytest.mark.parametrize("mode", ["scan", "python", "fold_parallel"])
def test_export_bundle_writes_one_loadable_bundle_per_fold(
        cohort, topo, tiny_cfgs, tmp_path, mode):
    """All three CV drivers (whole-fold scan, per-epoch python, fold-
    parallel SPMD) export exactly one serving bundle per fold (written once
    at fold end, not per improvement epoch) and the artifact loads on a
    deployment host."""
    from iggcn_tpu.models.fused_sgcn import FusedSGCN
    from iggcn_tpu.tools.serve import load_bundle

    mcfg, tcfg = tiny_cfgs
    tcfg = dataclasses.replace(tcfg, use_fold_scan=mode != "python",
                               fold_parallel=mode == "fold_parallel")
    cross_validation(cohort, topo, mcfg, tcfg, res_dir=str(tmp_path),
                     verbose=False, export_bundle=True)
    bundles = sorted(tmp_path.glob("serving_bundle_*.npz"))
    assert [b.name for b in bundles] == [
        f"serving_bundle_result_fold_{i}.npz" for i in range(tcfg.folds)]
    model, params, stats = load_bundle(str(bundles[0]))
    assert type(model) is FusedSGCN and "prob" in params


def test_device_gather_matches_upload(cohort, topo, tiny_cfgs):
    """device_gather=True (on-device fold row gather from the once-uploaded
    cohort) must reproduce the plain per-fold-upload results exactly: padding
    rows carry different content but every reduction is w-masked."""
    mcfg, tcfg = tiny_cfgs
    res_g = _run(cohort, topo, mcfg,
                 dataclasses.replace(tcfg, device_gather=True), True)
    res_u = _run(cohort, topo, mcfg,
                 dataclasses.replace(tcfg, device_gather=False), True)
    np.testing.assert_allclose(res_g.mean_test_loss, res_u.mean_test_loss,
                               rtol=1e-5)
    np.testing.assert_allclose(res_g.score_result, res_u.score_result,
                               rtol=1e-4, atol=1e-5)
    for nm in res_g.regression_summary:
        np.testing.assert_allclose(res_g.regression_summary[nm]["rmse"],
                                   res_u.regression_summary[nm]["rmse"],
                                   rtol=1e-4)
