"""Capstone integration: the reference's scientific workflow, end to end.

The reference's permutation-test mode exists to ask ONE question — is the
clinical-score prediction real, or would shuffled subject->score pairings
do as well? (`--isPermutTest` + `Seed4PermutTest`, `sgcn_data.py:205-208`)
— but it never aggregates the null runs. This test runs the whole loop on
a cohort with a PLANTED regression signal and shows the framework answers
it: train observed, train permuted nulls, and `tools/report.py` computes
permutation p-values from the runs' own fold records.

~3 min (3 trainings of 60 epochs x 3 folds); the heaviest single test in
the suite by design — it is the product's reason to exist.
"""
import dataclasses

import numpy as np
import pytest

from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
from iggcn_tpu.data.adni import (CLINICAL_SELECT_INDEX, MinMaxScaler,
                                 permute_regression_targets,
                                 synthetic_cohort)
from iggcn_tpu.data.go_graph import synthetic_topology
from iggcn_tpu.tools import report
from iggcn_tpu.train.cv import cross_validation

PLANTED_ROIS = [3, 17, 42, 71]


def _planted_regression_cohort(num_subjects=96, seed=11):
    """All three clinical scores are (noisy, sign-alternating) linear
    functions of the planted ROIs' mean activation — learnable signal that
    a permuted subject->score pairing destroys by construction."""
    rng = np.random.default_rng(seed)
    cohort = synthetic_cohort(rng, num_subjects=num_subjects)
    sig = cohort.x[:, PLANTED_ROIS, :].mean(axis=(1, 2))
    demo = np.array(cohort.demographics, np.float64)
    for j, col in enumerate((5, 7, 8)):       # tau, adas13, mmse columns
        demo[:, col] = ((1.0 if j % 2 == 0 else -1.0) * sig
                        + rng.normal(0, 0.01, sig.shape))
    scaler = MinMaxScaler().fit(np.nan_to_num(demo, nan=0.5))
    clini = scaler.transform(np.nan_to_num(demo, nan=0.5)
                             )[:, CLINICAL_SELECT_INDEX]
    return dataclasses.replace(cohort, demographics=demo.astype(np.float32),
                               clini_score=clini.astype(np.float32),
                               scaler4score=scaler)


def test_permutation_inference_recovers_planted_regression(tmp_path):
    cohort = _planted_regression_cohort()
    topo = synthetic_topology(np.random.default_rng(2))
    mcfg = ModelConfig(num_layers=1, hidden=4, hidden_linear=8, l_dim=8)

    def run(c, res_dir, permut):
        tcfg = TrainConfig(epochs=60, batch_size=16, lr=5e-3, folds=3,
                           seed=3, is_permut_test=permut,
                           loss=LossWeights(regr=1.0, prob=0.5,
                                            reco=1.5e-6, simi=0.1))
        return cross_validation(c, topo, mcfg, tcfg, res_dir=str(res_dir),
                                result_file_name="result_sig",
                                verbose=False)

    obs_dir = tmp_path / "observed"
    obs_dir.mkdir()
    res = run(cohort, obs_dir, permut=False)

    null_dirs = []
    for s in (1, 2):
        nd = tmp_path / f"null{s}"
        nd.mkdir()
        run(permute_regression_targets(cohort, s), nd, permut=True)
        null_dirs.append(str(nd))

    # the report tool reads the runs' OWN fold records (permutation dirs
    # included — their npy artifacts are suppressed, records are not)
    obs_rows = report.collect_regression(str(obs_dir))
    assert [r["score"] for r in obs_rows] == ["tau", "adas13", "mmse"]
    by_score = {r["score"]: r for r in obs_rows}
    # the planted signal is learned (pooled corr matches the trainer's own
    # summary; comfortably above the permutation noise floor)
    for nm in ("tau", "mmse"):
        assert by_score[nm]["corr"] > 0.25, by_score
        np.testing.assert_allclose(by_score[nm]["corr"],
                                   res.regression_summary[nm]["corr"],
                                   rtol=1e-6)

    pv = {r["score"]: r for r in
          report.permutation_pvalue_regression(obs_rows, null_dirs)}
    assert set(pv) == {"tau", "adas13", "mmse"}
    for nm in ("tau", "mmse"):        # robust margins (>=0.2 over nulls)
        assert pv[nm]["null_n"] == 2
        assert pv[nm]["p_value"] == pytest.approx(1 / 3), pv[nm]
        assert pv[nm]["observed_corr"] > pv[nm]["null_max"] + 0.1
    # adas13's margin over the nulls is smaller; the p-value must still
    # never be beaten by BOTH nulls
    assert pv["adas13"]["p_value"] <= 2 / 3 + 1e-9
