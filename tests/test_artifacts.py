"""Artifact-file parity: a CV run with res_dir writes every file the
reference's downstream analysis consumes (names per `util/output.py` and
`kernel/train_eval_sgcn_img_snps.py:176-239`)."""
import glob
import os

import numpy as np

from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
from iggcn_tpu.train.cv import cross_validation


def test_cv_writes_reference_artifacts(cohort, topo, tmp_path):
    mcfg = ModelConfig(num_layers=2, hidden=4, rois=90, feat_dim=3,
                       num_classes=2, num_regr=3, hidden_linear=8, l_dim=8)
    tcfg = TrainConfig(epochs=2, batch_size=8, lr=1e-3, folds=3, seed=7,
                       loss=LossWeights(disease=0.0, regr=1.0, prob=0.5,
                                        reco=1.5e-6, simi=0.1, orth=0.0))
    res = cross_validation(cohort, topo, mcfg, tcfg, res_dir=str(tmp_path),
                           result_file_name="result_x", verbose=False)

    def have(pattern):
        return sorted(glob.glob(os.path.join(tmp_path, pattern)))

    # per-fold importance + checkpoint files
    assert len(have("node_importance_result_x_fold_*.npy")) == 3
    assert len(have("snps_importance_result_x_fold_*.npy")) == 3
    assert len(have("edge_prob_bias_result_x_fold_*.npy")) == 3
    assert len(have("gcn_state_dict_result_x_fold_*.msgpack")) == 3
    # pooled artifacts
    score = np.load(tmp_path / "result_x.npy")
    assert score.shape == (3, 2, 5)
    np.testing.assert_allclose(score, res.score_result)
    hidden = np.load(tmp_path / "hidden_result_x.npy")
    subids = np.load(tmp_path / "subids_result_x.npy")
    linear = np.load(tmp_path / "linear_out_result_x.npy")
    assert hidden.shape[0] == subids.shape[0] == linear.shape[0] == len(cohort)
    # regression true/pred arrays per clinical score — the reference saves
    # the FULL (S, R) matrix under each per-score filename
    # (`train_eval_sgcn_img_snps.py:459-464`); matched quirk
    for nm in ("tau", "adas13", "mmse"):
        t = np.load(tmp_path / f"score_true_{nm}_result_x.npy")
        p = np.load(tmp_path / f"score_pred_{nm}_result_x.npy")
        assert t.shape == p.shape == (len(cohort), 3)
    # node importance array has the model's ROI x channel shape
    ni = np.load(have("node_importance_result_x_fold_*.npy")[0])
    assert ni.shape == (90, 3)


def test_permut_test_skips_artifacts(cohort, topo, tmp_path):
    mcfg = ModelConfig(num_layers=2, hidden=4, rois=90, feat_dim=3,
                       num_classes=2, num_regr=3, hidden_linear=8, l_dim=8)
    tcfg = TrainConfig(epochs=2, batch_size=8, lr=1e-3, folds=3, seed=7,
                       is_permut_test=True,
                       loss=LossWeights(disease=0.0, regr=1.0, prob=0.5,
                                        reco=1.5e-6, simi=0.1, orth=0.0))
    cross_validation(cohort, topo, mcfg, tcfg, res_dir=str(tmp_path),
                     result_file_name="result_x", verbose=False)
    # parity util/output.py:13-14 — permutation test writes NO npy artifacts
    assert glob.glob(os.path.join(tmp_path, "*.npy")) == []
    assert glob.glob(os.path.join(tmp_path, "*.msgpack")) == []
