"""Image-only SGCN trainer path + held-out ADNI-type generalization split."""
import dataclasses

import numpy as np
import pytest

from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
from iggcn_tpu.data.adni import separate_data_adnitype, synthetic_cohort
from iggcn_tpu.train.cv import cross_validation


def test_separate_data_adnitype():
    cohort = synthetic_cohort(np.random.default_rng(0), num_subjects=64)
    train, test = separate_data_adnitype(cohort, disease_id=0, adnitype_id=0)
    # test set = every adni_type==0 subject, labels binarized
    assert len(test) == int((cohort.adni_type == 0).sum())
    assert set(np.unique(test.y)) <= {0, 1}
    # train set excludes the held-out type and keeps only HC/AD raws
    assert (train.adni_type != 0).all()
    assert np.isin(train.raw_y, [0, 4]).all()
    np.testing.assert_array_equal(train.y, (train.raw_y > 0).astype(int))
    # disease_id=2: positives are raw AD (==4)
    tr2, _ = separate_data_adnitype(cohort, disease_id=2, adnitype_id=1)
    assert (tr2.raw_y >= 1).all()
    np.testing.assert_array_equal(tr2.y, (tr2.raw_y >= 4).astype(int))


def test_separate_requires_fields():
    cohort = synthetic_cohort(np.random.default_rng(0), num_subjects=16)
    cohort = dataclasses.replace(cohort, adni_type=None)
    with pytest.raises(ValueError):
        separate_data_adnitype(cohort, 0)


@pytest.mark.parametrize("use_scan", [True, False])
def test_sgcn_image_cv_runs(topo, use_scan):
    cohort = synthetic_cohort(np.random.default_rng(5), num_subjects=48)
    mcfg = ModelConfig(num_layers=2, hidden=4, hidden_linear=8)
    tcfg = TrainConfig(epochs=2, batch_size=8, folds=3, seed=3,
                       use_fold_scan=use_scan,
                       loss=LossWeights(disease=1.0))
    res = cross_validation(cohort, topo, mcfg, tcfg, res_dir=None,
                           model_kind="sgcn_image", verbose=False)
    assert np.isfinite(res.mean_test_loss)
    assert res.score_result.shape == (3, 2, 5)


def test_sgcn_image_cv_external_test(topo):
    cohort = synthetic_cohort(np.random.default_rng(7), num_subjects=80)
    train, test = separate_data_adnitype(cohort, disease_id=0, adnitype_id=0)
    mcfg = ModelConfig(num_layers=2, hidden=4, hidden_linear=8)
    tcfg = TrainConfig(epochs=1, batch_size=8, folds=3, seed=3,
                       loss=LossWeights(disease=1.0))
    res = cross_validation(train, topo, mcfg, tcfg, res_dir=None,
                           model_kind="sgcn_image", external_test=test,
                           verbose=False)
    assert np.isfinite(res.mean_test_loss)


def test_sgcn_ori_cv_runs(topo):
    """`--model SGCN_Ori` routes to the real fixed conv1->conv3 SGCNOri
    architecture (parity kernel/sgcn.py:11-151), not the JK-concat SGCNImage;
    its checkpoint must carry the Ori param set incl. BN running stats."""
    import main as cli
    assert cli.FUSION_MODELS["SGCN_Ori"] == "sgcn_ori"
    cohort = synthetic_cohort(np.random.default_rng(6), num_subjects=48)
    mcfg = ModelConfig(num_layers=2, hidden=4, hidden_linear=8)
    tcfg = TrainConfig(epochs=2, batch_size=8, folds=3, seed=3,
                       loss=LossWeights(disease=1.0))
    res = cross_validation(cohort, topo, mcfg, tcfg, res_dir=None,
                           model_kind="sgcn_ori", verbose=False)
    assert np.isfinite(res.mean_test_loss)
    assert res.score_result.shape == (3, 2, 5)
