"""Direct pins of the k-fold split semantics (`data/splits.py`).

These splits were previously exercised only THROUGH the CV drivers, whose
equivalence tests compare internal paths against each other — a drift in
the split rule (e.g. val = NEXT test fold instead of previous) would move
both sides identically and stay green. Here the rule is pinned against
sklearn directly, exactly as the reference builds it
(`kernel/train_eval_sgcn_img_snps.py:467-483`: StratifiedKFold(shuffle,
random_state=seed); validation fold i = test fold i-1, wrapping at 0).
"""
import numpy as np
import pytest
from sklearn.model_selection import KFold, StratifiedKFold

from iggcn_tpu.data.splits import k_fold, k_fold_plain

SEED = 1000   # the reference's hardcoded k_fold seed


def _y(n0=23, n1=17, seed=3):
    y = np.array([0] * n0 + [1] * n1)
    return np.random.default_rng(seed).permutation(y)


def test_k_fold_test_folds_match_sklearn_exactly():
    y = _y()
    folds = k_fold(y, 5, SEED)
    skf = StratifiedKFold(5, shuffle=True, random_state=SEED)
    expected = [idx for _, idx in skf.split(np.zeros(len(y)), y)]
    assert len(folds) == 5
    for i, (_, test_idx, _) in enumerate(folds):
        np.testing.assert_array_equal(test_idx, expected[i])


def test_k_fold_val_is_previous_test_fold():
    y = _y()
    folds = k_fold(y, 5, SEED)
    test_folds = [te for _, te, _ in folds]
    for i, (_, _, val_idx) in enumerate(folds):
        np.testing.assert_array_equal(val_idx, test_folds[i - 1])
    # fold 0 wraps to the LAST test fold (python's [-1]), not fold 1
    np.testing.assert_array_equal(folds[0][2], test_folds[4])


def test_k_fold_partitions_every_fold():
    y = _y()
    for train_idx, test_idx, val_idx in k_fold(y, 4, SEED):
        parts = np.concatenate([train_idx, test_idx, val_idx])
        assert len(parts) == len(y)
        np.testing.assert_array_equal(np.sort(parts), np.arange(len(y)))


def test_k_fold_is_stratified():
    # 30/20 over 5 folds divides evenly: every test fold holds exactly
    # 6 negatives and 4 positives
    y = _y(n0=30, n1=20)
    for _, test_idx, _ in k_fold(y, 5, SEED):
        assert np.sum(y[test_idx] == 1) == 4
        assert len(test_idx) == 10


def test_k_fold_seed_changes_assignment():
    y = _y()
    a = [te for _, te, _ in k_fold(y, 5, SEED)]
    b = [te for _, te, _ in k_fold(y, 5, SEED + 1)]
    assert any(len(x) != len(z) or (x != z).any() for x, z in zip(a, b))


def test_k_fold_plain_matches_unstratified_sklearn():
    n = 37
    folds = k_fold_plain(n, 5, SEED)
    kf = KFold(5, shuffle=True, random_state=SEED)
    expected = [idx for _, idx in kf.split(np.zeros(n))]
    test_folds = [te for _, te, _ in folds]
    for i, (train_idx, test_idx, val_idx) in enumerate(folds):
        np.testing.assert_array_equal(test_idx, expected[i])
        np.testing.assert_array_equal(val_idx, test_folds[i - 1])
        parts = np.sort(np.concatenate([train_idx, test_idx, val_idx]))
        np.testing.assert_array_equal(parts, np.arange(n))


@pytest.mark.parametrize("fn,arg", [(k_fold, _y()), (k_fold_plain, 40)])
def test_train_never_overlaps_test_or_val(fn, arg):
    for train_idx, test_idx, val_idx in fn(arg, 5, SEED):
        assert not set(train_idx) & set(test_idx)
        assert not set(train_idx) & set(val_idx)
        assert not set(test_idx) & set(val_idx)
