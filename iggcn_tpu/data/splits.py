"""K-fold splitting with exact reference parity.

`k_fold` reproduces `kernel/train_eval_sgcn_img_snps.py:467-483`:
StratifiedKFold(folds, shuffle=True, random_state=seed) over the labels; the
validation fold is the *previous* test fold; train = remainder. sklearn is
used directly (host-side, once per run) so splits are bit-identical.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def k_fold(y: np.ndarray, folds: int, seed: int
           ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Returns [(train_idx, test_idx, val_idx)] per fold."""
    from sklearn.model_selection import StratifiedKFold

    skf = StratifiedKFold(folds, shuffle=True, random_state=seed)
    test_indices = [idx for _, idx in skf.split(np.zeros(len(y)), y)]
    val_indices = [test_indices[i - 1] for i in range(folds)]
    out = []
    for i in range(folds):
        mask = np.ones(len(y), dtype=bool)
        mask[test_indices[i]] = False
        mask[val_indices[i]] = False
        out.append((np.nonzero(mask)[0], test_indices[i], val_indices[i]))
    return out


def k_fold_plain(n: int, folds: int, seed: int
                 ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Unstratified variant (parity `k_fold2`, `train_eval_sgcn_img_snps.py:486-501`)."""
    from sklearn.model_selection import KFold

    kf = KFold(folds, shuffle=True, random_state=seed)
    test_indices = [idx for _, idx in kf.split(np.zeros(n))]
    val_indices = [test_indices[i - 1] for i in range(folds)]
    out = []
    for i in range(folds):
        mask = np.ones(n, dtype=bool)
        mask[test_indices[i]] = False
        mask[val_indices[i]] = False
        out.append((np.nonzero(mask)[0], test_indices[i], val_indices[i]))
    return out
