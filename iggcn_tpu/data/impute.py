"""Per-fold leakage-safe KNN imputation of demographics.

Parity: `util/tool.py:22-111` — KNNImputer(k=3) fit on the train fold's raw
demographics, applied to val/test, re-scaled with the cohort-level MinMax
scaler, then the selected columns (tau/adas13/mmse = [5,7,8], or a single
chosen index) become the regression targets.
"""
from __future__ import annotations

from typing import List

import numpy as np

from iggcn_tpu.data.adni import CLINICAL_SELECT_INDEX, MinMaxScaler


def knn_impute_scores(demographics_splits: List[np.ndarray],
                      scaler4score: MinMaxScaler,
                      clinical_score_index: int = -1,
                      k: int = 3) -> List[np.ndarray]:
    """Impute each split's demographics (first split = train, fit-transform;
    the rest are transform-only) and return the per-split clinical-score
    targets."""
    from sklearn.impute import KNNImputer

    imputer = KNNImputer(n_neighbors=k)
    imputed = [imputer.fit_transform(demographics_splits[0])]
    imputed += [imputer.transform(d) for d in demographics_splits[1:]]
    scaled = [scaler4score.transform(d) for d in imputed]
    if clinical_score_index == -1:
        sel = CLINICAL_SELECT_INDEX
    else:
        sel = np.array([clinical_score_index])
    return [s[:, sel].astype(np.float32) for s in scaled]
