"""Class-imbalance-aware index sampling.

Replaces `ImbalancedDatasetSampler` (`imbalanced.py:9-56`): per-sample weight
= 1 / class count, sampled WITH replacement to the dataset size each epoch.
Host-side NumPy; the drawn index vector feeds the device epoch permutation.
"""
from __future__ import annotations

import numpy as np


def imbalanced_sample_indices(y: np.ndarray, rng: np.random.Generator,
                              num_samples: int | None = None) -> np.ndarray:
    y = np.asarray(y).reshape(-1)
    if num_samples is None:
        num_samples = len(y)
    _, inverse, counts = np.unique(y, return_inverse=True, return_counts=True)
    weights = 1.0 / counts[inverse]
    p = weights / weights.sum()
    return rng.choice(len(y), size=num_samples, replace=True, p=p)
