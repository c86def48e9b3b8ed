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


def pad_epoch_indices(idx, batch_size):
    """Pad a shuffled epoch index vector to a batch multiple with repeats of
    idx[0] and return (padded_idx, weights): the w=0 tail rows let the
    ragged final batch still train under masked losses (the reference's
    DataLoader keeps the smaller last batch rather than dropping samples).
    Consumers must keep the w=0 rows out of any cross-sample statistics
    (BatchNorm, auxiliary batch means)."""
    if len(idx) == 0:
        raise ValueError("empty training split: no indices to pad into "
                         "epoch batches (check folds vs cohort size)")
    b = batch_size
    nb = -(-len(idx) // b)
    n_real = len(idx)
    if nb * b > n_real:
        idx = np.concatenate([idx, np.full(nb * b - n_real, idx[0],
                                           idx.dtype)])
    w = np.zeros(nb * b, np.float32)
    w[:n_real] = 1.0
    return idx, w
