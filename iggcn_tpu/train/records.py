"""Shared helpers for the per-fold resume records.

`config_fingerprint` closes a resume-validation gap found in the round-3
adversarial review: the record meta vector used to carry only the few
explicit axes (epochs/folds/seed/batch_size/...), so folds trained under a
DIFFERENT model family, learning rate, loss weighting, or ablation flag —
none of which change the record FILENAME — were silently restored and
mixed into the aggregates on `--resume`. Every trainer now appends an
int64 fingerprint of its full run identity to the meta; a mismatch prints
the loud "written by a different config" message and retrains the fold.
"""
from __future__ import annotations

import dataclasses
import hashlib

import numpy as np


def config_fingerprint(**fields) -> np.int64:
    """Stable int64 fingerprint of the run-identity fields.

    Dataclass values (ModelConfig, nested LossWeights/SparsityWeights) are
    expanded recursively via `dataclasses.asdict`; everything is rendered
    through `repr` of a key-sorted structure, so the fingerprint is stable
    across processes (no PYTHONHASHSEED dependence) and changes whenever
    any field — including float hyperparameters — changes.
    """
    def norm(v):
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            return sorted(dataclasses.asdict(v).items())
        return v

    payload = repr(sorted((k, norm(v)) for k, v in fields.items()))
    digest = hashlib.sha1(payload.encode("utf-8")).digest()
    return np.int64(int.from_bytes(digest[:8], "big", signed=True))
