"""Fixed-shape device batching.

Replaces the reference's PyG concat batching (`batch.py:24-123`) and torch
DataLoader (`dataloader.py:11-48`) with dense (B, N, F)/(B, N, N) stacking.
Datasets are padded to a whole number of batches with 0-weight rows so every
epoch is a single static-shape `lax.scan` — the reference's ragged final
batch is reproduced exactly through the weight mask.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from iggcn_tpu.data.adni import AdniCohort


def cohort_batch_arrays(cohort: AdniCohort, clini_score: Optional[np.ndarray]
                        = None) -> Dict[str, np.ndarray]:
    """Cohort -> dict of dense arrays used by train/eval steps."""
    return {
        "x": cohort.x.astype(np.float32),
        "adj": cohort.adj.astype(np.float32),
        "snps": cohort.snps.astype(np.float32),
        "y": cohort.y.astype(np.int32),
        "clini": (clini_score if clini_score is not None
                  else cohort.clini_score).astype(np.float32),
        "clust_y": cohort.clust_y.astype(np.int32),
        "tsne": cohort.tsne_fdim.astype(np.float32),
        "sbj_id": cohort.sbj_id.astype(np.int64),
    }


def pad_to_batches(arrays: Dict[str, np.ndarray], batch_size: int,
                   pad_to_count: Optional[int] = None
                   ) -> Dict[str, np.ndarray]:
    """Pad sample-major arrays to `ceil(S/B)*B` (or an explicit count) and add
    the 0/1 weight vector `w`."""
    s = arrays["y"].shape[0]
    total = pad_to_count if pad_to_count is not None else -(-s // batch_size) * batch_size
    assert total % batch_size == 0 and total >= s
    out = {}
    for k, v in arrays.items():
        pad = [(0, total - s)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad)
    out["w"] = np.concatenate([np.ones(s, np.float32),
                               np.zeros(total - s, np.float32)])
    return out


def reshape_to_batches(arrays: Dict[str, np.ndarray], batch_size: int
                       ) -> Dict[str, np.ndarray]:
    """(S_total, ...) -> (num_batches, B, ...) for lax.scan consumption."""
    return {k: v.reshape((-1, batch_size) + v.shape[1:])
            for k, v in arrays.items()}


def to_device(arrays: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in arrays.items()}
