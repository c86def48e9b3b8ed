"""Variable-size graph-classification datasets (TU-benchmark capability).

Replaces the reference's vendored `kernel/tu_dataset.py` + `kernel/datasets.py`
path: graphs are padded to the dataset max node count with (B, N, N) dense
adjacency and a (B, N) validity mask (pad-to-bucket, SURVEY §7.1). Includes a
synthetic generator standing in for MUTAG/PROTEINS-style benchmarks (the raw
TU files are not shipped here) and the degree-feature fallback of
`kernel/datasets.py:27-52`.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from iggcn_tpu.ops.pool import greedy_matching


@dataclasses.dataclass
class GraphDataset:
    """Dense padded graph-classification dataset."""

    x: np.ndarray            # (S, N_max, F)
    adj: np.ndarray          # (S, N_max, N_max)
    mask: np.ndarray         # (S, N_max) bool validity
    y: np.ndarray            # (S,)
    assign: np.ndarray       # (S, N_max) graclus-style cluster ids
    num_classes: int

    def __len__(self):
        return self.x.shape[0]

    @property
    def num_features(self):
        return self.x.shape[-1]


def from_graph_list(xs: List[np.ndarray], adjs: List[np.ndarray],
                    ys: np.ndarray, num_classes: Optional[int] = None,
                    n_max: Optional[int] = None) -> GraphDataset:
    """Pad a list of (n_i, F) features + (n_i, n_i) adjacencies to N_max."""
    if n_max is None:
        n_max = max(a.shape[0] for a in adjs)
    s = len(xs)
    f = xs[0].shape[1]
    x = np.zeros((s, n_max, f), np.float32)
    adj = np.zeros((s, n_max, n_max), np.float32)
    mask = np.zeros((s, n_max), bool)
    assign = np.zeros((s, n_max), np.int64)
    for i, (xi, ai) in enumerate(zip(xs, adjs)):
        n = ai.shape[0]
        x[i, :n] = xi
        adj[i, :n, :n] = ai
        mask[i, :n] = True
        assign[i, :n] = greedy_matching(ai)
        assign[i, n:] = np.arange(n, n_max)  # pads in singleton clusters
    if num_classes is None:
        num_classes = int(np.max(ys)) + 1
    return GraphDataset(x=x, adj=adj, mask=mask, y=np.asarray(ys, np.int64),
                        assign=assign, num_classes=num_classes)


def degree_features(adjs: List[np.ndarray], max_degree: int = 10
                    ) -> List[np.ndarray]:
    """One-hot degree node features (parity `kernel/datasets.py:30-41` for
    datasets without node attributes)."""
    out = []
    for a in adjs:
        deg = np.minimum((a != 0).sum(axis=1), max_degree).astype(int)
        one = np.zeros((a.shape[0], max_degree + 1), np.float32)
        one[np.arange(a.shape[0]), deg] = 1.0
        out.append(one)
    return out


def synthetic_tu_dataset(rng: np.random.Generator, *, num_graphs: int = 120,
                         n_min: int = 8, n_max: int = 24,
                         num_classes: int = 2, feat_dim: int = 0
                         ) -> GraphDataset:
    """MUTAG-shaped synthetic benchmark: class-dependent edge density, sizes
    in [n_min, n_max]; degree one-hot features when feat_dim == 0."""
    xs, adjs = [], []
    ys = rng.integers(0, num_classes, num_graphs)
    for i in range(num_graphs):
        n = int(rng.integers(n_min, n_max + 1))
        p = 0.15 + 0.25 * (ys[i] / max(num_classes - 1, 1))
        a = (rng.random((n, n)) < p).astype(np.float32)
        a = np.triu(a, 1)
        a = a + a.T
        # ensure connectivity-ish: ring backbone
        for j in range(n):
            a[j, (j + 1) % n] = a[(j + 1) % n, j] = 1.0
        adjs.append(a)
        if feat_dim > 0:
            xs.append(rng.normal(ys[i] * 0.3, 1.0, (n, feat_dim)
                                 ).astype(np.float32))
    if feat_dim == 0:
        xs = degree_features(adjs)
    return from_graph_list(xs, adjs, ys, num_classes=num_classes)
