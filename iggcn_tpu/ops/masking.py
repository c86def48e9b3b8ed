"""Learned-importance masking of node features, edges, and SNPs.

Dense re-formulation of `SGCN_GCN_IMGSNP.cal_probability`
(`kernel/sgcn_img_snp.py:133-151`): the reference loops over COO edges to score
each with sigmoid([x_i || x_j] . prob_bias); here the edge score matrix is
computed densely for all (r, c) pairs via two rank-1 matmuls and masked by the
static adjacency pattern — no gather/scatter, fuses into the conv.
"""
from __future__ import annotations

from typing import NamedTuple

import jax


class ImportanceMasks(NamedTuple):
    x_masked: jax.Array        # (B, N, D) node features * prob
    adj_masked: jax.Array      # (B, N, N) edge weights * edge_prob
    edge_prob: jax.Array       # (B, N, N) dense sigmoid scores (unmasked values
                               # are present but only pattern entries meaningful)
    snps_masked: jax.Array | None  # (B, S) snps * sigmoid(snps_prob)


def edge_probability_dense(x_masked: jax.Array, prob_bias: jax.Array) -> jax.Array:
    """Edge score for every ordered pair (r, c):
    sigmoid([x_r || x_c] @ prob_bias) = sigmoid(x_r @ b1 + x_c @ b2).

    Args:
      x_masked: (..., N, D) prob-masked node features.
      prob_bias: (2D, 1) or (2D,) edge scorer weights.
    Returns:
      (..., N, N) scores; entry [r, c] scores edge r->c.
    """
    d = x_masked.shape[-1]
    b = prob_bias.reshape(2 * d)
    u = x_masked @ b[:d]   # (..., N)
    v = x_masked @ b[d:]   # (..., N)
    return jax.nn.sigmoid(u[..., :, None] + v[..., None, :])


def importance_masks(x: jax.Array, adj: jax.Array, prob: jax.Array,
                     prob_bias: jax.Array,
                     snps: jax.Array | None = None,
                     snps_prob: jax.Array | None = None) -> ImportanceMasks:
    """Apply learned importance probabilities.

    Parity with `cal_probability` (`kernel/sgcn_img_snp.py:133-151`):
      * node features are multiplied by the *raw* prob parameter (sigmoid is
        only applied inside the sparsity loss),
      * each edge weight is multiplied by sigmoid([x'_r || x'_c] . prob_bias)
        where x' is the prob-masked feature,
      * SNP features are multiplied by sigmoid(snps_prob).

    Args:
      x: (B, N, D) node features.
      adj: (B, N, N) dense weighted adjacency.
      prob: (N, D) ROI importance parameter.
      prob_bias: (2D, 1) edge scorer.
      snps: optional (B, S).
      snps_prob: optional (1, S).
    """
    x_masked = x * prob
    edge_prob = edge_probability_dense(x_masked, prob_bias)
    adj_masked = adj * edge_prob
    snps_masked = None
    if snps is not None:
        assert snps_prob is not None
        snps_masked = snps * jax.nn.sigmoid(snps_prob)
    return ImportanceMasks(x_masked, adj_masked, edge_prob, snps_masked)
