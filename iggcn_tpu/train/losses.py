"""Pure loss functions for the 7-term fused objective.

Parity map (reference -> here):
  * `SGCN_GCN_IMGSNP.loss_probability` (`kernel/sgcn_img_snp.py:153-181`)
      -> `sparsity_loss`
  * `SGCN_GCN_IMGSNP.consist_loss` (`kernel/sgcn_img_snp.py:183-196`)
      -> `consistency_loss` (masked formulation: the reference's boolean
         subsetting `out_feat[clust_y == c]` is a dynamic shape; here the
         subset enters through a 0/1 weight vector, mathematically identical)
  * `SGCN_GCN_IMGSNP.OrthogonalConstraint` (`kernel/sgcn_img_snp.py:198-205`)
      -> `orthogonal_loss`
  * loss assembly in `train()` (`kernel/train_eval_sgcn_img_snps.py:511-548`)
      -> `fused_objective`

All reductions are fp32; `sample_weight` supports padded batches (padding
rows carry weight 0 and zeroed inputs, so edge counts and means match the
reference's ragged batching exactly).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from iggcn_tpu.config import SparsityWeights
from iggcn_tpu.ops.masking import edge_probability_dense


def _binary_entropy(p: jax.Array, eps: float = 1e-6) -> jax.Array:
    return -(p * jnp.log(p + eps) + (1 - p) * jnp.log((1 - p) + eps))


def sparsity_loss(prob: jax.Array, prob_bias: jax.Array, snps_prob: jax.Array,
                  x: jax.Array, adj: jax.Array, sw: SparsityWeights,
                  eps: float = 1e-6,
                  sample_weight: Optional[jax.Array] = None) -> jax.Array:
    """L1 + binary-entropy penalties on node / edge / SNP importance.

    Parity: `loss_probability` (`kernel/sgcn_img_snp.py:153-181`). The node and
    SNP terms depend only on the parameters; the edge term averages the dense
    sigmoid edge scores over the *existing* edges of the batch (reference
    averages over the COO edge list).

    Args:
      x: (B, N, D) raw node features; adj: (B, N, N) edge weights.
      sample_weight: optional (B,) 0/1 padding mask.
    """
    xp = jax.nn.sigmoid(prob)
    f_sum = jnp.mean(jnp.abs(xp))
    f_ent = jnp.mean(_binary_entropy(xp, eps))

    ep = edge_probability_dense(x * prob, prob_bias)     # (B, N, N)
    mask = (adj != 0)
    if sample_weight is not None:
        mask = mask & (sample_weight[:, None, None] > 0)
    n_edges = jnp.maximum(jnp.sum(mask), 1)
    e_sum = jnp.sum(jnp.where(mask, jnp.abs(ep), 0.0)) / n_edges
    e_ent = jnp.sum(jnp.where(mask, _binary_entropy(ep, eps), 0.0)) / n_edges

    sp = jax.nn.sigmoid(snps_prob)
    s_sum = jnp.mean(jnp.abs(sp))
    s_ent = jnp.mean(_binary_entropy(sp, eps))

    loss_l1 = sw.lamda_x_l1 * f_sum + sw.lamda_e_l1 * e_sum + sw.lamda_x_l1 * s_sum
    loss_ent = sw.lamda_x_ent * f_ent + sw.lamda_e_ent * e_ent + sw.lamda_x_ent * s_ent
    return loss_l1 + loss_ent


def sgcn_sparsity_loss(prob: jax.Array, prob_bias: jax.Array,
                       x: jax.Array, adj: jax.Array, sw: SparsityWeights,
                       eps: float = 1e-6,
                       sample_weight: Optional[jax.Array] = None) -> jax.Array:
    """Image-only SGCN variant of the penalty (`kernel/sgcn.py:88-109`):
    no SNP term, and the node L1 term is sum over channels / N (not N*D)."""
    xp = jax.nn.sigmoid(prob)
    n = xp.shape[0]
    f_sum = jnp.sum(jnp.abs(xp)) / n
    f_ent = jnp.mean(_binary_entropy(xp, eps))
    ep = edge_probability_dense(x * prob, prob_bias)
    mask = (adj != 0)
    if sample_weight is not None:
        mask = mask & (sample_weight[:, None, None] > 0)
    n_edges = jnp.maximum(jnp.sum(mask), 1)
    e_sum = jnp.sum(jnp.where(mask, jnp.abs(ep), 0.0)) / n_edges
    e_ent = jnp.sum(jnp.where(mask, _binary_entropy(ep, eps), 0.0)) / n_edges
    return (sw.lamda_x_l1 * f_sum + sw.lamda_e_l1 * e_sum
            + sw.lamda_x_ent * f_ent + sw.lamda_e_ent * e_ent)


def rbf_kernel(x: jax.Array, y: jax.Array, gamma: float) -> jax.Array:
    """exp(-gamma * ||x_i - y_j||^2), parity `util/image_cluster.py:15-31`."""
    d2 = jnp.sum(jnp.square(x[:, None, :] - y[None, :, :]), axis=-1)
    return jnp.exp(-gamma * d2)


def consistency_loss(s: jax.Array, weight_matrix: jax.Array,
                     member: Optional[jax.Array] = None) -> jax.Array:
    """Laplacian smoothness trace(s^T L s) / n^2 under a similarity matrix.

    Parity: `consist_loss` (`kernel/sgcn_img_snp.py:183-196`).
      * soft-similarity mode: weight_matrix = rbf_kernel(tsne, tsne), member
        is the padding mask (or None).
      * cluster mode: weight_matrix = ones, member = 1[clust_y == c] — the
        masked algebra reproduces subsetting: with W' = W * m m^T,
        trace(s^T (D'-W') s) = sum_i m_i d_i ||s_i||^2 - sum_ij W'_ij <s_i,s_j>,
        divided by (sum m)^2; empty subsets contribute 0 (reference returns 0
        for len(s)==0).
    """
    b = s.shape[0]
    if member is None:
        member = jnp.ones((b,), s.dtype)
    member = member.astype(s.dtype)
    w = weight_matrix * member[:, None] * member[None, :]
    deg = jnp.sum(w, axis=1)
    gram = s @ s.T
    tr = jnp.sum(deg * jnp.diag(gram)) - jnp.sum(w * gram)
    n = jnp.sum(member)
    return jnp.where(n > 0, tr / jnp.maximum(n * n, 1.0), 0.0)


def orthogonal_loss(w: jax.Array, sample_weight: Optional[jax.Array] = None
                    ) -> jax.Array:
    """||(W_n^T W_n) - I||_F^2 / B^2 with row-normalized W_n.

    Parity: `OrthogonalConstraint` (`kernel/sgcn_img_snp.py:198-205`). With a
    padding mask, padded rows are zeroed (their normalized rows would be
    garbage) and B counts real rows.

    When D > B the (D, D) gram is never materialized: by trace algebra,
    ||W^T W - I_D||_F^2 = tr((W W^T)^2) - 2 ||W||_F^2 + D, which needs only
    the (B, B) gram. At production-scale readouts (D in the 1e5 range, where
    the direct form would allocate O(D^2) HBM) this is the difference between
    fitting and OOM; with D > B the rank-deficient W^T W is far from I_D, so
    the subtraction carries no catastrophic cancellation. D <= B keeps the
    direct form so small-case numerics stay bit-identical to the oracle pins.
    """
    norm = jnp.linalg.norm(w, axis=1, keepdims=True)
    wn = w / jnp.maximum(norm, 1e-12)
    if sample_weight is not None:
        wn = wn * sample_weight[:, None]
        b = jnp.maximum(jnp.sum(sample_weight), 1.0)
    else:
        b = w.shape[0]
    d = w.shape[1]
    if d > w.shape[0]:
        gram_b = wn @ wn.T
        sq = jnp.sum(jnp.square(gram_b)) - 2.0 * jnp.sum(jnp.square(wn)) + d
        return sq / (b * b)
    gram = wn.T @ wn
    eye = jnp.eye(d, dtype=w.dtype)
    return jnp.sum(jnp.square(gram - eye)) / (b * b)


def weighted_mean(values: jax.Array, sample_weight: Optional[jax.Array]
                  ) -> jax.Array:
    """Mean over real (non-padded) elements."""
    if sample_weight is None:
        return jnp.mean(values)
    # broadcast weight over trailing dims
    w = sample_weight.reshape(sample_weight.shape + (1,) * (values.ndim - 1))
    w = jnp.broadcast_to(w, values.shape)
    return jnp.sum(values * w) / jnp.maximum(jnp.sum(w), 1.0)


def nll_loss(log_probs: jax.Array, labels: jax.Array,
             sample_weight: Optional[jax.Array] = None) -> jax.Array:
    """F.nll_loss parity (mean reduction)."""
    picked = -jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
    return weighted_mean(picked, sample_weight)


def mse_loss(pred: jax.Array, target: jax.Array,
             sample_weight: Optional[jax.Array] = None) -> jax.Array:
    """F.mse_loss parity (mean over all elements of the flattened views).
    Shapes must match exactly — a (B, 3) vs (B, 1) pair would broadcast
    into a silently wrong objective (all heads fitting one scalar)."""
    if pred.shape != target.shape:
        raise ValueError(f"mse_loss shape mismatch: pred {pred.shape} vs "
                         f"target {target.shape}")
    return weighted_mean(jnp.square(pred - target), sample_weight)


def recon_sum(pred: jax.Array, target: jax.Array,
              sample_weight: Optional[jax.Array] = None) -> jax.Array:
    """torch.sum(MSELoss(reduction='none')(...)) parity."""
    sq = jnp.square(pred - target)
    if sample_weight is not None:
        sq = sq * sample_weight[:, None]
    return jnp.sum(sq)
