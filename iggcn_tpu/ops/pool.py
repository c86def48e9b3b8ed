"""Dense masked graph pooling / readout ops.

TPU-native replacements for the PyG/torch-cluster pooling zoo (SURVEY §2b).
Everything operates on fixed-shape (B, N, F) node tensors with a (B, N)
validity mask; "pooling" updates the mask / gathers into a smaller static
shape rather than producing ragged tensors, so every op stays jit-compatible:

  * masked global mean/max/add  <- `global_{mean,max,add}_pool`
  * `sage_conv` / `graph_conv_mean`  <- SAGEConv / GraphConv(aggr='mean')
  * `gin_conv_aggregate`  <- GINConv neighborhood sum
  * `topk_pool`  <- TopKPooling (`kernel/top_k.py:15`): score = x.w/||w||,
    keep ceil(ratio * n_valid) per graph, gate kept nodes by tanh(score)
  * `sort_pool`  <- global_sort_pool (`kernel/sort_pool.py:63`)
  * `set2set`  <- Set2Set 4-step LSTM attention (`kernel/set2set.py:14`)
  * `global_attention_pool`  <- GlobalAttention (`kernel/global_attention.py:14`)
  * `diff_pool`  <- dense_diff_pool with link/entropy aux losses
    (`kernel/diff_pool.py:20`)
  * `cluster_max_pool` + host `greedy_matching`  <- graclus + max_pool
    (`kernel/graclus.py:33-35`); the randomized C++ matching becomes a
    deterministic host-side greedy matching (topology is static per sample)
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


def mean_pool(x: jax.Array, mask: jax.Array) -> jax.Array:
    """(B, N, F), (B, N) -> (B, F) masked mean."""
    m = mask[..., None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def max_pool(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask[..., None]
    return jnp.max(jnp.where(m, x, NEG), axis=1)


def add_pool(x: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.sum(x * mask[..., None].astype(x.dtype), axis=1)


def neighbor_mean(x: jax.Array, adj: jax.Array) -> jax.Array:
    """Mean over incoming neighbors (edge r->c aggregates x[r] at c)."""
    mask = (adj != 0).astype(x.dtype)
    deg = jnp.sum(mask, axis=-2)                       # (B, N) in-degree
    agg = jnp.einsum("brc,brf->bcf", mask, x,
                     preferred_element_type=jnp.float32)
    return agg / jnp.maximum(deg, 1.0)[..., None]


def sage_conv(x: jax.Array, adj: jax.Array, w_self: jax.Array,
              w_nb: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """SAGEConv / GraphConv(aggr='mean') parity: W_self x + W_nb mean_nb(x)."""
    out = x @ w_self + neighbor_mean(x, adj) @ w_nb
    if bias is not None:
        out = out + bias
    return out


def gin_conv_aggregate(x: jax.Array, adj: jax.Array, eps: jax.Array
                       ) -> jax.Array:
    """GINConv pre-MLP aggregate: (1 + eps) x + sum over incoming neighbors."""
    mask = (adj != 0).astype(x.dtype)
    agg = jnp.einsum("brc,brf->bcf", mask, x,
                     preferred_element_type=jnp.float32)
    return (1.0 + eps) * x + agg


class TopKResult(NamedTuple):
    x: jax.Array       # gated features, non-kept nodes zeroed
    adj: jax.Array     # adjacency restricted to kept nodes
    mask: jax.Array    # updated validity mask


def topk_pool(x: jax.Array, adj: jax.Array, mask: jax.Array,
              weight: jax.Array, ratio: float = 0.8) -> TopKResult:
    """TopKPooling parity on dense masked batches.

    score = x . w / ||w||; keep the top ceil(ratio * n_valid) valid nodes per
    graph; kept features are x * tanh(score). Shapes stay (B, N, .) — removal
    is expressed through the mask and zeroed adjacency rows/cols.
    """
    w = weight / jnp.maximum(jnp.linalg.norm(weight), 1e-12)
    score = jnp.einsum("bnf,f->bn", x, w)
    score = jnp.where(mask, score, NEG)
    n_valid = jnp.sum(mask, axis=1)                       # (B,)
    k = jnp.ceil(ratio * n_valid).astype(jnp.int32)       # per-graph k
    # rank of each node among its graph's scores (0 = best)
    order = jnp.argsort(-score, axis=1)
    rank = jnp.argsort(order, axis=1)
    keep = (rank < k[:, None]) & mask
    gated = x * jnp.tanh(score)[..., None]
    x_new = jnp.where(keep[..., None], gated, 0.0)
    adj_new = jnp.where(keep[:, :, None] & keep[:, None, :], adj, 0.0)
    return TopKResult(x_new, adj_new, keep)


def sort_pool(x: jax.Array, mask: jax.Array, k: int) -> jax.Array:
    """global_sort_pool parity: sort valid nodes by the LAST feature channel
    (descending), take the first k (zero-padded), return (B, k, F)."""
    key = jnp.where(mask, x[..., -1], NEG)
    order = jnp.argsort(-key, axis=1)[:, :k]              # (B, min(k, N))
    gathered = jnp.take_along_axis(x, order[..., None], axis=1)
    valid = jnp.take_along_axis(mask, order, axis=1)
    out = jnp.where(valid[..., None], gathered, 0.0)
    n = x.shape[1]
    if n < k:
        # PyG global_sort_pool always pads the node axis to k with zeros —
        # downstream Conv1d layers depend on the fixed length
        out = jnp.pad(out, ((0, 0), (0, k - n), (0, 0)))
    return out


class Set2SetParams(NamedTuple):
    w_ih: jax.Array   # (4H, 2H) LSTM input weights
    w_hh: jax.Array   # (4H, H)
    b_ih: jax.Array   # (4H,)
    b_hh: jax.Array   # (4H,)


def set2set(x: jax.Array, mask: jax.Array, params: Set2SetParams,
            processing_steps: int = 4) -> jax.Array:
    """Set2Set parity: LSTM(q*) -> attention over nodes -> readout, repeated.
    Returns (B, 2F)."""
    b, n, f = x.shape
    q_star = jnp.zeros((b, 2 * f), x.dtype)
    h = jnp.zeros((b, f), x.dtype)
    c = jnp.zeros((b, f), x.dtype)
    for _ in range(processing_steps):
        gates = q_star @ params.w_ih.T + params.b_ih + h @ params.w_hh.T + params.b_hh
        i, fgt, g, o = jnp.split(gates, 4, axis=-1)
        i, fgt, o = jax.nn.sigmoid(i), jax.nn.sigmoid(fgt), jax.nn.sigmoid(o)
        c = fgt * c + i * jnp.tanh(g)
        h = o * jnp.tanh(c)
        e = jnp.einsum("bnf,bf->bn", x, h)
        e = jnp.where(mask, e, NEG)
        a = jax.nn.softmax(e, axis=1) * mask
        r = jnp.einsum("bn,bnf->bf", a, x)
        q_star = jnp.concatenate([h, r], axis=-1)
    return q_star


def global_attention_pool(x: jax.Array, mask: jax.Array, gate: jax.Array
                          ) -> jax.Array:
    """GlobalAttention parity: softmax over gate scores per graph, weighted
    sum. gate: (B, N, 1) raw scores."""
    e = jnp.where(mask, gate[..., 0], NEG)
    a = jax.nn.softmax(e, axis=1) * mask
    return jnp.einsum("bn,bnf->bf", a, x)


def diff_pool(z: jax.Array, adj: jax.Array, s_logits: jax.Array,
              mask: jax.Array, sample_weight: jax.Array | None = None
              ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """PyG `dense_diff_pool` parity: S = softmax(s_logits) * mask;
    x' = S^T z; A' = S^T A S; link loss = ||A - S S^T||_F / numel(A) (ONE
    global Frobenius norm over the whole (B, N, N) tensor); entropy loss =
    mean over ALL B*N rows of the row entropy (masked rows contribute 0 to
    the numerator but count in the denominator, exactly like PyG). Returns
    (x', adj', link_loss, ent_loss). NOTE: the reference's DiffPool model
    computes but DISCARDS these losses (`kernel/diff_pool.py:95,168`
    `x, adj, _, _ = dense_diff_pool(...)`) — the zoo dispatch follows that;
    the losses are available for the canonical DiffPool objective.

    `sample_weight`: optional (B,) 0/1 padding mask — padded rows are
    excluded from both numerators and denominators, so the padded batch
    matches PyG on the real smaller batch exactly."""
    s = jax.nn.softmax(s_logits, axis=-1)
    s = s * mask[..., None]
    x_new = jnp.einsum("bnk,bnf->bkf", s, z,
                       preferred_element_type=jnp.float32)
    adj_new = jnp.einsum("bnk,bnm,bml->bkl", s, adj, s,
                         preferred_element_type=jnp.float32)
    ss = jnp.einsum("bnk,bmk->bnm", s, s)
    n = adj.shape[1]
    sq_i = jnp.sum(jnp.square(adj - ss), axis=(1, 2))          # (B,)
    ent_n = -jnp.sum(s * jnp.log(s + 1e-15), axis=-1)          # (B, N)
    if sample_weight is None:
        b_eff = jnp.asarray(adj.shape[0], z.dtype)
        sq_total = jnp.sum(sq_i)
        ent_total = jnp.sum(ent_n)
    else:
        sw = sample_weight.astype(z.dtype)
        b_eff = jnp.maximum(jnp.sum(sw), 1.0)
        sq_total = jnp.sum(sq_i * sw)
        ent_total = jnp.sum(ent_n * sw[:, None])
    link = jnp.sqrt(sq_total + 1e-12) / (b_eff * n * n)
    ent = ent_total / (b_eff * n)
    return x_new, adj_new, link, ent


def greedy_matching(adj: np.ndarray) -> np.ndarray:
    """Host-side deterministic greedy edge matching (graclus stand-in).
    Returns cluster ids (N,) — matched pairs share an id, unmatched nodes get
    their own. Deterministic node-order greedy (the reference's torch-cluster
    graclus is randomized; topology is static so this runs once at
    preprocessing)."""
    n = adj.shape[0]
    cluster = -np.ones(n, dtype=np.int64)
    nxt = 0
    sym = (adj != 0) | (adj.T != 0)
    for u in range(n):
        if cluster[u] >= 0:
            continue
        partner = -1
        for v in np.nonzero(sym[u])[0]:
            if v != u and cluster[v] < 0:
                partner = int(v)
                break
        cluster[u] = nxt
        if partner >= 0:
            cluster[partner] = nxt
        nxt += 1
    return cluster


def cluster_max_pool(x: jax.Array, adj: jax.Array, mask: jax.Array,
                     assign: jax.Array, num_clusters: int
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """max_pool(cluster, data) parity on dense batches: per-cluster feature
    max, coarsened adjacency via one-hot aggregation, new mask = clusters
    containing >= 1 valid node. assign: (B, N) int cluster ids (static count)."""
    onehot = jax.nn.one_hot(assign, num_clusters, dtype=x.dtype)  # (B, N, K)
    onehot = onehot * mask[..., None]
    big_neg = jnp.where(mask[..., None], x, NEG)
    # per-cluster max: expand (B, N, K, F) is wasteful; use segment-style max
    # via where+max over N for each cluster using the one-hot mask
    xk = jnp.max(jnp.where(onehot[:, :, :, None] > 0, big_neg[:, :, None, :],
                           NEG), axis=1)                      # (B, K, F)
    new_mask = jnp.sum(onehot, axis=1) > 0                    # (B, K)
    xk = jnp.where(new_mask[..., None], xk, 0.0)
    adj_new = jnp.einsum("bnk,bnm,bml->bkl", onehot, adj, onehot,
                         preferred_element_type=jnp.float32)
    adj_new = adj_new * (1.0 - jnp.eye(num_clusters, dtype=x.dtype))
    return xk, adj_new, new_mask
