"""Dense batched GAT layer (PyG GATConv parity, heads=1, edge_dim=1).

Used by the `ifUseGAT` option of the GCN fusion model
(`kernel/gcn_img_snp.py:32-47`) and the SGCN_GAT image model
(`kernel/sgcn.py:154`). PyG semantics: per-edge logit = leaky_relu(
a_src . h_r + a_dst . h_c + a_edge . W_e e_rc), softmax over the incoming
edges of each target (self-loops added with mean edge weight), aggregation
at targets. Dense formulation: a (B, N, N) masked softmax + one batched
matmul.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GATParams(NamedTuple):
    weight: jax.Array     # (F_in, F_out) node transform
    att_src: jax.Array    # (F_out,)
    att_dst: jax.Array    # (F_out,)
    lin_edge: jax.Array   # (1, F_out) edge feature transform
    att_edge: jax.Array   # (F_out,)
    bias: jax.Array       # (F_out,)


def _self_loop_fill(w_off: jax.Array, mask_off: jax.Array) -> jax.Array:
    """Per-target self-loop edge weight, PyG GATConv semantics:
    remove_self_loops, then add_self_loops with fill_value='mean' = the
    PER-TARGET mean of that node's incoming edge attributes (scatter-mean
    over edge_index[1]; 0 for nodes with no incoming edges). Factored out
    so the mutation audit can swap in a plausibly-wrong fill."""
    cnt_in = jnp.sum(mask_off, axis=1)                       # (B, N) per target
    return jnp.sum(w_off, axis=1) / jnp.maximum(cnt_in, 1)


def gat_conv(x: jax.Array, adj: jax.Array, p: GATParams,
             negative_slope: float = 0.2) -> jax.Array:
    """One dense GAT layer.

    Args:
      x: (B, N, F_in); adj: (B, N, N) with adj[b, r, c] = weight of r->c
        (0 = no edge).
    Returns: (B, N, F_out) aggregated at targets.
    """
    b, n, _ = x.shape
    h = x @ p.weight                                   # (B, N, F)
    a_src = h @ p.att_src                              # (B, N)
    a_dst = h @ p.att_dst                              # (B, N)

    eye = jnp.eye(n, dtype=bool)
    mask_off = (adj != 0) & ~eye
    w_off = jnp.where(mask_off, adj, 0.0)
    mean_in = _self_loop_fill(w_off, mask_off)
    adj_sl = jnp.where(eye, mean_in[:, None, :] * eye, w_off)
    mask_sl = mask_off | eye

    # per-edge attention term: PyG computes sum_f((w*lin_edge_f)*att_f)
    # per edge; with edge_dim=1 that factorizes to w * <lin_edge, att_edge>,
    # one F-length dot instead of a (B, N, N, F) broadcast intermediate
    a_edge = adj_sl * jnp.dot(p.lin_edge[0], p.att_edge)   # (B, N, N)

    logits = jax.nn.leaky_relu(
        a_src[:, :, None] + a_dst[:, None, :] + a_edge, negative_slope)
    logits = jnp.where(mask_sl, logits, -jnp.inf)
    # softmax over sources r for each target c (axis=1)
    alpha = jax.nn.softmax(logits, axis=1)
    alpha = jnp.where(mask_sl, alpha, 0.0)
    out = jnp.einsum("brc,brf->bcf", alpha, h,
                     preferred_element_type=jnp.float32)
    return out + p.bias
