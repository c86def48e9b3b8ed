"""Dense batched GCN primitives.

The reference runs PyG `GCNConv` over COO edge lists with CUDA gather/scatter
(`kernel/sgcn_img_snp.py:34-49,218-223`). On TPU the brain graphs are tiny and
fixed-size (N=90 ROIs, or 270 in multi-fusion), so the idiomatic formulation is
a dense batched propagation matrix: one (B, N, N) x (B, N, F) matmul per layer,
which is pure MXU work and fuses with the pointwise epilogue under XLA.

Semantics match PyG 2.0.2 `gcn_norm` exactly: `add_remaining_self_loops`
(an EXISTING self-loop keeps its weight; a loop of weight 1 — 2 if improved —
is added only where the diagonal is zero; this matters because PPR+top-k
diffusion keeps large diagonal entries), symmetric D^-1/2 A D^-1/2
normalization with degrees accumulated at edge *targets*, inf->0 guard on
isolated nodes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_edge_mask(adj: jax.Array) -> jax.Array:
    """Boolean mask of existing edges. adj[..., r, c] = weight of edge r->c."""
    return adj != 0


def gcn_propagation_matrix(adj: jax.Array, *, add_self_loops: bool = True,
                           improved: bool = False) -> jax.Array:
    """Build the dense propagation matrix P such that `out = P @ x` matches
    PyG `GCNConv(x, edge_index, edge_weight)` aggregation.

    PyG convention (gcn_norm): edge (r, c) carries messages r->c; degrees are
    accumulated at the target c (column sums of A+I); the normalized message is
    deg[r]^-1/2 * w_rc * deg[c]^-1/2, summed into row c of the output. Hence
    P = D^-1/2 (A + I)^T D^-1/2 with D = diag(colsum(A + I)).

    Args:
      adj: (..., N, N) dense weighted adjacency, adj[r, c] = weight of r->c.
    Returns:
      (..., N, N) propagation matrix P (float32).
    """
    n = adj.shape[-1]
    fill = 2.0 if improved else 1.0
    m = adj
    if add_self_loops:
        # PyG add_remaining_self_loops: keep existing diagonal weights, fill
        # only missing ones
        eye = jnp.eye(n, dtype=bool)
        diag = jnp.diagonal(adj, axis1=-2, axis2=-1)
        new_diag = jnp.where(diag != 0, diag, fill)
        m = jnp.where(eye, new_diag[..., None, :] * eye, adj)
    deg = jnp.sum(m, axis=-2)  # column sums: degree at edge targets
    d_inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-38)), 0.0)
    # P[c, r] = d[c] * m[r, c] * d[r]
    norm = d_inv_sqrt[..., :, None] * jnp.swapaxes(m, -1, -2) * d_inv_sqrt[..., None, :]
    return norm


def gcn_conv(x: jax.Array, prop: jax.Array, weight: jax.Array,
             bias: jax.Array | None = None) -> jax.Array:
    """One GCN layer: out = P @ x @ W (+ b).

    Args:
      x: (..., N, F_in) node features.
      prop: (..., N, N) propagation matrix from `gcn_propagation_matrix`.
      weight: (F_in, F_out).
      bias: optional (F_out,).
    """
    out = jnp.einsum("...ij,...jf,fk->...ik", prop, x, weight,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out
