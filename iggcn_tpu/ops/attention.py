"""Attention primitives.

`multihead_cross_attention` matches `torch.nn.MultiheadAttention(embed_dim,
num_heads, batch_first=True)` forward semantics (packed QKV projection +
output projection, scaled dot-product, weights averaged over heads) as used
for the imaging<->genetics fusion at `kernel/sgcn_img_snp.py:46,239-242`.
At (B, 90, D) x (B, n_GO_top, D) sizes this is a single fused attention block;
no blockwise/ring machinery is needed (sequence lengths are tiny and static).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MHAParams(NamedTuple):
    in_proj_weight: jax.Array   # (3E, E)
    in_proj_bias: jax.Array     # (3E,)
    out_proj_weight: jax.Array  # (E, E)
    out_proj_bias: jax.Array    # (E,)


def multihead_cross_attention(params: MHAParams, query: jax.Array,
                              key: jax.Array, value: jax.Array,
                              num_heads: int) -> tuple[jax.Array, jax.Array]:
    """Batched multi-head attention, torch-parity.

    Args:
      query: (B, Lq, E); key/value: (B, Lk, E).
    Returns:
      (attn_output (B, Lq, E), attn_weights (B, Lq, Lk) averaged over heads).
    """
    e = query.shape[-1]
    assert e % num_heads == 0
    hd = e // num_heads
    w_q, w_k, w_v = jnp.split(params.in_proj_weight, 3, axis=0)
    b_q, b_k, b_v = jnp.split(params.in_proj_bias, 3, axis=0)

    def proj(x, w, b):  # torch Linear: x @ w.T + b
        return x @ w.T + b

    q = proj(query, w_q, b_q)
    k = proj(key, w_k, b_k)
    v = proj(value, w_v, b_v)

    def heads(x):  # (B, L, E) -> (B, H, L, hd)
        b_, l_, _ = x.shape
        return x.reshape(b_, l_, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(
                            jnp.asarray(hd, q.dtype))
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                     preferred_element_type=jnp.float32)
    b_, h_, lq, _ = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b_, lq, e)
    out = proj(out, params.out_proj_weight, params.out_proj_bias)
    return out, weights.mean(axis=1)


def masked_row_normalize(scores: jax.Array, mask: jax.Array) -> jax.Array:
    """Row-normalize positive attention scores over a static edge mask.

    Dense equivalent of the reference's sparse row-normalization
    (`kernel/go_model.py:173-180`): A_hat[r, c] = s[r, c] / sum_c' s[r, c']
    restricted to mask entries; all-zero rows map to zero rows (the sparse
    code never touches them).

    Args:
      scores: (..., R, C) strictly positive scores (e.g. exp(tanh(.))).
      mask: (R, C) boolean static topology mask (broadcasts over batch).
    """
    masked = jnp.where(mask, scores, 0.0)
    row_sum = jnp.sum(masked, axis=-1, keepdims=True)
    return jnp.where(row_sum > 0, masked / jnp.maximum(row_sum, 1e-38), 0.0)
