"""Segment reductions with static segment counts.

TPU-native replacement for `torch_scatter.scatter(reduce="sum")`
(`kernel/go_model.py:20,197-201` and inside every PyG conv). Because every
graph topology in this workload is fixed at trace time, `num_segments` is a
compile-time constant and XLA lowers these to efficient one-hot matmuls /
in-register scatters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                *, axis: int = 0) -> jax.Array:
    """Sum `data` slices sharing a segment id along `axis` (static count)."""
    if axis != 0:
        data = jnp.moveaxis(data, axis, 0)
    out = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    if axis != 0:
        out = jnp.moveaxis(out, 0, axis)
    return out


def segment_softmax_denominator(values: jax.Array, segment_ids: jax.Array,
                                num_segments: int) -> jax.Array:
    """Per-element denominator: for each element, the sum of its segment.

    Mirrors the reference's row-normalization of sparse attention values
    (`kernel/go_model.py:173-180`): row_sum gathered back per nnz.
    """
    sums = jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)
    return sums[segment_ids]
