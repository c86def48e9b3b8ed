"""Latency-hiding device->host fetches.

`jax.device_get` materializes a pytree's leaves one at a time; over a
high-latency link (the axon TPU tunnel) every leaf pays a full round trip
(~0.15-0.7 s) REGARDLESS of size, and the transport serializes the RPCs —
so fetching a ~260-leaf result tree (per-epoch outputs + best bundle +
final TrainState) costs minutes of pure latency while moving ~10 MB.
(Profiled r3: 175-292 s of the full fold-parallel experiment's wall was
leaf-by-leaf `Array._value`; async host copies did NOT overlap on this
transport.)

`device_get_tree` therefore PACKS the tree on device — one
`concatenate`-of-ravels per dtype group, a trivial jitted program cached
per (treedef, shapes) — fetches the handful of packed buffers (one RPC
each), and unpacks host-side. Latency becomes O(dtype groups), not
O(leaves).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PACK_CACHE: Dict[Tuple[Any, ...], Any] = {}


def device_get_tree(tree):
    """`jax.device_get` in O(dtype-groups) round trips (see module doc).

    Mixed trees (host leaves present) and empty trees fall back to plain
    `device_get`.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves or not all(isinstance(lf, jax.Array) for lf in leaves):
        return jax.device_get(tree)

    key = (treedef, tuple((lf.shape, str(lf.dtype)) for lf in leaves))
    cached = _PACK_CACHE.get(key)
    if cached is None:
        dtypes = sorted({str(lf.dtype) for lf in leaves})
        groups = {dt: [i for i, lf in enumerate(leaves)
                       if str(lf.dtype) == dt] for dt in dtypes}

        def pack(*ls):
            return tuple(
                jnp.concatenate([ls[i].reshape(-1) for i in groups[dt]])
                for dt in dtypes)

        cached = (jax.jit(pack), dtypes, groups)
        _PACK_CACHE[key] = cached
    pack_fn, dtypes, groups = cached

    packed = pack_fn(*leaves)
    out = [None] * len(leaves)
    for dt, buf in zip(dtypes, packed):
        host = np.asarray(buf)            # ONE transfer per dtype group
        off = 0
        for i in groups[dt]:
            n = leaves[i].size
            out[i] = host[off:off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)
