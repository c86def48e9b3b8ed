"""Multi-chip execution: batch data-parallelism over a device mesh.

The reference is strictly single-device (SURVEY §2c: no DDP/NCCL anywhere),
so the capability-matched TPU scaling story is:
  * `data` axis: graphs within a batch are sharded across chips; parameters
    and optimizer state are replicated; XLA inserts the gradient all-reduce
    over ICI (no custom comm layer, cf. scaling-book recipe).
  * fold-level parallelism (k folds are embarrassingly parallel) lives in
    `train/fold_parallel.py` (`fold_mesh` + `run_folds_parallel`), which can
    compose a 2-D (fold, data) mesh with this module's shardings.

All sharding is declarative: `jax.jit` with NamedSharding in/out specs; the
same train-step code runs single-chip when the mesh has one device.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested a {n_devices}-device mesh but only "
            f"{len(devices)} device(s) are visible")
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(mesh: Mesh, tree: Any, axis_name: str = "data") -> Any:
    """Place every leaf with its leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_dp_train_step(train_step, mesh: Mesh, axis_name: str = "data"):
    """Wrap a (state, batch, rng) -> (state, loss) step with data-parallel
    shardings: batch sharded on its leading axis, state replicated. XLA
    emits the ICI gradient all-reduce automatically."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, axis_name)
    cache: Dict[Any, Any] = {}

    def run(state, batch, rng):
        # build the jitted wrapper once per batch key-set: a fresh jax.jit
        # per call would discard the trace cache and re-lower every step
        key = tuple(sorted(batch))
        jitted = cache.get(key)
        if jitted is None:
            jitted = jax.jit(
                train_step,
                in_shardings=(jax.tree_util.tree_map(lambda _: rep, state),
                              {k: bsh for k in batch}, rep),
                out_shardings=(jax.tree_util.tree_map(lambda _: rep, state),
                               rep))
            cache[key] = jitted
        return jitted(state, batch, rng)

    return run
