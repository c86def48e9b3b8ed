"""Fold-level parallelism: run all CV folds simultaneously on a device mesh.

SURVEY §2c: the reference is single-device; the TPU-native scaling story is
(a) batch data-parallelism (`parallel/mesh.py`) and (b) **fold parallelism**
— the k stratified folds are embarrassingly parallel, so the whole
cross-validation becomes ONE device program: `vmap` the single-fold scan
(`fold_scan.make_fold_runner`) over a leading fold axis and shard that axis
across the mesh. Each device (group) trains its own fold(s); there is no
cross-fold communication, so the mapping is pure ICI-free SPMD.

Fold data shapes are equalized by padding each fold's padded-batch arrays to
the max size across folds with zero-weight rows (every loss/BN reduction is
already `w`-masked, and `nn_compat.BatchNorm1d` freezes running stats on
all-padding batches), and extending the epoch permutations over the pad.
All-padding batches are complete no-ops: `make_train_step` gates the
params/opt-state/batch-stats/step update on `sum(w) > 0` (the param-only
sparsity penalties would otherwise still step Adam), and the LR decay is
driven by each fold's REAL steps-per-epoch carried in
`TrainState.steps_per_epoch` — so fold-parallel results match sequential CV
exactly (up to float reduction order).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fold_mesh(num_folds: int, axis_name: str = "fold",
              data_axis: str = "data"):
    """2-D (fold, data) mesh: the fold axis gets the largest divisor of
    `num_folds` that fits the device count (sharding a leading axis requires
    divisibility); devices left over extend a second `data` axis that shards
    each fold's SAMPLE axis — k folds on n = m*k chips use all n
    (fold-parallel x data-parallel SPMD composition). When k does not divide
    n the remainder idles (e.g. 5 folds on 8 chips run on 5)."""
    n_dev = jax.device_count()
    fold_size = 1
    for d in range(min(num_folds, n_dev), 0, -1):
        if num_folds % d == 0:
            fold_size = d
            break
    data_size = max(1, n_dev // fold_size)
    devices = np.array(jax.devices()[: fold_size * data_size]).reshape(
        fold_size, data_size)
    return Mesh(devices, (axis_name, data_axis))


def pad_fold_data(datas: Sequence[Dict[str, np.ndarray]]
                  ) -> List[Dict[str, np.ndarray]]:
    """Pad every fold's arrays (leading axis) to the max across folds with
    zeros; the `w` column keeps marking the real rows."""
    target = max(d["y"].shape[0] for d in datas)
    out = []
    for d in datas:
        cur = d["y"].shape[0]
        if cur == target:
            out.append(d)
            continue
        padded = {}
        for k, v in d.items():
            pad = [(0, target - cur)] + [(0, 0)] * (v.ndim - 1)
            padded[k] = np.pad(v, pad)
        out.append(padded)
    return out


def extend_perms(perms: np.ndarray, target: int) -> np.ndarray:
    """Extend (E, S_f) epoch permutations to (E, target) by appending the
    identity over the new padding rows."""
    e, s = perms.shape
    if s == target:
        return perms
    extra = np.broadcast_to(np.arange(s, target, dtype=perms.dtype),
                            (e, target - s))
    return np.concatenate([perms, extra], axis=1)


def stack_trees(trees: Sequence[Any]) -> Any:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def index_tree(tree: Any, i: int) -> Any:
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def stacked_data_specs(mesh, tree):
    """NamedShardings for a fold-stacked data tree: leading fold axis over
    the mesh's fold axis everywhere; each fold's SAMPLE axis additionally
    sharded over the second (data) mesh axis when divisible — params stay
    replicated over it and XLA inserts the within-fold gradient
    all-reduce."""
    axis = mesh.axis_names[0]
    data_axis = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    data_size = mesh.shape[data_axis] if data_axis else 1

    def leaf(x):
        if (data_size > 1 and x.ndim >= 2
                and x.shape[1] % data_size == 0):
            return NamedSharding(mesh, P(axis, data_axis))
        return NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(leaf, tree)


def run_folds_parallel(fold_fn, states, train_datas, val_datas, test_datas,
                       perms_list, rngs, *, mesh=None):
    """Execute `fold_fn` (from `make_fold_runner`) for every fold at once.

    `train_datas`/`val_datas`/`test_datas` are either per-fold LISTS of
    host dicts (shape-equalized via `pad_fold_data`, perms extended via
    `extend_perms`) or already-stacked device dicts with a leading fold
    axis (the device-side fold assembly path in `cv.py`). Returns
    (per_epoch, best, final_states) with a leading fold axis, fetched to
    host.
    """
    k = len(states)
    if mesh is None:
        mesh = fold_mesh(k)

    def stack_data(d):
        # host dicts stack in numpy (no device dispatch; uploaded at the
        # main program's dispatch); pre-stacked device dicts pass through
        return d if isinstance(d, dict) else jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *[dict(f) for f in d])

    import os
    import sys
    import time as _time
    _timing = os.environ.get("IGGCN_TIMING") == "1"
    _marks = [("start", _time.perf_counter())]

    def _mark(label):
        if _timing:
            _marks.append((label, _time.perf_counter()))
            prev = _marks[-2][1]
            print(f"[fold_parallel] {label}: {_marks[-1][1] - prev:.2f}s",
                  file=sys.stderr, flush=True)

    # ONE jitted program stacks the per-fold states: an eager
    # tree_map(jnp.stack) would issue ~230 separate device ops, each a
    # serialized tunnel round trip (~0.2-1 s EACH over axon)
    stacked = (jax.jit(stack_trees)(list(states)),
               stack_data(train_datas),
               stack_data(val_datas),
               stack_data(test_datas),
               jnp.stack([np.asarray(p) for p in perms_list]),
               jnp.stack(list(rngs)))
    _mark("stack")
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))

    def spec(tree):
        return jax.tree_util.tree_map(lambda _: shard, tree)

    def data_spec(tree):
        return stacked_data_specs(mesh, tree)

    in_specs = (spec(stacked[0]), data_spec(stacked[1]),
                data_spec(stacked[2]), data_spec(stacked[3]),
                spec(stacked[4]), spec(stacked[5]))
    vmapped = jax.vmap(fold_fn)
    run = jax.jit(vmapped,
                  in_shardings=in_specs,
                  out_shardings=spec(jax.eval_shape(vmapped, *stacked)),
                  donate_argnums=(0,))
    # compile ahead of time so the returned duration measures EXECUTION only
    # (comparable to the sequential path's warm-fold throughput)
    compiled = run.lower(*stacked).compile()
    _mark("aot_compile")
    from iggcn_tpu.utils.fetch import device_get_tree
    t0 = _time.perf_counter()
    per_epoch, best, final_states = compiled(*stacked)
    _mark("dispatch")
    # packed fetch: the result tree has ~hundreds of leaves and a
    # leaf-by-leaf device_get pays one (serialized) tunnel round trip per
    # leaf. The optimizer state is dropped before fetching — no host-side
    # consumer exists and it is half the leaves.
    per_epoch, best, final_states = device_get_tree(
        (per_epoch, best, final_states._replace(opt_state=())))
    _mark("fetch")
    exec_seconds = _time.perf_counter() - t0
    return per_epoch, best, final_states, exec_seconds
