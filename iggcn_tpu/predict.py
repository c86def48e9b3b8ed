"""Batched inference — the serving path.

The reference saves per-fold `state_dict` checkpoints but never loads one
(`kernel/train_eval_sgcn_img_snps.py:176-185`; no `load_state_dict` call
exists anywhere in the repo — SURVEY §5 checkpoint row): deploying it means
re-running training. Here deployment is train → `save_checkpoint` →
`load_checkpoint`/`tools/explain.load_payload` → `batched_forward`: one
jitted `lax.scan` over fixed-size batches of the eval-mode forward, on
device-resident data, returning the serving payload (log-probs, argmax
predictions, clinical-score regressions).

bfloat16 serving: `dtype=jnp.bfloat16` casts the floating leaves of
params/batch-stats/inputs; every matmul then runs bf16 on the MXU while the
softmax/log reductions stay max-subtracted and well-conditioned. Training
keeps fp32 (the `exp(tanh(.))` ratios and log-entropy penalties are the
numerical cliffs, SURVEY §7.3) — inference has no loss terms, and the
prediction agreement vs fp32 is pinned by `tests/test_predict.py`.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def cast_floating(tree: Any, dtype) -> Any:
    """Cast every floating-point leaf of `tree` to `dtype` (ints/bools —
    e.g. BN step counters — pass through unchanged)."""
    def leaf(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
    return jax.tree_util.tree_map(leaf, tree)


def pad_split_batches(arrays, batch_size: int):
    """The serving batching recipe, shared by `batched_forward` and the
    inference benchmark (bench.py) so they measure the same program: pad
    each (S, ...) host array to a multiple of `batch_size` by repeating its
    first row, then reshape to a (NB, B, ...) device array."""
    n = int(np.asarray(arrays[0]).shape[0])
    b = batch_size
    pad = (-n) % b
    nb = (n + pad) // b
    out = []
    for v in arrays:
        v = np.asarray(v)
        if pad:
            v = np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
        v = jnp.asarray(np.ascontiguousarray(v))
        out.append(v.reshape((nb, b) + v.shape[1:]))
    return out


def make_forward_scan(model, mesh=None):
    """Jitted (params, batch_stats, (NB, B, ...) batches) -> stacked
    eval-mode serving outputs, one XLA program for the whole cohort. The
    model is closed over (flax modules holding topology arrays are not
    hashable, so it cannot be a static jit argument); hold on to the
    returned function to serve repeatedly without retracing.

    With `mesh` (any 1-D+ `jax.sharding.Mesh`), serving is data-parallel
    SPMD over its FIRST axis: params/batch-stats replicate, each batch's
    sample axis shards across the mesh, and XLA partitions the forward —
    no collectives are needed (pure map, per-sample outputs stay sharded
    until the host fetch). `B` must divide by the axis size."""
    def forward_scan(params, batch_stats, x, adj, snps):
        def body(_, batch):
            xb, ab, sb = batch
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              xb, ab, sb, train=False)
            res = {"log_probs": out.log_probs,
                   "pred": jnp.argmax(out.log_probs, axis=-1)}
            if getattr(out, "our_reg", None) is not None:
                res["our_reg"] = out.our_reg
            return None, res

        _, outs = jax.lax.scan(body, None, (x, adj, snps))
        return outs

    if mesh is None:
        return jax.jit(forward_scan)
    from jax.sharding import NamedSharding, PartitionSpec as P
    axis = mesh.axis_names[0]
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, axis))   # (NB, B, ...): shard B
    # prefix pytrees: `rep` broadcasts over the params/stats trees, `data`
    # over every (NB, B, ...) output leaf
    return jax.jit(forward_scan, in_shardings=(rep, rep, data, data, data),
                   out_shardings=data)


def make_snps_forward_scan(model):
    """Jitted serving scan for the SNP-only families (`tools/serve` bundles
    of `GeneOntologyNetwork` / `MLPModel`): (params, batch_stats,
    (NB, B, P) snps) -> {"prob": (NB, B), "pred": (NB, B)}. The GO network
    serves its two-apply eval (encode, then classify the latent — the
    `snps_trainer` eval path); the MLP its single sigmoid head."""
    from iggcn_tpu.models.go_network import GeneOntologyNetwork

    is_go = isinstance(model, GeneOntologyNetwork)

    def forward_scan(params, batch_stats, snps):
        def body(_, x):
            if is_go:
                variables = {"params": params, "batch_stats": batch_stats}
                latent, _, _ = model.apply(variables, x)
                y_hat = model.apply(variables, latent, x,
                                    method=GeneOntologyNetwork.classify)
            else:
                y_hat = model.apply({"params": params}, x)
            prob = y_hat[:, 0]
            return None, {"prob": prob,
                          "pred": (prob > 0.5).astype(jnp.int32)}

        _, outs = jax.lax.scan(body, None, snps)
        return outs

    return jax.jit(forward_scan)


def batched_forward_snps(model, params, batch_stats, snps: np.ndarray, *,
                         batch_size: int = 256,
                         dtype: Optional[Any] = None,
                         forward_scan=None,
                         fixed_batch: bool = False,
                         expected_width: Optional[int] = None
                         ) -> Dict[str, np.ndarray]:
    """Serve a SNP-only cohort: (S, P) host matrix -> prob (S,), pred (S,).
    Same pad/split/trim recipe (and `dtype` contract: bf16 casts the
    params/stats/input after padding) as `batched_forward`. The input's own
    dtype is preserved otherwise, so a caller pre-casting params once (the
    HTTP daemon) can pass already-bf16 inputs with `dtype=None`.

    `expected_width`: fail fast with the expected SNP count instead of a
    ScopeParamShapeError from deep inside flax (the SNP-only analogue of
    `validate_cohort_shapes`)."""
    snps = np.asarray(snps)
    if snps.ndim != 2:
        raise ValueError(f"snps matrix must be 2-D (subjects, snps); got "
                         f"shape {snps.shape}")
    if expected_width is not None and snps.shape[1] != expected_width:
        raise ValueError(f"snps matrix has width {snps.shape[1]} but this "
                         f"model expects {expected_width}")
    n = snps.shape[0]
    b = batch_size if fixed_batch else (min(batch_size, n) if n
                                        else batch_size)
    (sb,) = pad_split_batches((np.asarray(snps),), b)
    if dtype is not None:
        params = cast_floating(params, dtype)
        batch_stats = cast_floating(batch_stats, dtype)
        sb = sb.astype(dtype)
    if forward_scan is None:
        forward_scan = make_snps_forward_scan(model)
    outs = jax.device_get(forward_scan(params, batch_stats, sb))
    return {k: np.asarray(v).reshape(-1)[:n].astype(
        np.float32 if v.dtype == jnp.bfloat16 else v.dtype)
        for k, v in outs.items()}


def validate_cohort_shapes(model, x, adj, snps) -> None:
    """Fail fast with the model's expected shapes instead of a
    ScopeParamShapeError from deep inside flax (e.g. a multi-fusion bundle
    — 270-node, feat_dim 1 — fed a standard (S, 90, 3) cohort)."""
    cfg = getattr(model, "cfg", None)
    if cfg is None:
        return
    want = {"x": (cfg.rois, cfg.feat_dim), "adj": (cfg.rois, cfg.rois),
            "snps": (cfg.num_snps,)}
    got = {"x": tuple(x.shape[1:]), "adj": tuple(adj.shape[1:]),
           "snps": tuple(snps.shape[1:])}
    bad = {k: (want[k], got[k]) for k in want if want[k] != got[k]}
    if bad:
        detail = "; ".join(f"{k} per-subject shape {g}, model expects {w}"
                           for k, (w, g) in bad.items())
        raise ValueError(
            f"cohort does not match the model ({detail}) — this "
            f"{type(model).__name__} was trained with rois={cfg.rois}, "
            f"feat_dim={cfg.feat_dim}, num_snps={cfg.num_snps}"
            + (", is_multi_fusion=True (270-node single-feature graphs)"
               if getattr(cfg, "is_multi_fusion", False) else ""))


def batched_forward(model, params, batch_stats,
                    x: np.ndarray, adj: np.ndarray, snps: np.ndarray, *,
                    batch_size: int = 256,
                    dtype: Optional[Any] = None,
                    forward_scan=None,
                    mesh=None,
                    fixed_batch: bool = False) -> Dict[str, np.ndarray]:
    """Serve a cohort: pad to a batch multiple, run the jitted scan, trim.

    Args:
      model: a `FusedSGCN`-family module (eval forward signature
        `(x, adj, snps, train=False)`).
      params / batch_stats: restored checkpoint collections.
      x (S, N, F), adj (S, N, N), snps (S, S_snp): host arrays.
      batch_size: static serving batch (one compile per distinct value).
      dtype: e.g. `jnp.bfloat16` for bf16 serving; None keeps fp32.
      forward_scan: optionally a `make_forward_scan(model)` result to reuse
        across calls (avoids retracing); built fresh when None.
      mesh: optional `jax.sharding.Mesh` for data-parallel serving over its
        first axis (see `make_forward_scan`); the effective batch is rounded
        up to a multiple of the axis size.
      fixed_batch: keep the batch at exactly `batch_size` even when the
        cohort is smaller (cohorts up to batch_size then share ONE compiled
        program regardless of their size — what a long-lived server wants);
        default False shrinks the batch to the cohort (less padded compute
        for a one-shot call).
    Returns host arrays: log_probs (S, C), pred (S,), and our_reg when the
    model has a regression head — padding rows already removed.
    """
    validate_cohort_shapes(model, x, adj, snps)
    n = x.shape[0]
    b = batch_size if fixed_batch else (min(batch_size, n) if n
                                        else batch_size)
    if mesh is not None:
        ax = mesh.shape[mesh.axis_names[0]]
        b = -(-b // ax) * ax           # sample axis must divide by the mesh
    xb, ab, sb = pad_split_batches((x, adj, snps), b)
    if dtype is not None:
        params = cast_floating(params, dtype)
        batch_stats = cast_floating(batch_stats, dtype)
        xb, ab, sb = (v.astype(dtype) for v in (xb, ab, sb))
    if forward_scan is None:
        forward_scan = make_forward_scan(model, mesh=mesh)
    outs = jax.device_get(forward_scan(params, batch_stats, xb, ab, sb))
    return {k: np.asarray(v).reshape((-1,) + v.shape[2:])[:n].astype(
        np.float32 if v.dtype == jnp.bfloat16 else v.dtype)
        for k, v in outs.items()}
