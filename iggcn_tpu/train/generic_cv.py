"""Generic graph-classification CV trainer (baseline zoo / TU benchmarks).

Re-design of `kernel/train_eval.py`: plain NLL objective, with-val variant
evaluates the held-out val fold each epoch and reports per-fold test accuracy
at the best-val-loss epoch (`kernel/train_eval.py:85-115`); without-val variant
resamples the train split with the imbalance-weighted sampler and reports the
max over epochs of fold-mean accuracy (`kernel/train_eval.py:85-104,146-149,
203-228`). `aux_loss=True` adds DiffPool's link/entropy losses to the
objective — NOT reference behavior (the reference discards them,
`kernel/diff_pool.py:95,168`) but the canonical DiffPool objective.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from iggcn_tpu.data.sampler import (imbalanced_sample_indices,
                                    pad_epoch_indices)
from iggcn_tpu.data.splits import k_fold
from iggcn_tpu.data.tu import GraphDataset
from iggcn_tpu.train.losses import nll_loss
from iggcn_tpu.train.records import config_fingerprint
from iggcn_tpu.train.steps import adam_transform, steplr_host


@dataclasses.dataclass
class GenericCVResult:
    best_acc: float
    best_acc_std: float
    accs: np.ndarray       # (folds, epochs)
    mean_loss: float


def _model_forward(model, variables, batch, train, rng, needs_mask,
                   needs_assign, adj_only, mutable, takes_weight=False):
    kwargs = {"train": train}
    if takes_weight:
        # BN statistics / auxiliary losses must exclude the zero-weight
        # epoch-padding rows (GIN, DiffPool, Nested*)
        kwargs["sample_weight"] = batch["w"]
    # nested-subgraph node labels / resistance distance, when the dataset
    # carries them (NestedGraphDataset)
    if "z" in batch:
        kwargs["z"] = batch["z"]
    if "rd" in batch:
        kwargs["rd"] = batch["rd"]
    rngs = {"dropout": rng} if train else None
    args: Tuple = ()
    if adj_only:
        args = (batch["adj"],)
    elif needs_mask:
        args = (batch["x"], batch["adj"], batch["mask"])
        if needs_assign:
            args = args + (batch["assign"],)
    else:
        args = (batch["x"], batch["adj"])
    if train and mutable:
        return model.apply(variables, *args, mutable=["batch_stats"],
                           rngs=rngs, **kwargs)
    out = model.apply(variables, *args, rngs=rngs, **kwargs)
    return out, None


def build_generic_steps(model, optimizer, *, needs_mask: bool,
                        needs_assign: bool, adj_only: bool, aux_loss: bool,
                        takes_weight: bool, has_stats: bool):
    """Jitted (train_step, eval_batch) of the generic zoo trainer.

    Hoisted from the `cross_validation_generic` closure so the
    trajectory-parity test can drive the EXACT production step against a
    torch replica (same pattern as `snps_trainer.build_snps_steps`). Loss:
    plain NLL over the padded batch with zero-weight padding rows
    (parity `kernel/train_eval.py:278-314`); `aux_loss` adds DiffPool's
    link/entropy terms when opted in.
    """

    @jax.jit
    def train_step(variables, opt_state, batch, rng, lr_t):
        def loss_fn(params):
            vs = dict(variables)
            vs["params"] = params
            out, mut = _model_forward(model, vs, batch, True, rng,
                                      needs_mask, needs_assign, adj_only,
                                      has_stats, takes_weight)
            # DiffPool always returns (logp, link, ent); aux_loss only
            # decides whether the aux terms enter the objective (the
            # reference DISCARDS them, kernel/diff_pool.py:95,168)
            logp = out[0] if isinstance(out, tuple) else out
            loss = nll_loss(logp, batch["y"], batch["w"])
            if aux_loss:
                loss = loss + out[1] + out[2]
            return loss, mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        updates, new_opt = optimizer.update(grads, opt_state,
                                            variables["params"])
        updates = jax.tree_util.tree_map(lambda u: -lr_t * u, updates)
        params = optax.apply_updates(variables["params"], updates)
        new_vars = {"params": params}
        if has_stats:
            new_vars["batch_stats"] = (mut or variables)["batch_stats"]
        return new_vars, new_opt, loss

    @jax.jit
    def eval_batch(variables, batch):
        out, _ = _model_forward(model, variables, batch, False, None,
                                needs_mask, needs_assign, adj_only, False,
                                takes_weight)
        logp = out[0] if isinstance(out, tuple) else out
        loss = nll_loss(logp, batch["y"], batch["w"])
        pred = jnp.argmax(logp, -1)
        correct = jnp.sum((pred == batch["y"]) * batch["w"])
        return loss * jnp.sum(batch["w"]), correct

    return train_step, eval_batch


def cross_validation_generic(dataset: GraphDataset, model, *,
                             folds: int = 5, epochs: int = 50,
                             batch_size: int = 32, lr: float = 1e-3,
                             lr_decay_factor: float = 0.5,
                             lr_decay_step_size: int = 50,
                             weight_decay: float = 0.0, seed: int = 1000,
                             no_val: bool = False,
                             needs_mask: bool = True,
                             needs_assign: bool = False,
                             adj_only: bool = False,
                             aux_loss: bool = False,
                             takes_weight: bool = False,
                             record_dir: Optional[str] = None,
                             record_tag: str = "",
                             resume: bool = False,
                             verbose: bool = False) -> GenericCVResult:
    """Run k-fold CV of a baseline model over a dense padded GraphDataset.

    `record_dir` + `resume`: same interrupted-experiment contract as
    `cv.cross_validation(resume=...)` — each completed fold writes an
    atomic `fold_result_generic_<tag>_fold_<k>.npz`, and `resume=True`
    restores saved folds instead of retraining. `record_tag` must identify
    the model + hyperparameter combo (the CLI uses
    `<model>_layers<L>_hidden<H>_h<h>`) so grid-search combos sharing a
    results dir cannot collide."""
    y_all = dataset.y
    extra_keys = [k for k in ("z", "rd")
                  if getattr(dataset, k, None) is not None]
    splits = k_fold(y_all, folds, seed)
    b = batch_size

    def pad(arr, total):
        p = [(0, total - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, p)

    # The reference decays the LR per-epoch per-fold (StepLR). Expressing the
    # schedule in optimizer steps would tie it to one fold's steps_per_epoch
    # (folds can differ by a batch multiple), so instead the current LR is an
    # explicit step argument computed host-side: lr * factor**(epoch // size).
    optimizer = adam_transform(weight_decay)

    has_stats = None
    accs = np.zeros((folds, epochs))
    val_losses = np.full((folds, epochs), np.inf)
    losses: List[float] = []
    train_step = eval_batch = None   # built after the first init (has_stats)

    def record_path(fold: int) -> str:
        return os.path.join(
            record_dir, f"fold_result_generic_{record_tag}_fold_{fold}.npz")

    # explicit ints + a fingerprint of the rest of the run identity (model
    # class + its flax fields, lr/decay/weight_decay, objective wiring) —
    # the record tag does not encode them (see records.config_fingerprint)
    want_meta = np.asarray(
        [epochs, folds, seed, batch_size, int(no_val),
         config_fingerprint(
             model_cls=type(model).__name__,
             model_fields=repr(model), lr=lr,
             lr_decay_factor=lr_decay_factor,
             lr_decay_step_size=lr_decay_step_size,
             weight_decay=weight_decay, needs_mask=needs_mask,
             needs_assign=needs_assign, adj_only=adj_only,
             aux_loss=aux_loss, takes_weight=takes_weight)], np.int64)
    done_folds = {}
    if resume and record_dir is not None:
        for f in range(folds):
            path = record_path(f)
            if not os.path.exists(path):
                continue
            try:
                with np.load(path) as zf:
                    if not np.array_equal(zf["meta"], want_meta):
                        print(f"[resume] {path} was written by a different "
                              f"config; retraining fold {f}")
                        continue
                    done_folds[f] = {k: zf[k] for k in zf.files}
            except Exception as e:
                print(f"[resume] ignoring unreadable {path} ({e}); "
                      f"retraining fold {f}")

    for fold, (train_idx, test_idx, val_idx) in enumerate(splits):
        if fold in done_folds:
            d = done_folds[fold]
            accs[fold] = d["accs"]
            val_losses[fold] = d["val_losses"]
            losses.extend(d["losses"].tolist())
            print(f"[resume] fold {fold} restored from "
                  f"{record_path(fold)} (training skipped)")
            continue
        if no_val:
            train_idx = np.concatenate([train_idx, val_idx])
        rng = jax.random.PRNGKey(seed + fold)
        init_rng, rng = jax.random.split(rng)
        dummy = {k: jnp.asarray(v[:b]) for k, v in
                 dict(x=dataset.x, adj=dataset.adj, mask=dataset.mask,
                      assign=dataset.assign).items()}
        dummy["y"] = jnp.zeros((b,), jnp.int32)
        dummy["w"] = jnp.ones((b,), jnp.float32)
        if adj_only:
            variables = jax.jit(model.init)(init_rng, dummy["adj"])
        elif needs_mask and needs_assign:
            variables = jax.jit(model.init)(init_rng, dummy["x"], dummy["adj"],
                                            dummy["mask"], dummy["assign"])
        elif needs_mask:
            variables = jax.jit(model.init)(init_rng, dummy["x"], dummy["adj"],
                                            dummy["mask"])
        else:
            variables = jax.jit(model.init)(init_rng, dummy["x"], dummy["adj"])
        variables = dict(variables)
        if has_stats is None:
            has_stats = "batch_stats" in variables
            train_step, eval_batch = build_generic_steps(
                model, optimizer, needs_mask=needs_mask,
                needs_assign=needs_assign, adj_only=adj_only,
                aux_loss=aux_loss, takes_weight=takes_weight,
                has_stats=has_stats)
        # jitted init: eager optax init is one zeros_like device op PER
        # param leaf — serialized tunnel round trips on a remote backend
        # (same rationale as steps.TrainState.create)
        opt_state = jax.jit(optimizer.init)(variables["params"])
        host_rng = np.random.default_rng(seed * 31 + fold)

        def eval_set(idx):
            n_real = len(idx)
            total = -(-n_real // b) * b
            d = {
                "x": pad(dataset.x[idx], total),
                "adj": pad(dataset.adj[idx], total),
                "mask": pad(dataset.mask[idx], total),
                "assign": pad(dataset.assign[idx], total),
                "y": pad(dataset.y[idx].astype(np.int32), total),
                "w": np.concatenate([np.ones(n_real, np.float32),
                                     np.zeros(total - n_real, np.float32)]),
            }
            for k in extra_keys:
                d[k] = pad(getattr(dataset, k)[idx], total)
            return d, n_real, total

        te, n_te, total_te = eval_set(test_idx)
        if not no_val:
            va, n_va, total_va = eval_set(val_idx)

        for epoch in range(epochs):
            if no_val:
                idx = imbalanced_sample_indices(y_all[train_idx], host_rng)
                idx = train_idx[idx]
            else:
                idx = host_rng.permutation(train_idx)
            lr_t = steplr_host(lr, lr_decay_factor, lr_decay_step_size,
                               epoch)
            idx, w_epoch = pad_epoch_indices(idx, b)
            nb = len(idx) // b
            for i in range(nb):
                sel = idx[i * b:(i + 1) * b]
                batch = {
                    "x": jnp.asarray(dataset.x[sel]),
                    "adj": jnp.asarray(dataset.adj[sel]),
                    "mask": jnp.asarray(dataset.mask[sel]),
                    "assign": jnp.asarray(dataset.assign[sel]),
                    "y": jnp.asarray(dataset.y[sel].astype(np.int32)),
                    "w": jnp.asarray(w_epoch[i * b:(i + 1) * b]),
                }
                for k in extra_keys:
                    batch[k] = jnp.asarray(getattr(dataset, k)[sel])
                rng, srng = jax.random.split(rng)
                variables, opt_state, _ = train_step(variables, opt_state,
                                                     batch, srng,
                                                     jnp.float32(lr_t))
            def run_eval(data, total, n_real):
                correct = 0.0
                tot = 0.0
                for i in range(total // b):
                    s = slice(i * b, (i + 1) * b)
                    batch = {k: jnp.asarray(v[s]) for k, v in data.items()}
                    l, c = eval_batch(variables, batch)
                    correct += float(c)
                    tot += float(l)
                return tot / n_real, correct / n_real

            te_loss, te_acc = run_eval(te, total_te, n_te)
            accs[fold, epoch] = te_acc
            losses.append(te_loss)
            if not no_val:
                val_losses[fold, epoch], _ = run_eval(va, total_va, n_va)
            if verbose:
                print(f"fold {fold} epoch {epoch}: acc {accs[fold, epoch]:.3f}")

        if record_dir is not None:
            # atomic per-fold record for resume
            path = record_path(fold)
            tmp = path + ".tmp.npz"   # savez appends .npz when absent
            np.savez(tmp, accs=accs[fold], val_losses=val_losses[fold],
                     losses=np.asarray(losses[-epochs:], np.float64),
                     meta=want_meta)
            os.replace(tmp, path)

    if no_val:
        # reference without-val selection: max over epochs of fold-mean acc
        # (kernel/train_eval.py:203-228)
        acc_mean = accs.mean(axis=0)
        arg = int(acc_mean.argmax())
        best = float(acc_mean[arg])
        std = float(accs[:, arg].std(ddof=1) if folds > 1 else 0.0)
    else:
        # reference with-val selection: per fold, the test acc at the epoch
        # of minimum val loss; mean +/- std over folds
        # (kernel/train_eval.py:85-115)
        argmin = val_losses.argmin(axis=1)
        picked = accs[np.arange(folds), argmin]
        best = float(picked.mean())
        std = float(picked.std(ddof=1) if folds > 1 else 0.0)
    return GenericCVResult(
        best_acc=best, best_acc_std=std,
        accs=accs, mean_loss=float(np.mean(losses)))
