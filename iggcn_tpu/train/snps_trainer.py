"""SNP-only GO-network classifier trainer.

Capability parity with `kernel/train_eval_snps.py` *as intended* — the
reference file is broken at import/arity level (missing `imbalanced_snps`
module, undefined `model` in the with-val variant, 3-way unpack of a 4-tuple;
SURVEY §2a) — divergences: we fix those bugs and train the working semantics:
BCE(sum) on the GO classification head + lambda0 * sum-MSE SNP reconstruction
(`train_eval_snps.py:298-335`), Adam + StepLR(50, 0.7) (`:164-165`),
imbalance-weighted resampling of the train split each epoch.
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from iggcn_tpu.data.go_graph import GoTopology
from iggcn_tpu.data.sampler import (imbalanced_sample_indices,
                                    pad_epoch_indices)
from iggcn_tpu.data.splits import k_fold
from iggcn_tpu.models.go_network import GeneOntologyNetwork
from iggcn_tpu.train import metrics
from iggcn_tpu.train.records import config_fingerprint
from iggcn_tpu.train.steps import adam_transform, steplr_host


def build_snps_steps(model, optimizer, lambda0: float, use_mlp: bool):
    """Jitted (train_step, eval_batch) for the SNP-only trainer.

    Module-level (rather than a closure inside `cross_validation_snps`) so
    the trajectory-parity test can drive the EXACT trainer semantics —
    loss assembly (BCE(sum) + lambda0 * sum-MSE recon,
    `kernel/train_eval_snps.py:298-335`), the two-apply train forward with
    independent dropout streams, and the explicit host-side LR argument —
    against the torch oracle, step for step.
    """

    def forward(params, batch_stats, x, w, train, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        if use_mlp:
            if train:
                y_hat = model.apply({"params": params}, x, train=True,
                                    rngs={"dropout": rng})
            else:
                y_hat = model.apply({"params": params}, x)
            return None, x, y_hat, batch_stats
        if train:
            # sample_weight keeps zero-weight (tail-padding) rows out of
            # every BatchNorm's batch statistics; the two applies draw
            # INDEPENDENT dropout keys (torch modules draw independently)
            r_enc, r_cls = jax.random.split(rng)
            (latent, x_hat, _), mut = model.apply(
                variables, x, train=True, rngs={"dropout": r_enc},
                sample_weight=w, mutable=["batch_stats"])
            y_hat, mut2 = model.apply(
                {"params": params, "batch_stats": mut["batch_stats"]},
                latent, x, train=True, rngs={"dropout": r_cls},
                sample_weight=w,
                method=GeneOntologyNetwork.classify, mutable=["batch_stats"])
            return latent, x_hat, y_hat, mut2["batch_stats"]
        latent, x_hat, _ = model.apply(variables, x)
        y_hat = model.apply(variables, latent, x,
                            method=GeneOntologyNetwork.classify)
        return latent, x_hat, y_hat, batch_stats

    def loss_fn(params, batch_stats, x, y, w, train, rng):
        _, x_hat, y_hat, new_stats = forward(params, batch_stats, x, w,
                                             train, rng)
        bce = -(y * jnp.log(jnp.clip(y_hat[:, 0], 1e-7, 1.0))
                + (1 - y) * jnp.log(jnp.clip(1 - y_hat[:, 0], 1e-7, 1.0)))
        class_loss = jnp.sum(bce * w)
        recon = lambda0 * jnp.sum(jnp.square(x_hat - x) * w[:, None])
        return class_loss + recon, (new_stats, y_hat)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y, w, rng, lr_t):
        (loss, (new_stats, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, x, y, w, True, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: -lr_t * u, updates)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    @jax.jit
    def eval_batch(params, batch_stats, x, y, w):
        loss, (_, y_hat) = loss_fn(params, batch_stats, x, y, w, False,
                                   jax.random.PRNGKey(0))
        pred = (y_hat[:, 0] > 0.5).astype(jnp.float32)
        correct = jnp.sum((pred == y) * w)
        return loss, correct, y_hat[:, 0]

    return train_step, eval_batch


@dataclasses.dataclass
class SnpsCVResult:
    accs: np.ndarray            # (folds, epochs)
    best_acc: float
    mean_loss: float
    # per-epoch [acc, auc, f1, sen, spe] per fold — the reference's
    # score_result_epoch surface (train_eval_snps.py:210,242-246)
    score_result: np.ndarray    # (folds, epochs, 5)
    best_acc_std: float = 0.0   # std across folds at the best mean epoch


def cross_validation_snps(snps: np.ndarray, labels: np.ndarray,
                          topo: GoTopology, *, folds: int = 5,
                          epochs: int = 100, batch_size: int = 32,
                          lr: float = 1e-3, lambda0: float = 1e-5,
                          seed: int = 1000, l_dim: int = 32,
                          n_l: int = 2, f_dim=(5, 5),
                          model_kind: str = "go",
                          result_path: str = None,
                          bundle_dir: str = None,
                          record_dir: str = None,
                          resume: bool = False,
                          verbose: bool = False) -> SnpsCVResult:
    """Binary SNP classification with the bare GO network + its head, or the
    plain MLP baseline (`model_kind='mlp'`, parity
    `kernel/train_eval_snps_baseline.py:298-324`: BCE only, no recon).

    `result_path`: optional npy path for the (folds, epochs, 5) score
    matrix (parity `train_eval_snps.py:243-246`).
    `bundle_dir`: optionally write a self-contained serving bundle
    (`tools/serve.save_bundle`) per fold at that fold's own best-accuracy
    epoch (per-fold argmax; the trainer has no val split, reference
    parity). Note the reported `best_acc` picks ONE epoch by
    mean-across-folds accuracy, so a fold's bundle may come from a
    different — at least as accurate for that fold — epoch than the
    reported surface.

    `record_dir` + `resume`: same interrupted-experiment contract as
    `cv.cross_validation(resume=...)` — each completed fold writes an
    atomic `fold_result_snps_<kind>_fold_<k>.npz` into `record_dir`, and
    `resume=True` restores saved folds (validated against
    epochs/folds/seed/batch_size/model_kind) instead of retraining."""
    labels = np.asarray(labels, np.float32).reshape(-1)
    use_mlp = model_kind == "mlp"
    if use_mlp:
        from iggcn_tpu.models.baselines import MLPModel
        model = MLPModel()
        lambda0 = 0.0
    else:
        model = GeneOntologyNetwork(topo=topo, in_f_dim=2, n_l=n_l,
                                    f_dim=f_dim, l_dim=l_dim)

    # StepLR(50, 0.7) parity: decay per EPOCH per FOLD — the LR is an
    # explicit train_step argument computed host-side, not a step-indexed
    # optax schedule (which would be tied to one fold's steps_per_epoch).
    optimizer = adam_transform()   # bare coupled-L2 Adam, shared def
    train_step, eval_batch = build_snps_steps(model, optimizer, lambda0,
                                              use_mlp)

    splits = k_fold(labels.astype(int), folds, seed)
    accs = np.zeros((folds, epochs))
    score_result = np.zeros((folds, epochs, 5))
    losses = []

    def record_path(fold: int) -> str:
        return os.path.join(
            record_dir, f"fold_result_snps_{model_kind}_fold_{fold}.npz")

    # explicit ints + a fingerprint of the remaining run identity (lr,
    # lambda0, GO dims — model_kind is checked separately below and already
    # names the record file)
    want_meta = np.asarray(
        [epochs, folds, seed, batch_size,
         config_fingerprint(lr=lr, lambda0=lambda0, l_dim=l_dim, n_l=n_l,
                            f_dim=tuple(f_dim))], np.int64)
    done_folds = {}
    if resume and record_dir is not None:
        for f in range(folds):
            path = record_path(f)
            if not os.path.exists(path):
                continue
            try:
                with np.load(path) as zf:
                    if (not np.array_equal(zf["meta"], want_meta)
                            or str(zf["model_kind"]) != model_kind):
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
            score_result[fold] = d["score_result_epoch"]
            accs[fold] = d["score_result_epoch"][:, 0]
            losses.extend(d["losses"].tolist())
            msg = (f"[resume] fold {fold} restored from "
                   f"{record_path(fold)} (training skipped)")
            print(msg)
            continue
        train_idx = np.concatenate([train_idx, val_idx])
        rng = jax.random.PRNGKey(seed + fold)
        init_rng, rng = jax.random.split(rng)
        if use_mlp:
            variables = jax.jit(model.init)(
                init_rng, jnp.zeros((batch_size, topo.num_snps)))
        else:
            def _init_all(mod, x):
                # trace encoder/decoder AND the classification head so every
                # param (incl. bn_cls) exists in the initialized variables
                latent, x_hat, _ = mod(x)
                return mod.classify(latent, x)

            variables = jax.jit(
                lambda r, x: model.init(r, x, method=_init_all))(
                    init_rng, jnp.zeros((batch_size, topo.num_snps)))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # jitted init: eager optax init dispatches one zeros_like per
        # param leaf (serialized round trips on a remote backend)
        opt_state = jax.jit(optimizer.init)(params)
        host_rng = np.random.default_rng(seed * 77 + fold)

        best_fold = (-1.0, None, None)   # (acc, params, batch_stats)
        x_tr, y_tr = snps[train_idx], labels[train_idx]
        x_te, y_te = snps[test_idx], labels[test_idx]
        # pad test once
        n_te = len(test_idx)
        pad_te = -(-n_te // batch_size) * batch_size - n_te
        x_te_p = np.pad(x_te, ((0, pad_te), (0, 0)))
        y_te_p = np.pad(y_te, (0, pad_te))
        w_te = np.concatenate([np.ones(n_te), np.zeros(pad_te)]).astype(np.float32)

        for epoch in range(epochs):
            idx = imbalanced_sample_indices(y_tr, host_rng)
            lr_t = jnp.float32(steplr_host(lr, 0.7, 50, epoch))
            idx, w_ep = pad_epoch_indices(idx, batch_size)
            nb = len(idx) // batch_size
            for i in range(nb):
                sel = idx[i * batch_size:(i + 1) * batch_size]
                rng, srng = jax.random.split(rng)
                params, batch_stats, opt_state, _ = train_step(
                    params, batch_stats, opt_state,
                    jnp.asarray(x_tr[sel]), jnp.asarray(y_tr[sel]),
                    jnp.asarray(w_ep[i * batch_size:(i + 1) * batch_size]),
                    srng, lr_t)
            tot_loss = 0.0
            probs = []
            for i in range(len(y_te_p) // batch_size):
                s = slice(i * batch_size, (i + 1) * batch_size)
                l, _, p = eval_batch(params, batch_stats,
                                     jnp.asarray(x_te_p[s]),
                                     jnp.asarray(y_te_p[s]),
                                     jnp.asarray(w_te[s]))
                probs.append(np.asarray(p))
                tot_loss += float(l)
            prob = np.concatenate(probs)[:n_te]
            pred = (prob > 0.5).astype(np.int64)
            cm = metrics.classification_metrics(y_te.astype(np.int64), pred,
                                                prob, 2)
            accs[fold, epoch] = cm["acc"]
            score_result[fold, epoch] = [cm["acc"], cm["auc"], cm["f1"],
                                         cm["sen"], cm["spe"]]
            losses.append(tot_loss / n_te)
            if bundle_dir is not None and cm["acc"] > best_fold[0]:
                # stash device references only; the host fetch happens once
                # at fold end inside save_bundle
                best_fold = (cm["acc"], params, batch_stats)
            if verbose:
                print(f"fold {fold} epoch {epoch}: acc {cm['acc']:.3f}, "
                      f"auc {cm['auc']:.3f}, f1 {cm['f1']:.3f}, "
                      f"sen {cm['sen']:.3f}, spe {cm['spe']:.3f}")

        if bundle_dir is not None and best_fold[1] is not None:
            from iggcn_tpu.tools.serve import save_bundle
            save_bundle(
                f"{bundle_dir}/serving_bundle_snps_{model_kind}_fold_{fold}.npz",
                model, best_fold[1], best_fold[2])

        if record_dir is not None:
            # atomic per-fold record for resume (losses slice = this fold's
            # per-epoch mean test losses, appended in fold order above)
            path = record_path(fold)
            tmp = path + ".tmp.npz"   # savez appends .npz when absent
            np.savez(tmp,
                     score_result_epoch=score_result[fold],
                     losses=np.asarray(losses[-epochs:], np.float64),
                     model_kind=np.asarray(model_kind),
                     meta=want_meta)
            os.replace(tmp, path)

    if result_path is not None:
        np.save(result_path, score_result)
    acc_mean = accs.mean(axis=0)
    argmax = int(acc_mean.argmax())
    std = float(accs[:, argmax].std(ddof=1)) if folds > 1 else 0.0
    return SnpsCVResult(accs=accs, best_acc=float(acc_mean[argmax]),
                        mean_loss=float(np.mean(losses)),
                        score_result=score_result, best_acc_std=std)
