"""Convergence-level A/B: a trainer family trained to convergence in BOTH
frameworks reaches the same model (`--family fused|guide`).

`tests/test_trajectory_parity.py` pins the hot loop's SEMANTICS over six
optimizer steps (coupled-L2 Adam, StepLR boundaries, dual-pass BN, full
7-term loss). This script upgrades that to the CONVERGENCE claim: train
the fused SGCNxGO flagship full-batch for hundreds of epochs from
identical weights on an identical planted-signal cohort in JAX and in the
independent torch derivation (`iggcn_tpu/oracle/{torch_ref,torch_losses}`,
built from `kernel/train_eval_sgcn_img_snps.py:108,169-171,511-548`), and
compare (a) the per-epoch loss trajectories, (b) the held-out test
accuracy/AUC, and (c) the per-subject predictions of the two final models.

Float trajectories in chaotic regimes eventually decorrelate (BN batch
stats + Adam compound rounding differences), so the CLAIM is statistical
agreement at convergence, not bitwise late-step equality: early-window
losses must agree tightly (semantics), final losses and held-out metrics
must agree (same learned model), and both must solve the planted task.

Usage:
    env JAX_PLATFORMS=cpu python scripts/convergence_ab.py [--epochs 300]

Prints a per-epoch checkpoint table and ONE final JSON summary line;
exit 1 when any agreement bound fails. `tests/test_convergence_ab.py`
runs a small configuration of the same harness in the suite.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_convergence_ab(*, family="fused", epochs=300, subjects=120, rois=30,
                       strength=1.25, seed=7, lr=5e-3, decay_every=100,
                       factor=0.5, weight_decay=1e-4, test_frac=0.25,
                       early_window=3, early_rtol=1e-3,
                       final_loss_rtol=0.05, acc_tol=0.0):
    """Train both frameworks; return the trajectories, held-out metrics and
    agreement verdicts. Dropout is zeroed on both sides (framework PRNGs
    cannot be aligned); everything else runs in true train mode.

    `family` selects the trainer family under test:
      * "fused" — the SGCNxGO flagship with the full 7-term objective
        (`kernel/train_eval_sgcn_img_snps.py:511-548`);
      * "guide" — the Gumbel-ST guided-autoencoder family in its
        deterministic gumbel_zero parity mode
        (`kernel/train_eval_guide_img_snps.py:450-489`);
      * "sgcn" — the image-only SGCN family (SGCN_GCN), dual-pass
        CE + sparsity penalty, no genetics branch
        (`kernel/train_eval_sgcn.py:296-313`).
    """
    import jax
    import jax.numpy as jnp
    import torch

    from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
    from iggcn_tpu.data.adni import synthetic_cohort
    from iggcn_tpu.data.batching import cohort_batch_arrays
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.clusterlabel import ClusterLabelSGCN
    from iggcn_tpu.models.fused_sgcn import FusedSGCN
    from iggcn_tpu.models.guide import GuideImgSnp
    from iggcn_tpu.models.sgcn_image import SGCNImage
    from iggcn_tpu.oracle.torch_losses import (clusterlabel_loss,
                                               gcn_fusion_loss, guide_loss,
                                               seven_term_loss,
                                               sgcn_image_loss)
    from iggcn_tpu.oracle.torch_ref import (TorchClusterLabel, TorchFused,
                                            TorchGuide, TorchSgcnImage,
                                            load_clusterlabel_params,
                                            load_fused_params,
                                            load_guide_params,
                                            load_sgcn_image_params)
    from iggcn_tpu.train.metrics import roc_auc_binary
    from iggcn_tpu.train.steps import (TrainState, clusterlabel_objective,
                                       gcn_fusion_objective, guide_objective,
                                       make_eval_step, make_optimizer,
                                       make_train_step, sgcn_image_objective)

    rng = np.random.default_rng(seed)
    topo = synthetic_topology(rng)
    conn = (topo.go_snps != 0).sum(axis=0)
    planted_snps = [int(i) for i in np.argsort(-conn)[:3]]
    planted_rois = [3, 11, 19, 26]
    cohort = synthetic_cohort(rng, num_subjects=subjects, rois=rois,
                              planted_rois=planted_rois,
                              planted_snps=planted_snps,
                              planted_strength=strength)

    # deterministic stratified split: round-robin within each class
    order = np.concatenate([np.flatnonzero(cohort.y == c)
                            for c in np.unique(cohort.y)])
    n_test = max(2, int(round(subjects * test_frac)))
    test_idx = order[::int(np.ceil(len(order) / n_test))][:n_test]
    train_idx = np.setdiff1d(np.arange(subjects), test_idx)

    if family == "snps":
        return _run_snps_ab(cohort, topo, train_idx, test_idx,
                            epochs=epochs, subjects=subjects, lr=lr,
                            decay_every=decay_every, factor=factor,
                            early_window=early_window,
                            early_rtol=early_rtol,
                            final_loss_rtol=final_loss_rtol,
                            acc_tol=acc_tol)
    if family == "zoo":
        return _run_zoo_ab(cohort, train_idx, test_idx, epochs=epochs,
                           subjects=subjects, lr=lr,
                           decay_every=decay_every, factor=factor,
                           early_window=early_window,
                           early_rtol=early_rtol,
                           final_loss_rtol=final_loss_rtol,
                           acc_tol=acc_tol)

    arrays = cohort_batch_arrays(cohort)
    arrays.pop("sbj_id")

    def subset(idx):
        b = {k: jnp.asarray(v[idx]) for k, v in arrays.items()}
        b["w"] = jnp.ones((len(idx),), jnp.float32)
        return b

    train_b, test_b = subset(train_idx), subset(test_idx)
    n_train = len(train_idx)

    zero_drop = dict(dropout_lin=0.0, dropout_regr=0.0, dropout_go=0.0,
                     dropout_readout=0.0)
    if family in ("fused", "gcn"):
        lw = LossWeights(disease=1.0, regr=1.0, prob=0.5, reco=1.5e-6,
                         simi=0.1, orth=0.1)
        mcfg = ModelConfig(num_layers=2, hidden=8, rois=rois,
                           hidden_linear=32, **zero_drop)
    elif family == "guide":
        # the guide trainer's positional lambda list: prob -> SNP recon,
        # reco -> image surrogate recon, simi -> Bernoulli-KL sparsity
        lw = LossWeights(disease=1.0, regr=1.0, prob=1e-4, reco=1e-3,
                         simi=0.1, orth=0.0)
        mcfg = ModelConfig(num_layers=2, hidden=16, rois=rois, **zero_drop)
    elif family == "cluster":
        lw = LossWeights(disease=1.0, regr=0.0, prob=0.5, reco=1.5e-6,
                         simi=0.0, orth=0.0)
        mcfg = ModelConfig(num_layers=2, hidden=8, rois=rois,
                           hidden_linear=32, is_predict_cluster=True,
                           **zero_drop)
    elif family == "sgcn":
        # image-only: the objective reads only tcfg.sparsity (defaults
        # lamda_ce = lamda_mi = 1, the reference's sgcn_hyperparameters)
        lw = LossWeights(disease=1.0)
        mcfg = ModelConfig(num_layers=2, hidden=16, rois=rois, **zero_drop)
    else:
        raise ValueError(f"unknown family {family!r}")
    tcfg = TrainConfig(epochs=epochs, batch_size=n_train, lr=lr,
                       weight_decay=weight_decay, lr_decay_factor=factor,
                       lr_decay_step_size=decay_every, loss=lw)
    objective = {"fused": None, "gcn": gcn_fusion_objective,
                 "guide": guide_objective,
                 "cluster": clusterlabel_objective,
                 "sgcn": sgcn_image_objective}[family]

    # ---- JAX ------------------------------------------------------------
    if family == "guide":
        model = GuideImgSnp(cfg=mcfg, topo=topo, gumbel_zero=True)
    elif family == "cluster":
        model = ClusterLabelSGCN(cfg=mcfg, topo=topo)
    elif family == "sgcn":
        model = SGCNImage(num_layers=mcfg.num_layers, hidden=mcfg.hidden,
                          rois=rois, dropout_lin=0.0)
    else:
        model = FusedSGCN(cfg=mcfg, topo=topo)
    if family == "sgcn":   # no genetics branch
        variables = jax.jit(model.init)(jax.random.PRNGKey(11),
                                        train_b["x"], train_b["adj"])
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(11), train_b["x"],
                                        train_b["adj"], train_b["snps"])
    init_params = jax.device_get(variables["params"])
    optimizer = make_optimizer(tcfg)
    step_fn = (make_train_step(model, mcfg, tcfg, optimizer, objective)
               if objective is not None
               else make_train_step(model, mcfg, tcfg, optimizer))

    @jax.jit
    def run(state, batch, key):
        def body(carry, _):
            st, r = carry
            r, er = jax.random.split(r)
            st, loss_sum = step_fn(st, batch, er)
            return (st, r), loss_sum

        (state, _), losses = jax.lax.scan(body, (state, key), None,
                                          length=epochs)
        return state, losses

    state = TrainState.create(variables, optimizer, steps_per_epoch=1)
    state, losses = run(state, train_b, jax.random.PRNGKey(2))
    losses_jax = np.asarray(losses) / n_train

    eval_step = jax.jit(make_eval_step(model, mcfg, tcfg, objective)
                        if objective is not None
                        else make_eval_step(model, mcfg, tcfg))
    ev = jax.device_get(eval_step(state.params, state.batch_stats, test_b))
    y_test = np.asarray(arrays["y"][test_idx])
    pred_jax = np.asarray(ev["pred"])
    prob_jax = np.exp(np.asarray(ev["log_probs"]))[:, 1]
    acc_jax = float(np.mean(pred_jax == y_test))
    auc_jax = roc_auc_binary(y_test, prob_jax)

    # ---- torch (independent derivation) ----------------------------------
    if family == "guide":
        tmodel = TorchGuide(topo, go_hidden=mcfg.hidden, rois=rois,
                            gumbel_zero=True)
        load_guide_params(tmodel, init_params)
        tmodel.drop_enc = tmodel.drop_dec = 0.0
        tmodel.drop_lin = tmodel.drop_regr = 0.0
    elif family == "cluster":
        tmodel = TorchClusterLabel(topo, num_layers=mcfg.num_layers,
                                   hidden=mcfg.hidden, rois=rois,
                                   hidden_linear=mcfg.hidden_linear)
        load_clusterlabel_params(tmodel, init_params)
        tmodel.drop_head = 0.0
    elif family == "sgcn":
        tmodel = TorchSgcnImage(num_layers=mcfg.num_layers,
                                hidden=mcfg.hidden, rois=rois)
        load_sgcn_image_params(tmodel, init_params)
        tmodel.drop = 0.0
    else:
        tmodel = TorchFused(topo, num_layers=mcfg.num_layers,
                            hidden=mcfg.hidden, rois=rois,
                            hidden_linear=mcfg.hidden_linear)
        load_fused_params(tmodel, init_params)
        tmodel.drop_lin = tmodel.drop_regr = 0.0
    if family != "sgcn":   # image-only model has no GO branch
        tmodel.go.drop_gcn = tmodel.go.drop_readout = 0.0
    tmodel.train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=lr,
                           weight_decay=weight_decay)

    tt = {k: torch.from_numpy(np.array(arrays[k][train_idx]))
          for k in ("x", "adj", "snps", "clini", "tsne")}
    ty = torch.from_numpy(np.array(arrays["y"][train_idx])).long()
    tcy = torch.from_numpy(np.array(arrays["clust_y"][train_idx])).long()

    losses_torch = []
    for epoch in range(1, epochs + 1):
        opt.zero_grad()
        if family == "guide":
            loss = guide_loss(tmodel, tt["x"], tt["adj"], tt["snps"], ty,
                              tt["clini"], lw, temperature=tcfg.temperature)
        elif family == "gcn":
            loss = gcn_fusion_loss(tmodel, tt["x"], tt["adj"], tt["snps"],
                                   ty, tt["clini"], tt["tsne"], lw)
        elif family == "cluster":
            loss = clusterlabel_loss(tmodel, tt["x"], tt["adj"], tt["snps"],
                                     ty, tcy, lw)
        elif family == "sgcn":
            loss = sgcn_image_loss(tmodel, tt["x"], tt["adj"], ty)
        else:
            loss = seven_term_loss(tmodel, tt["x"], tt["adj"], tt["snps"],
                                   ty, tt["clini"], tt["tsne"], lw)
        loss.backward()
        opt.step()
        losses_torch.append(float(loss.detach()))
        # reference in-place StepLR (train_eval_sgcn_img_snps.py:169-171)
        if decay_every and epoch % decay_every == 0:
            for g in opt.param_groups:
                g["lr"] = g["lr"] * factor
    losses_torch = np.asarray(losses_torch)

    tmodel.eval()
    with torch.no_grad():
        te_x = torch.from_numpy(np.array(arrays["x"][test_idx]))
        te_adj = torch.from_numpy(np.array(arrays["adj"][test_idx]))
        if family == "sgcn":
            tout = (tmodel(te_x, te_adj),)
        else:
            tout = tmodel(
                te_x, te_adj,
                torch.from_numpy(np.array(arrays["snps"][test_idx])))
    log_probs_t = tout[0].numpy()
    pred_torch = log_probs_t.argmax(axis=1)
    acc_torch = float(np.mean(pred_torch == y_test))
    auc_torch = roc_auc_binary(y_test, np.exp(log_probs_t)[:, 1])

    return _verdict(family, epochs, subjects, n_train, len(test_idx),
                    losses_jax, losses_torch, pred_jax, pred_torch,
                    acc_jax, acc_torch, auc_jax, auc_torch,
                    early_window, early_rtol, final_loss_rtol, acc_tol)


def _run_snps_ab(cohort, topo, train_idx, test_idx, *, epochs, subjects,
                 lr, decay_every, factor, early_window, early_rtol,
                 final_loss_rtol, acc_tol, lambda0=1e-5):
    """The SNP-only GO classifier family (`--model Gene_ontology_network`):
    BCE(sum) + lambda0 * sum-MSE recon via the exact production step
    (`snps_trainer.build_snps_steps`) vs `oracle.torch_losses.snps_bce_loss`
    on a `TorchGoClassifier` replica — the same pairing the 6-step
    trajectory test pins (`tests/test_trajectory_parity_snps.py`), trained
    to convergence. The loss series are per-run SUMS (identical batch on
    both sides), so relative comparisons carry over unchanged."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from iggcn_tpu.models.go_network import GeneOntologyNetwork
    from iggcn_tpu.oracle.torch_losses import snps_bce_loss
    from iggcn_tpu.oracle.torch_ref import (TorchGoClassifier,
                                            load_go_classifier_params)
    from iggcn_tpu.train.metrics import roc_auc_binary
    from iggcn_tpu.train.snps_trainer import build_snps_steps
    from iggcn_tpu.train.steps import steplr_host

    y_all = (np.asarray(cohort.y) > 0).astype(np.float32)
    snps_all = np.asarray(cohort.snps, np.float32)
    x_tr = jnp.asarray(snps_all[train_idx])
    y_tr = jnp.asarray(y_all[train_idx])
    n_train = len(train_idx)
    w = jnp.ones((n_train,), jnp.float32)

    # ---- JAX (exact production step) -------------------------------------
    model = GeneOntologyNetwork(topo=topo, dropout_gcn=0.0,
                                dropout_readout=0.0, dropout_cls=(0.0, 0.0))

    def _init_all(mod, x):
        latent, _, _ = mod(x)
        return mod.classify(latent, x)

    variables = jax.jit(lambda r, x: model.init(r, x, method=_init_all))(
        jax.random.PRNGKey(11), x_tr)
    init_params = jax.device_get(variables["params"])
    optimizer = optax.scale_by_adam(b1=0.9, b2=0.999)
    train_step, eval_batch = build_snps_steps(model, optimizer, lambda0,
                                              use_mlp=False)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(2)
    losses_jax = []
    for epoch in range(epochs):
        lr_t = jnp.float32(steplr_host(lr, factor, decay_every, epoch))
        rng, srng = jax.random.split(rng)
        params, stats, opt_state, loss = train_step(
            params, stats, opt_state, x_tr, y_tr, w, srng, lr_t)
        losses_jax.append(float(loss))
    losses_jax = np.asarray(losses_jax)

    x_te = jnp.asarray(snps_all[test_idx])
    y_te = jnp.asarray(y_all[test_idx])
    w_te = jnp.ones((len(test_idx),), jnp.float32)
    _, _, prob = eval_batch(params, stats, x_te, y_te, w_te)
    prob_jax = np.asarray(prob)
    pred_jax = (prob_jax > 0.5).astype(int)
    acc_jax = float(np.mean(pred_jax == y_all[test_idx]))
    auc_jax = roc_auc_binary(y_all[test_idx], prob_jax)

    # ---- torch (independent derivation) ----------------------------------
    tm = TorchGoClassifier(topo)
    load_go_classifier_params(tm, init_params)
    tm.go.drop_gcn = tm.go.drop_readout = 0.0
    tm.drop_cls = (0.0, 0.0)
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    x_t = torch.from_numpy(snps_all[train_idx].copy())
    y_t = torch.from_numpy(y_all[train_idx].copy())
    losses_torch = []
    for epoch in range(epochs):
        for g in opt.param_groups:    # host-side StepLR, trainer parity
            g["lr"] = steplr_host(lr, factor, decay_every, epoch)
        opt.zero_grad()
        loss = snps_bce_loss(tm, x_t, y_t, lambda0)
        loss.backward()
        opt.step()
        losses_torch.append(float(loss.detach()))
    losses_torch = np.asarray(losses_torch)

    tm.eval()
    with torch.no_grad():
        _, _, y_hat_t = tm(torch.from_numpy(snps_all[test_idx].copy()))
    prob_t = y_hat_t[:, 0].numpy()
    pred_torch = (prob_t > 0.5).astype(int)
    acc_torch = float(np.mean(pred_torch == y_all[test_idx]))
    auc_torch = roc_auc_binary(y_all[test_idx], prob_t)

    return _verdict("snps", epochs, subjects, n_train, len(test_idx),
                    losses_jax, losses_torch, pred_jax, pred_torch,
                    acc_jax, acc_torch, auc_jax, auc_torch,
                    early_window, early_rtol, final_loss_rtol, acc_tol)


def _run_zoo_ab(cohort, train_idx, test_idx, *, epochs, subjects, lr,
                decay_every, factor, early_window, early_rtol,
                final_loss_rtol, acc_tol):
    """The generic zoo trainer family (`kernel/train_eval.py:278-314`,
    plain NLL) on the GCNFlat baseline, via the exact production step
    (`generic_cv.build_generic_steps` — the same pairing the 6-step
    trajectory test pins) vs a torch replica, trained to convergence.
    GCNFlat has no BatchNorm, so the trajectories never enter the chaotic
    regime and track tightly end to end."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch
    import torch.nn.functional as F

    from iggcn_tpu.models.baselines import GCNFlat
    from iggcn_tpu.oracle.torch_ref import (TorchGcnFlat,
                                            load_gcn_flat_params)
    from iggcn_tpu.train.generic_cv import build_generic_steps
    from iggcn_tpu.train.metrics import roc_auc_binary
    from iggcn_tpu.train.steps import steplr_host

    x_all = np.asarray(cohort.x, np.float32)
    adj_all = np.asarray(cohort.adj, np.float32)
    y_all = np.asarray(cohort.y)
    n_train = len(train_idx)
    batch = {"x": jnp.asarray(x_all[train_idx]),
             "adj": jnp.asarray(adj_all[train_idx]),
             "y": jnp.asarray(y_all[train_idx]),
             "w": jnp.ones((n_train,), jnp.float32)}

    # ---- JAX (exact production step) -------------------------------------
    model = GCNFlat(num_layers=2, hidden=16, dropout_lin=0.0)
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(11), batch["x"],
                                         batch["adj"]))
    init_params = jax.device_get(variables["params"])
    optimizer = optax.scale_by_adam(b1=0.9, b2=0.999)
    train_step, _ = build_generic_steps(
        model, optimizer, needs_mask=False, needs_assign=False,
        adj_only=False, aux_loss=False, takes_weight=False, has_stats=False)
    opt_state = optimizer.init(variables["params"])
    rng = jax.random.PRNGKey(2)
    losses_jax = []
    for epoch in range(epochs):
        lr_t = jnp.float32(steplr_host(lr, factor, decay_every, epoch))
        rng, srng = jax.random.split(rng)
        variables, opt_state, loss = train_step(variables, opt_state, batch,
                                                srng, lr_t)
        losses_jax.append(float(loss))
    losses_jax = np.asarray(losses_jax)

    logp = jax.jit(model.apply)(variables, jnp.asarray(x_all[test_idx]),
                                jnp.asarray(adj_all[test_idx]))
    prob_jax = np.exp(np.asarray(logp))[:, 1]
    pred_jax = np.asarray(logp).argmax(axis=1)
    acc_jax = float(np.mean(pred_jax == y_all[test_idx]))
    auc_jax = roc_auc_binary(y_all[test_idx], prob_jax)

    # ---- torch (independent derivation) ----------------------------------
    tm = TorchGcnFlat(num_layers=2, hidden=16, rois=x_all.shape[1])
    load_gcn_flat_params(tm, init_params)
    tm.drop = 0.0
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    x_t = torch.from_numpy(x_all[train_idx].copy())
    adj_t = torch.from_numpy(adj_all[train_idx].copy())
    y_t = torch.from_numpy(y_all[train_idx].copy()).long()
    losses_torch = []
    for epoch in range(epochs):
        for g in opt.param_groups:    # host-side StepLR, trainer parity
            g["lr"] = steplr_host(lr, factor, decay_every, epoch)
        opt.zero_grad()
        loss = F.nll_loss(tm(x_t, adj_t), y_t)
        loss.backward()
        opt.step()
        losses_torch.append(float(loss.detach()))
    losses_torch = np.asarray(losses_torch)

    tm.eval()
    with torch.no_grad():
        logp_t = tm(torch.from_numpy(x_all[test_idx].copy()),
                    torch.from_numpy(adj_all[test_idx].copy())).numpy()
    pred_torch = logp_t.argmax(axis=1)
    acc_torch = float(np.mean(pred_torch == y_all[test_idx]))
    auc_torch = roc_auc_binary(y_all[test_idx], np.exp(logp_t)[:, 1])

    return _verdict("zoo", epochs, subjects, n_train, len(test_idx),
                    losses_jax, losses_torch, pred_jax, pred_torch,
                    acc_jax, acc_torch, auc_jax, auc_torch,
                    early_window, early_rtol, final_loss_rtol, acc_tol)


def _verdict(family, epochs, subjects, n_train, n_test, losses_jax,
             losses_torch, pred_jax, pred_torch, acc_jax, acc_torch,
             auc_jax, auc_torch, early_window, early_rtol,
             final_loss_rtol, acc_tol):
    """Shared agreement computation: early-window semantic agreement,
    final-loss agreement, held-out metric equality, and the learned check
    (loss halves in BOTH frameworks)."""
    import numpy as np

    w = min(early_window, epochs)
    early_rel = float(np.max(np.abs(losses_jax[:w] - losses_torch[:w])
                             / np.abs(losses_torch[:w])))
    final_rel = float(abs(losses_jax[-1] - losses_torch[-1])
                      / abs(losses_torch[-1]))
    pred_agree = float(np.mean(pred_jax == pred_torch))
    learned = bool(losses_jax[-1] < 0.5 * losses_jax[0]
                   and losses_torch[-1] < 0.5 * losses_torch[0])
    ok = (early_rel <= early_rtol and final_rel <= final_loss_rtol
          and abs(acc_jax - acc_torch) <= acc_tol and learned)
    return {
        "family": family,
        "epochs": epochs, "subjects": subjects, "n_train": n_train,
        "n_test": int(n_test),
        "losses_jax": losses_jax, "losses_torch": losses_torch,
        "early_window": w, "early_rel": early_rel, "final_rel": final_rel,
        "acc_jax": acc_jax, "acc_torch": acc_torch,
        "auc_jax": auc_jax, "auc_torch": auc_torch,
        "pred_agree": pred_agree, "learned": learned, "ok": ok,
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Convergence-level A/B of the fused flagship: JAX vs "
                    "the independent torch derivation, identical init/data, "
                    "held-out metrics compared at convergence")
    p.add_argument("--family",
                   choices=("fused", "gcn", "guide", "cluster", "snps",
                            "sgcn", "zoo"),
                   default="fused",
                   help="trainer family under test: the 7-term fused "
                        "flagship, the single-forward GCN fusion, the "
                        "Gumbel-ST guide family (deterministic gumbel_zero "
                        "parity mode), the cluster-label multitask family, "
                        "the SNP-only GO classifier, the image-only "
                        "SGCN (dual-pass CE + sparsity, no genetics "
                        "branch), or the generic zoo trainer (plain NLL "
                        "on the GCNFlat baseline)")
    p.add_argument("--epochs", type=int, default=300,
                   help="full-batch optimizer steps (one per epoch)")
    p.add_argument("--subjects", type=int, default=120,
                   help="planted-signal synthetic cohort size")
    p.add_argument("--seed", type=int, default=7, help="cohort/init seed")
    p.add_argument("--acc_tol", type=float, default=0.0,
                   help="allowed |test-acc(jax) - test-acc(torch)|")
    p.add_argument("--early_rtol", type=float, default=1e-3,
                   help="max relative loss difference over the first 3 "
                        "steps; the default is calibrated for exact-fp32 "
                        "CPU matmuls — on TPU the MXU's default matmul "
                        "precision moves step-0 losses by ~5e-4 already "
                        "(BASELINE.md records both), so pass ~2e-2 there "
                        "or run with JAX_DEFAULT_MATMUL_PRECISION=highest")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    r = run_convergence_ab(family=args.family, epochs=args.epochs,
                           subjects=args.subjects, seed=args.seed,
                           acc_tol=args.acc_tol, early_rtol=args.early_rtol)
    lj, lt = r["losses_jax"], r["losses_torch"]
    print("| epoch | loss_jax | loss_torch | rel_diff |")
    print("|---|---|---|---|")
    marks = sorted({0, 1, 2, r["early_window"] - 1,
                    *range(0, r["epochs"], max(1, r["epochs"] // 10)),
                    r["epochs"] - 1})
    for e in marks:
        rel = abs(lj[e] - lt[e]) / abs(lt[e])
        print(f"| {e} | {lj[e]:.6f} | {lt[e]:.6f} | {rel:.2e} |")
    summary = {k: r[k] for k in
               ("family",
                "epochs", "n_train", "n_test", "early_window", "early_rel",
                "final_rel", "acc_jax", "acc_torch", "auc_jax", "auc_torch",
                "pred_agree", "learned", "ok")}
    print(json.dumps(summary))
    return 0 if r["ok"] else 1


if __name__ == "__main__":
    from iggcn_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    sys.exit(main())
