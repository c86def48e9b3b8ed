"""Jitted train / eval steps for the fused model.

Re-design of the reference hot loop (`train` / `eval_loss` / `eval_scores`,
`kernel/train_eval_sgcn_img_snps.py:511-670`):

  * The two forwards per step (plain + importance-masked,
    `train_eval_sgcn_img_snps.py:521-523`) are two `apply` calls inside ONE
    jitted program — XLA shares the parameter loads and fuses both graphs.
    Batch-stat updates thread sequentially (plain first, masked second),
    matching the torch execution order.
  * Batches are dense, fixed-shape, device-resident. Ragged final batches are
    expressed as a (B,) 0/1 `w` sample mask; every reduction (losses, batch
    norms) is mask-weighted so the math equals the reference's smaller final
    batch exactly.
  * One `lax.scan` runs the whole epoch without host sync (`make_epoch_fn`).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from iggcn_tpu.config import ModelConfig, TrainConfig
from iggcn_tpu.train import losses


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array            # completed REAL (non-padding) optimizer steps
    # Per-fold real steps per epoch, as DATA so the schedule stays exact when
    # folds of different sizes run vmapped side by side (fold-parallel).
    steps_per_epoch: jax.Array = ()

    @classmethod
    def create(cls, variables, optimizer, steps_per_epoch: int):
        # optimizer.init under jit: eager optax init issues one zeros_like
        # device op PER PARAM LEAF (~140 serialized tunnel round trips on a
        # remote backend); jitted it is one dispatch, cached per optimizer
        import numpy as np
        return cls(variables["params"], variables.get("batch_stats", {}),
                   jax.jit(optimizer.init)(variables["params"]),
                   np.zeros((), np.int32),
                   np.asarray(steps_per_epoch, np.int32))


Batch = Dict[str, jax.Array]
# batch keys: x (B,N,D), adj (B,N,N), snps (B,S), y (B,), clini (B,R),
#             clust_y (B,), tsne (B,F), w (B,)


def make_optimizer(tcfg: TrainConfig, steps_per_epoch: int = 0):
    """Adam transform WITHOUT the learning rate baked in.

    Parity target: `Adam(lr, weight_decay)` + manual per-epoch in-place decay
    (`kernel/train_eval_sgcn_img_snps.py:108,169-171`). The reference decays
    per EPOCH per FOLD; a step-indexed optax schedule would tie the decay to
    one fold's steps_per_epoch, so the LR is instead computed inside
    `make_train_step` from `TrainState.step // TrainState.steps_per_epoch`
    and applied by scaling the Adam updates. `steps_per_epoch` is accepted
    and ignored for call-site compatibility.

    torch.optim.Adam's weight_decay is COUPLED L2 (decay added to the
    gradients before the Adam transform), not AdamW's decoupled decay —
    reproduced by chaining add_decayed_weights in front of scale_by_adam.

    Measured negative (round 2): wrapping in optax.flatten (single-vector
    Adam, ~70 leaves collapsed) was equal-or-slower at every batch size on
    TPU — XLA already fuses the per-leaf scalar chains, and the ravel/unravel
    copies cost more than they save. Kept per-leaf.
    """
    return adam_transform(tcfg.weight_decay)


def adam_transform(weight_decay: float = 0.0):
    """The ONE Adam transform every trainer shares (coupled-L2, no baked-in
    LR) — `make_optimizer` for config-driven callers, this for the trainers
    that take a bare weight_decay float (generic_cv, snps_trainer). A single
    definition keeps the coupled-vs-decoupled decay semantics (and the
    measured per-leaf-vs-flatten decision above) from drifting between
    trainers — the trajectory-parity suite assumes they are identical."""
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay),
                           optax.scale_by_adam())
    return optax.scale_by_adam()


def steplr_host(lr: float, factor: float, step_size: int,
                epoch: int) -> float:
    """Host-side StepLR: lr * factor**(epoch // step_size) (0-indexed
    epoch). The python-loop trainers (generic_cv, snps_trainer) feed this to
    their jitted steps as an explicit argument; `lr_at_step` below is the
    traced equivalent for scan-based trainers."""
    if step_size <= 0:
        return lr
    return lr * factor ** (epoch // step_size)


def lr_at_step(tcfg: TrainConfig, step: jax.Array,
               steps_per_epoch: jax.Array) -> jax.Array:
    """StepLR-parity learning rate: x`lr_decay_factor` every
    `lr_decay_step_size` completed epochs (`step` counts completed real
    optimizer steps, so the first step of epoch 51 is already decayed —
    exactly the reference's end-of-epoch-50 in-place decay)."""
    if tcfg.lr_decay_step_size <= 0:
        return jnp.float32(tcfg.lr)
    epoch = step // jnp.maximum(steps_per_epoch, 1)
    k = epoch // tcfg.lr_decay_step_size
    return tcfg.lr * jnp.power(jnp.float32(tcfg.lr_decay_factor),
                               k.astype(jnp.float32))


def _dual_pass(model, params, batch_stats, x, adj, snps, *, train, rng, w):
    """Run the plain + importance-masked forwards as ONE vmapped apply.

    SURVEY §7.1: the reference's two forwards per step
    (`train_eval_sgcn_img_snps.py:521-523`) become a single forward vmapped
    over a mask axis of size 2 — XLA batches both passes' matmuls, cutting
    per-step op count nearly in half. Lane 0 = plain inputs, lane 1 =
    pre-masked inputs (identical math to `is_explain=True`, which masks
    then runs the plain path).

    BatchNorm sequential equivalence: the reference updates running stats in
    pass order (r1 = (1-m)r0 + m*s0, then r2 = (1-m)r1 + m*s1). Each vmap
    lane i computes L_i = (1-m)r0 + m*s_i from the SAME r0, so
    r2 = (1-m)*L0 + L1 - (1-m)*r0 — reconstructed exactly below. The
    reconstruction is momentum-DEPENDENT: it uses nn_compat.BN_MOMENTUM,
    which every stateful norm in this codebase (`nn_compat.BatchNorm1d`)
    shares; a model using a different momentum must not run under
    dual_pass_vmap.
    """
    from iggcn_tpu.models.nn_compat import BN_MOMENTUM
    from iggcn_tpu.ops.masking import importance_masks

    keep = 1.0 - BN_MOMENTUM

    masks = importance_masks(x, adj, params["prob"], params["prob_bias"],
                             snps, params["snps_prob"])
    xs = jnp.stack([x, masks.x_masked])
    adjs = jnp.stack([adj, masks.adj_masked])
    snpss = jnp.stack([snps, masks.snps_masked])
    kwargs = dict(train=train, sample_weight=w if train else None)
    if train:
        rngs2 = jax.random.split(rng, 2)

        def one_pass(xi, ai, si, ri):
            return model.apply({"params": params, "batch_stats": batch_stats},
                               xi, ai, si, mutable=["batch_stats"],
                               rngs={"dropout": ri}, raw_x=x, **kwargs)

        outs, muts = jax.vmap(one_pass)(xs, adjs, snpss, rngs2)
        lanes = muts["batch_stats"]
        new_stats = jax.tree_util.tree_map(
            lambda lane, r0: keep * lane[0] + lane[1] - keep * r0,
            lanes, batch_stats)
    else:
        def one_pass(xi, ai, si):
            return model.apply({"params": params, "batch_stats": batch_stats},
                               xi, ai, si, raw_x=x, **kwargs)

        outs = jax.vmap(one_pass)(xs, adjs, snpss)
        new_stats = batch_stats
    out = jax.tree_util.tree_map(lambda v: v[0], outs)
    out_prob = jax.tree_util.tree_map(lambda v: v[1], outs)
    return out, out_prob, new_stats


def fused_objective(model, params, batch_stats, batch: Batch,
                    mcfg: ModelConfig, tcfg: TrainConfig, *,
                    train: bool, rng: Optional[jax.Array] = None
                    ) -> Tuple[jax.Array, Dict[str, Any]]:
    """Full 7-term objective on one batch; returns (loss, aux).

    Parity: loss assembly at `kernel/train_eval_sgcn_img_snps.py:511-548`
    (train) == `:564-600` (eval).
    """
    lw, sw = tcfg.loss, tcfg.sparsity
    w = batch["w"]
    x, adj, snps = batch["x"], batch["adj"], batch["snps"]
    variables = {"params": params, "batch_stats": batch_stats}

    kwargs = dict(train=train, sample_weight=w if train else None)
    if tcfg.dual_pass_vmap:
        out, out_prob, new_stats = _dual_pass(
            model, params, batch_stats, x, adj, snps, train=train, rng=rng,
            w=w)
    elif train:
        r1, r2 = jax.random.split(rng)
        out, mut1 = model.apply(variables, x, adj, snps, mutable=["batch_stats"],
                                rngs={"dropout": r1}, **kwargs)
        variables = {"params": params, "batch_stats": mut1["batch_stats"]}
        out_prob, mut2 = model.apply(variables, x, adj, snps, is_explain=True,
                                     mutable=["batch_stats"],
                                     rngs={"dropout": r2}, **kwargs)
        new_stats = mut2["batch_stats"]
    else:
        out = model.apply(variables, x, adj, snps, **kwargs)
        out_prob = model.apply(variables, x, adj, snps, is_explain=True, **kwargs)
        new_stats = batch_stats

    y = batch["y"]
    loss_ce = lw.disease * losses.nll_loss(out.log_probs, y, w)
    loss_mi = lw.disease * losses.nll_loss(out_prob.log_probs, y, w)
    if lw.disease == 0:  # parity: `if lambda_loss[0]==0` guard (:541-542)
        loss_ce = 0.0
        loss_mi = 0.0

    clini = batch["clini"]
    loss_reg = lw.regr * (losses.mse_loss(out.our_reg, clini, w)
                          + losses.mse_loss(out_prob.our_reg, clini, w)) / 2

    loss_prob = lw.prob * losses.sparsity_loss(
        params["prob"], params["prob_bias"], params["snps_prob"],
        x, adj, sw, sample_weight=w)

    recon = lw.reco * (losses.recon_sum(out.snps_hat, snps, w)
                       + losses.recon_sum(out_prob.snps_hat, snps, w)) / 2

    if mcfg.is_soft_similarity:
        sim = losses.rbf_kernel(batch["tsne"], batch["tsne"], mcfg.rbf_gamma)
        cluster = lw.simi * (losses.consistency_loss(out.out_z, sim, w)
                             + losses.consistency_loss(out_prob.out_z, sim, w)) / 2
    else:
        ones = jnp.ones((y.shape[0], y.shape[0]), jnp.float32)
        cluster = 0.0
        for c in range(tcfg.num_cluster):
            member = w * (batch["clust_y"] == c)
            cluster += lw.simi * (
                losses.consistency_loss(out.out_z, ones, member)
                + losses.consistency_loss(out_prob.out_z, ones, member)) / 2

    orth = lw.orth * losses.orthogonal_loss(out.out_z, w)

    total = (sw.lamda_ce * loss_ce + sw.lamda_mi * loss_mi + loss_reg
             + loss_prob + recon + cluster + orth)
    aux = {"batch_stats": new_stats, "out": out, "out_prob": out_prob,
           "loss_terms": {"ce": loss_ce, "mi": loss_mi, "reg": loss_reg,
                          "prob": loss_prob, "recon": recon,
                          "cluster": cluster, "orth": orth}}
    return total, aux


class _SgcnImageOut(NamedTuple):
    log_probs: jax.Array


def sgcn_image_objective(model, params, batch_stats, batch: Batch,
                         mcfg: ModelConfig, tcfg: TrainConfig, *,
                         train: bool, rng: Optional[jax.Array] = None
                         ) -> Tuple[jax.Array, Dict[str, Any]]:
    """Image-only SGCN objective (no genetics branch).

    Parity: `kernel/train_eval_sgcn.py:296-313` — loss = lamda_ce*CE(plain)
    + loss_probability + lamda_mi*CE(masked). Drives the SGCNOri / SGCNImage
    family (`models/sgcn_image.py`); SNP/clinical inputs are ignored.
    """
    sw = tcfg.sparsity
    w = batch["w"]
    x, adj = batch["x"], batch["adj"]
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        r1, r2 = jax.random.split(rng)
        lp, mut1 = model.apply(variables, x, adj, train=True,
                               sample_weight=w,
                               mutable=["batch_stats"], rngs={"dropout": r1})
        variables = {"params": params,
                     "batch_stats": mut1.get("batch_stats", {})}
        lp_m, mut2 = model.apply(variables, x, adj, is_explain=True,
                                 train=True, sample_weight=w,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": r2})
        new_stats = mut2.get("batch_stats", {})
    else:
        lp = model.apply(variables, x, adj)
        lp_m = model.apply(variables, x, adj, is_explain=True)
        new_stats = batch_stats

    y = batch["y"]
    loss_ce = losses.nll_loss(lp, y, w)
    loss_mi = losses.nll_loss(lp_m, y, w)
    loss_prob = losses.sgcn_sparsity_loss(params["prob"], params["prob_bias"],
                                          x, adj, sw, sample_weight=w)
    total = sw.lamda_ce * loss_ce + loss_prob + sw.lamda_mi * loss_mi
    return total, {"batch_stats": new_stats, "out": _SgcnImageOut(lp),
                   "out_prob": _SgcnImageOut(lp_m)}


def gcn_fusion_objective(model, params, batch_stats, batch: Batch,
                         mcfg: ModelConfig, tcfg: TrainConfig, *,
                         train: bool, rng: Optional[jax.Array] = None
                         ) -> Tuple[jax.Array, Dict[str, Any]]:
    """GCN_IMGSNP objective: single forward, no importance terms.

    Parity: `kernel/train_eval_gcn_img_snps.py:448-483` — loss = lamda_ce*CE
    + regr-MSE + recon + consistency + orthogonality; the `lambda_loss[0]==0`
    guard also zeroes the orthogonal term there.
    """
    lw, sw = tcfg.loss, tcfg.sparsity
    w = batch["w"]
    x, adj, snps = batch["x"], batch["adj"], batch["snps"]
    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = dict(train=train, sample_weight=w if train else None)
    if train:
        out, mut = model.apply(variables, x, adj, snps, mutable=["batch_stats"],
                               rngs={"dropout": rng}, **kwargs)
        new_stats = mut["batch_stats"]
    else:
        out = model.apply(variables, x, adj, snps, **kwargs)
        new_stats = batch_stats

    loss_ce = lw.disease * losses.nll_loss(out.log_probs, batch["y"], w)
    loss_reg = lw.regr * losses.mse_loss(out.our_reg, batch["clini"], w)
    recon = lw.reco * losses.recon_sum(out.snps_hat, snps, w)
    if mcfg.is_soft_similarity:
        sim = losses.rbf_kernel(batch["tsne"], batch["tsne"], mcfg.rbf_gamma)
        cluster = lw.simi * losses.consistency_loss(out.out_z, sim, w)
    else:
        ones = jnp.ones((w.shape[0], w.shape[0]), jnp.float32)
        cluster = 0.0
        for c in range(tcfg.num_cluster):
            member = w * (batch["clust_y"] == c)
            cluster += lw.simi * losses.consistency_loss(out.out_z, ones, member)
    orth = lw.orth * losses.orthogonal_loss(out.out_z, w)
    if lw.disease == 0:
        loss_ce = 0.0
        orth = 0.0
    total = sw.lamda_ce * loss_ce + loss_reg + recon + cluster + orth
    return total, {"batch_stats": new_stats, "out": out, "out_prob": out}


def guide_objective(model, params, batch_stats, batch: Batch,
                    mcfg: ModelConfig, tcfg: TrainConfig, *,
                    train: bool, rng: Optional[jax.Array] = None,
                    prob_ref: float = 0.001, eps: float = 1e-10
                    ) -> Tuple[jax.Array, Dict[str, Any]]:
    """GUIDE_IMGSNP objective.

    Parity: `kernel/train_eval_guide_img_snps.py:450-489`. The positional
    lambda list maps here as: disease -> CE, regr -> regression MSE,
    prob -> SNP reconstruction, reco -> image surrogate reconstruction,
    simi -> Bernoulli-KL sparsity on the Gumbel keep-probabilities.
    """
    lw, sw = tcfg.loss, tcfg.sparsity
    w = batch["w"]
    x, adj, snps = batch["x"], batch["adj"], batch["snps"]
    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = dict(temperature=tcfg.temperature, train=train,
                  sample_weight=w if train else None)
    if train:
        r1, r2 = jax.random.split(rng)
        out, mut = model.apply(variables, x, adj, snps,
                               mutable=["batch_stats"],
                               rngs={"dropout": r1, "gumbel": r2}, **kwargs)
        new_stats = mut["batch_stats"]
    else:
        out = model.apply(variables, x, adj, snps, **kwargs)
        new_stats = batch_stats

    loss_ce = lw.disease * losses.nll_loss(out.log_probs, batch["y"], w)
    loss_reg = lw.regr * losses.mse_loss(out.our_reg, batch["clini"], w)
    recon = lw.prob * losses.recon_sum(out.snps_hat, snps, w)
    recon_img = lw.reco * losses.recon_sum(out.surrogate_img,
                                           out.surrogate_recon, w)
    rho_hat = out.imp_prob
    rho = prob_ref
    s1 = jnp.mean(rho_hat * (jnp.log(rho_hat + eps) - jnp.log(rho + eps)))
    s2 = jnp.mean((1 - rho_hat) * (jnp.log(1 - rho_hat + eps)
                                   - jnp.log(1 - rho + eps))) + s1
    sparsity = lw.simi * s2
    if lw.disease == 0:
        loss_ce = 0.0
    total = sw.lamda_ce * loss_ce + loss_reg + recon + recon_img + sparsity
    return total, {"batch_stats": new_stats, "out": out, "out_prob": out}


def clusterlabel_objective(model, params, batch_stats, batch: Batch,
                           mcfg: ModelConfig, tcfg: TrainConfig, *,
                           train: bool, rng: Optional[jax.Array] = None
                           ) -> Tuple[jax.Array, Dict[str, Any]]:
    """SGCN_GCN_CLUSTERLABEL objective.

    Parity: `kernel/train_eval_sgcn_clusterlabel.py:365-399`: averaged
    disease/cluster CE for both plain and masked passes + sparsity penalty +
    averaged SNP reconstruction; the consist term is computed but never added
    there (dead code), so it is omitted here. `loss.reco` is lambda0.
    """
    lw, sw = tcfg.loss, tcfg.sparsity
    w = batch["w"]
    x, adj, snps = batch["x"], batch["adj"], batch["snps"]
    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = dict(train=train, sample_weight=w if train else None)
    if train:
        r1, r2 = jax.random.split(rng)
        out, mut1 = model.apply(variables, x, adj, snps,
                                mutable=["batch_stats"],
                                rngs={"dropout": r1}, **kwargs)
        variables = {"params": params, "batch_stats": mut1["batch_stats"]}
        out_prob, mut2 = model.apply(variables, x, adj, snps, is_explain=True,
                                     mutable=["batch_stats"],
                                     rngs={"dropout": r2}, **kwargs)
        new_stats = mut2["batch_stats"]
    else:
        out = model.apply(variables, x, adj, snps, **kwargs)
        out_prob = model.apply(variables, x, adj, snps, is_explain=True,
                               **kwargs)
        new_stats = batch_stats

    y, cy = batch["y"], batch["clust_y"]
    ce = losses.nll_loss(out.log_probs, y, w)
    ce_c = losses.nll_loss(out.log_probs_cluster, cy, w)
    mi = losses.nll_loss(out_prob.log_probs, y, w)
    mi_c = losses.nll_loss(out_prob.log_probs_cluster, cy, w)
    loss_prob = losses.sparsity_loss(params["prob"], params["prob_bias"],
                                     params["snps_prob"], x, adj, sw,
                                     sample_weight=w)
    recon = lw.reco * (losses.recon_sum(out.snps_hat, snps, w)
                       + losses.recon_sum(out_prob.snps_hat, snps, w)) / 2
    if mcfg.is_predict_cluster:
        total = (sw.lamda_ce * (ce + ce_c) / 2 + sw.lamda_mi * (mi + mi_c) / 2
                 + loss_prob + recon)
    else:
        total = sw.lamda_ce * ce + sw.lamda_mi * mi + loss_prob + recon
    return total, {"batch_stats": new_stats, "out": out, "out_prob": out_prob}


OBJECTIVES = {
    "sgcn_imgsnp": fused_objective,
    "gcn_imgsnp": gcn_fusion_objective,
    "guide_imgsnp": guide_objective,
    "clusterlabel": clusterlabel_objective,
    "sgcn_image": sgcn_image_objective,
    "sgcn_ori": sgcn_image_objective,
}


def make_train_step(model, mcfg: ModelConfig, tcfg: TrainConfig, optimizer,
                    objective=fused_objective, *,
                    gate_padding: Optional[bool] = None):
    """One optimization step on one dense (possibly padded) batch.

    gate_padding: whether to no-op the update on whole all-padding batches
    (w == 0 everywhere). Such batches exist ONLY as fold-size equalization in
    fold-parallel mode (`pad_fold_data`); the data terms vanish under the w
    mask but the param-only sparsity penalties don't, so without the gate
    smaller folds would take extra Adam steps. The gate costs one select per
    param/opt-state leaf, so it is STATIC: defaults to `tcfg.fold_parallel`
    and is compiled out entirely in sequential mode (where all-padding
    batches cannot occur — epochs pad within-batch only).
    """
    if gate_padding is None:
        gate_padding = tcfg.fold_parallel

    def train_step(state: TrainState, batch: Batch, rng: jax.Array
                   ) -> Tuple[TrainState, jax.Array]:
        def loss_fn(params):
            return objective(model, params, state.batch_stats, batch,
                             mcfg, tcfg, train=True, rng=rng)

        if tcfg.remat:
            loss_fn = jax.checkpoint(loss_fn)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        lr_t = lr_at_step(tcfg, state.step, state.steps_per_epoch)
        updates = jax.tree_util.tree_map(lambda u: -lr_t * u, updates)
        params = optax.apply_updates(state.params, updates)
        batch_stats = aux["batch_stats"]
        if gate_padding:
            has_real = jnp.sum(batch["w"]) > 0

            def _keep(old, new):
                return jax.tree_util.tree_map(
                    lambda o, n: jnp.where(has_real, n, o), old, new)

            params = _keep(state.params, params)
            batch_stats = _keep(state.batch_stats, batch_stats)
            opt_state = _keep(state.opt_state, opt_state)
            step = state.step + has_real.astype(state.step.dtype)
        else:
            step = state.step + 1
        new_state = TrainState(params, batch_stats, opt_state, step,
                               state.steps_per_epoch)
        # reference train-loss bookkeeping: sum(loss * batch_size) / dataset
        return new_state, loss * jnp.sum(batch["w"])

    return train_step


def make_eval_step(model, mcfg: ModelConfig, tcfg: TrainConfig,
                   objective=fused_objective):
    """Eval on one batch: loss (all terms) + per-sample outputs for metrics.
    Optional model outputs (regression head, hidden dumps, cluster head) are
    included when the model provides them."""

    def eval_step(params, batch_stats, batch: Batch):
        loss, aux = objective(model, params, batch_stats, batch,
                              mcfg, tcfg, train=False)
        out = aux["out"]
        result = {
            "loss_sum": loss * jnp.sum(batch["w"]),
            "log_probs": out.log_probs,
            "pred": jnp.argmax(out.log_probs, axis=-1),
        }
        for field in ("our_reg", "out_lin", "linear_outf", "log_probs_cluster"):
            val = getattr(out, field, None)
            if val is not None:
                result[field] = val
        return result

    return eval_step
