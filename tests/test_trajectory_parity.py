"""Multi-step TRAINING-TRAJECTORY parity vs the torch oracle.

The logit-parity test (`test_torch_parity.py`) pins a single eval-mode
forward; the unit pins (`test_lr_schedule.py`, `test_dual_pass.py`) pin the
optimizer/schedule/BN pieces individually. This test is the end-to-end
guarantee over the whole hot loop: SIX real optimizer steps in both
frameworks from identical weights on identical data — same coupled-L2 Adam
(`steps.make_optimizer`, parity torch.optim.Adam(weight_decay=...) at
`kernel/train_eval_sgcn_img_snps.py:108`), same StepLR boundary crossings
(`steps.lr_at_step`, parity `:169-171`), same dual-pass BatchNorm
running-stat evolution (`steps._dual_pass`, parity the sequential
plain-then-masked forwards at `:521-523`), same full 7-term objective
(`:511-548`) — asserting the per-step loss trajectory and the final
parameters agree. Any drift in make_optimizer / lr_at_step / _dual_pass /
loss assembly semantics turns this red.

Dropout is zeroed on BOTH sides (framework PRNGs cannot be aligned);
everything else runs in true train mode, so BN batch statistics and their
running-stat updates are live and must match step over step.
"""
import jax
import numpy as np
import torch

from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
from iggcn_tpu.models.fused_sgcn import FusedSGCN
from iggcn_tpu.oracle.torch_losses import seven_term_loss
from iggcn_tpu.oracle.torch_ref import (TorchFused, iter_fused_param_pairs,
                                        load_fused_params)
from iggcn_tpu.train.steps import TrainState, make_optimizer, make_train_step

from tests.conftest import device_batch

STEPS = 6
B = 8
LR = 3e-3
WEIGHT_DECAY = 1e-2
# decay boundary every 2 epochs at 1 step/epoch: steps 0-1 at lr, 2-3 at
# lr/2, 4-5 at lr/4 — the trajectory crosses TWO StepLR boundaries
DECAY_EVERY = 2
FACTOR = 0.5


def test_six_step_training_trajectory_matches_torch(topo, cohort):
    lw = LossWeights(disease=1.0, regr=1.0, prob=0.5, reco=1.5e-6,
                     simi=0.1, orth=0.1)
    mcfg = ModelConfig(num_layers=2, hidden=16, dropout_lin=0.0,
                       dropout_regr=0.0, dropout_go=0.0, dropout_readout=0.0)
    tcfg = TrainConfig(epochs=STEPS, batch_size=B, lr=LR,
                       weight_decay=WEIGHT_DECAY, lr_decay_factor=FACTOR,
                       lr_decay_step_size=DECAY_EVERY, loss=lw)

    batch = device_batch(cohort, B)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    variables = jax.jit(model.init)(jax.random.PRNGKey(11), batch["x"],
                                    batch["adj"], batch["snps"])
    init_params = jax.device_get(variables["params"])

    optimizer = make_optimizer(tcfg)
    train_step = jax.jit(make_train_step(model, mcfg, tcfg, optimizer))
    # one full-cohort batch per epoch -> steps_per_epoch=1, so every
    # optimizer step IS an epoch and the StepLR boundaries land inside the
    # 6-step window
    state = TrainState.create(variables, optimizer, steps_per_epoch=1)

    losses_jax = []
    step1_stats = None
    rng = jax.random.PRNGKey(99)  # consumed by rate-0 dropout only
    for _ in range(STEPS):
        rng, erng = jax.random.split(rng)
        state, loss_sum = train_step(state, batch, erng)
        losses_jax.append(float(loss_sum) / B)
        if step1_stats is None:
            step1_stats = jax.device_get(state.batch_stats)
    final_params = jax.device_get(state.params)
    final_stats = jax.device_get(state.batch_stats)

    # ---- torch replica -------------------------------------------------
    tmodel = TorchFused(topo, num_layers=mcfg.num_layers, hidden=mcfg.hidden)
    load_fused_params(tmodel, init_params)
    tmodel.drop_lin = tmodel.drop_regr = 0.0
    tmodel.go.drop_gcn = tmodel.go.drop_readout = 0.0
    tmodel.train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=LR,
                           weight_decay=WEIGHT_DECAY)

    # np.array (copy) rather than np.asarray: jax arrays expose read-only
    # buffers and torch.from_numpy warns on non-writable memory
    x = torch.from_numpy(np.array(batch["x"]))
    adj = torch.from_numpy(np.array(batch["adj"]))
    snps = torch.from_numpy(np.array(batch["snps"]))
    y = torch.from_numpy(np.array(batch["y"])).long()
    clini = torch.from_numpy(np.array(batch["clini"]))
    tsne = torch.from_numpy(np.array(batch["tsne"]))

    losses_torch = []
    step1_stats_torch = None
    for epoch in range(1, STEPS + 1):
        opt.zero_grad()
        loss = seven_term_loss(tmodel, x, adj, snps, y, clini, tsne,
                                      lw)
        loss.backward()
        opt.step()
        losses_torch.append(float(loss.detach()))
        if step1_stats_torch is None:
            step1_stats_torch = {
                bn_name: (getattr(tmodel.go, bn_name).running_mean
                          .numpy().copy(),
                          getattr(tmodel.go, bn_name).running_var
                          .numpy().copy())
                for bn_name in ["bn_atten", "bn_b", "bn_b_d", "bn_latent1",
                                "bn_latent2"]}
        # reference in-place StepLR (train_eval_sgcn_img_snps.py:169-171)
        if epoch % DECAY_EVERY == 0:
            for g in opt.param_groups:
                g["lr"] = g["lr"] * FACTOR

    # ---- per-step loss trajectory --------------------------------------
    np.testing.assert_allclose(losses_jax, losses_torch, rtol=2e-4,
                               err_msg="per-step training losses diverged")
    # the trajectory must actually move (a frozen model would also "agree")
    assert abs(losses_jax[0] - losses_jax[-1]) > 1e-3

    # ---- final parameters ----------------------------------------------
    # Two leaves are GRADIENT-DEGENERATE and perform Adam-normalized noise
    # walks in BOTH frameworks (the same degeneracy exists in the reference's
    # torch run — it is a property of the model, not of this rebuild):
    #   * the key-projection slice of mha.in_proj_bias: a constant added to
    #     every key leaves the softmax over keys unchanged (logit shift per
    #     query), so its true gradient is identically zero and autodiff
    #     returns ~1e-8 float noise, which Adam's m/sqrt(v) normalization
    #     amplifies to full-lr steps of arbitrary sign;
    #   * the final decoder LayerNorm bias (go.g_b_d_{n_l-1}.b), whose only
    #     gradient path is the SNP-reconstruction term scaled by
    #     lambda_reco=1.5e-6.
    # For these, assert the Adam-walk BOUND (|delta| <= sum of step lrs) —
    # the walk cannot exceed it — instead of elementwise agreement.
    lr_walk = 1.5 * sum(LR * FACTOR ** (e // DECAY_EVERY)
                        for e in range(STEPS))
    e_dim = mcfg.jk_dim
    last_dec = f"go.g_b_d_{mcfg.go_n_l - 1}.b"
    for name, t, a in iter_fused_param_pairs(tmodel, final_params):
        a = np.asarray(a)
        tn = t.detach().numpy()
        if name == "mha.in_proj_bias":
            degenerate = np.zeros(a.shape, bool)
            degenerate[e_dim:2 * e_dim] = True  # key slice of (3e,) packing
            assert np.abs(a - tn)[degenerate].max() < lr_walk
            a, tn = a[~degenerate], tn[~degenerate]
        elif name == last_dec:
            assert np.abs(a - tn).max() < lr_walk
            continue
        np.testing.assert_allclose(
            a, tn, rtol=2e-3, atol=2.5e-4,
            err_msg=f"param {name} diverged after {STEPS} steps")

    # ---- BatchNorm running stats (dual-pass sequential reconstruction) --
    # Tight after STEP 1: momentum / biased-vs-unbiased-variance / dual-pass
    # sequencing semantics show undiluted there (any of them wrong is a
    # >=10% discrepancy; wrong momentum is O(1)). After 6 steps the stats
    # compound the params' chaotic drift quadratically (variance of drifting
    # activations), so the final check is loose — it guards against
    # runaway/NaN evolution, not elementwise agreement.
    for label, jstats, tstats, rtol in [
            ("step1", step1_stats["go_network"], step1_stats_torch, 2e-3),
            ("final", final_stats["go_network"],
             {bn_name: (getattr(tmodel.go, bn_name).running_mean.numpy(),
                        getattr(tmodel.go, bn_name).running_var.numpy())
              for bn_name in ["bn_atten", "bn_b", "bn_b_d", "bn_latent1",
                              "bn_latent2"]}, 0.1)]:
        for bn_name, (t_mean, t_var) in tstats.items():
            np.testing.assert_allclose(
                np.asarray(jstats[bn_name]["mean"]), t_mean,
                rtol=rtol, atol=1e-5,
                err_msg=f"{bn_name} running mean diverged ({label})")
            np.testing.assert_allclose(
                np.asarray(jstats[bn_name]["var"]), t_var,
                rtol=rtol, atol=1e-5,
                err_msg=f"{bn_name} running var diverged ({label})")
