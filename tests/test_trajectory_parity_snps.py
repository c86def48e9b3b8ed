"""Multi-step training-trajectory parity for the SNP-only GO trainer.

`test_trajectory_parity.py` pins the fused flagship's hot loop end-to-end;
this is the same guarantee for the second CLI-reachable training family
(`--model Gene_ontology_network`): SIX real optimizer steps of
`snps_trainer.build_snps_steps` — BCE(sum) + lambda0 * sum-MSE recon loss
(`kernel/train_eval_snps.py:298-335`), bare Adam with the host-side StepLR
argument (`:164-165`), two-apply train forward with live BatchNorm batch
stats — against an independent torch replica (`TorchGoClassifier`), from
identical weights on identical data, crossing two StepLR boundaries.
Asserts the per-step loss trajectory, the final parameters, and the
BatchNorm running-stat evolution (incl. the classify head's bn_cls).

Dropout is zeroed on BOTH sides (framework PRNGs cannot be aligned);
everything else runs in true train mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from iggcn_tpu.models.go_network import GeneOntologyNetwork
from iggcn_tpu.oracle.torch_losses import snps_bce_loss
from iggcn_tpu.oracle.torch_ref import (TorchGoClassifier,
                                        iter_go_classifier_param_pairs,
                                        load_go_classifier_params)
from iggcn_tpu.train.snps_trainer import build_snps_steps
from iggcn_tpu.train.steps import steplr_host

from tests.conftest import device_batch

STEPS = 6
B = 8
LR = 3e-3
LAMBDA0 = 1e-5   # reference recon weight (train_eval_snps.py). Raising it
                 # is tempting (stronger decoder gradients) but measured to
                 # DESTROY parity: the final decoder LayerNorm bias is a
                 # gradient-degenerate Adam noise-walk (see below), and a
                 # big lambda0 feeds its relu-pattern flips back into every
                 # other gradient at visible scale.
DECAY_EVERY = 2  # boundaries inside the 6-step window (steps are epochs)
FACTOR = 0.5

GO_BN = ["bn_atten", "bn_b", "bn_b_d", "bn_latent1", "bn_latent2"]


def _torch_bn_stats(tm):
    stats = {name: (getattr(tm.go, name).running_mean.numpy().copy(),
                    getattr(tm.go, name).running_var.numpy().copy())
             for name in GO_BN}
    stats["bn_cls"] = (tm.bn_cls.running_mean.numpy().copy(),
                       tm.bn_cls.running_var.numpy().copy())
    return stats


def test_six_step_snps_trajectory_matches_torch(topo, cohort):
    batch = device_batch(cohort, B)
    snps = jnp.asarray(batch["snps"])
    y = (jnp.asarray(batch["y"]) > 0).astype(jnp.float32)
    w = jnp.ones((B,), jnp.float32)

    model = GeneOntologyNetwork(topo=topo, dropout_gcn=0.0,
                                dropout_readout=0.0, dropout_cls=(0.0, 0.0))

    def _init_all(mod, x):
        latent, _, _ = mod(x)
        return mod.classify(latent, x)

    variables = jax.jit(lambda r, x: model.init(r, x, method=_init_all))(
        jax.random.PRNGKey(7), snps)
    init_params = jax.device_get(variables["params"])

    optimizer = optax.scale_by_adam(b1=0.9, b2=0.999)
    train_step, _ = build_snps_steps(model, optimizer, LAMBDA0, use_mlp=False)

    params = variables["params"]
    stats = variables["batch_stats"]
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(99)  # consumed by rate-0 dropout only
    losses_jax = []
    step1_stats = None
    for epoch in range(STEPS):
        lr_t = jnp.float32(steplr_host(LR, FACTOR, DECAY_EVERY, epoch))
        rng, srng = jax.random.split(rng)
        params, stats, opt_state, loss = train_step(
            params, stats, opt_state, snps, y, w, srng, lr_t)
        losses_jax.append(float(loss))
        if step1_stats is None:
            step1_stats = jax.device_get(stats)
    final_params = jax.device_get(params)
    final_stats = jax.device_get(stats)

    # ---- torch replica -------------------------------------------------
    tm = TorchGoClassifier(topo)
    load_go_classifier_params(tm, init_params)
    tm.go.drop_gcn = tm.go.drop_readout = 0.0
    tm.drop_cls = (0.0, 0.0)
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=LR)

    x_t = torch.from_numpy(np.asarray(snps).copy())
    y_t = torch.from_numpy(np.asarray(y).copy())

    losses_torch = []
    step1_stats_torch = None
    for epoch in range(STEPS):
        for g in opt.param_groups:   # host-side StepLR, trainer parity
            g["lr"] = steplr_host(LR, FACTOR, DECAY_EVERY, epoch)
        opt.zero_grad()
        loss = snps_bce_loss(tm, x_t, y_t, LAMBDA0)
        loss.backward()
        opt.step()
        losses_torch.append(float(loss.detach()))
        if step1_stats_torch is None:
            step1_stats_torch = _torch_bn_stats(tm)

    # ---- per-step loss trajectory --------------------------------------
    np.testing.assert_allclose(losses_jax, losses_torch, rtol=2e-4,
                               err_msg="per-step SNP training losses diverged")
    assert abs(losses_jax[0] - losses_jax[-1]) > 1e-3

    # ---- final parameters ----------------------------------------------
    # The final decoder LayerNorm bias is GRADIENT-DEGENERATE here exactly
    # as in the fused test: its shift is constant over the batch, so the
    # downstream BatchNorm (bn_b_d) cancels it and autodiff returns float
    # noise that Adam's m/sqrt(v) normalization amplifies to full-lr steps
    # of arbitrary sign. Assert the Adam-walk BOUND for it instead of
    # elementwise agreement. (bn_latent1/2 scales are analytically
    # degenerate too — bn_cls batch-normalizes them away — but their
    # measured walk stays under atol, so they keep the elementwise check.)
    lr_walk = 1.5 * sum(LR * FACTOR ** (e // DECAY_EVERY)
                        for e in range(STEPS))
    last_dec = f"go.g_b_d_{model.n_l - 1}.b"
    for name, t, a in iter_go_classifier_param_pairs(tm, final_params):
        a, tn = np.asarray(a), t.detach().numpy()
        if name == last_dec:
            assert np.abs(a - tn).max() < lr_walk, \
                f"{name} exceeded the Adam noise-walk bound"
            continue
        np.testing.assert_allclose(
            a, tn, rtol=2e-3, atol=2.5e-4,
            err_msg=f"param {name} diverged after {STEPS} steps")

    # ---- BatchNorm running stats ---------------------------------------
    # Tight after step 1 (momentum / unbiased-var / two-apply sequencing
    # show undiluted); loose at the end (stats compound the params' drift).
    for label, jstats, tstats, rtol in [
            ("step1", step1_stats, step1_stats_torch, 2e-3),
            ("final", final_stats, _torch_bn_stats(tm), 0.1)]:
        for bn_name, (t_mean, t_var) in tstats.items():
            np.testing.assert_allclose(
                np.asarray(jstats[bn_name]["mean"]), t_mean,
                rtol=rtol, atol=1e-5,
                err_msg=f"{bn_name} running mean diverged ({label})")
            np.testing.assert_allclose(
                np.asarray(jstats[bn_name]["var"]), t_var,
                rtol=rtol, atol=1e-5,
                err_msg=f"{bn_name} running var diverged ({label})")


def test_six_step_mlp_trajectory_matches_torch(cohort):
    """Same six-step guarantee for `build_snps_steps(use_mlp=True)` — the
    SNP MLP baseline trainer (`kernel/train_eval_snps_baseline.py` as
    intended): BCE(sum) only (the MLP forward has no recon), bare Adam,
    host-side StepLR. No BatchNorm and no degenerate leaves, so EVERY
    parameter is held elementwise."""
    from iggcn_tpu.models.baselines import MLPModel
    from iggcn_tpu.oracle.torch_ref import (TorchSnpMLP,
                                            iter_snp_mlp_param_pairs,
                                            load_snp_mlp_params)

    batch = device_batch(cohort, B)
    snps = jnp.asarray(batch["snps"])
    y = (jnp.asarray(batch["y"]) > 0).astype(jnp.float32)
    w = jnp.ones((B,), jnp.float32)

    model = MLPModel(dropout_rate=0.0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), snps)
    init_params = jax.device_get(variables["params"])

    optimizer = optax.scale_by_adam(b1=0.9, b2=0.999)
    train_step, _ = build_snps_steps(model, optimizer, 0.0, use_mlp=True)

    params, opt_state = variables["params"], optimizer.init(
        variables["params"])
    rng = jax.random.PRNGKey(17)
    losses_jax = []
    for epoch in range(STEPS):
        lr_t = jnp.float32(steplr_host(LR, FACTOR, DECAY_EVERY, epoch))
        rng, srng = jax.random.split(rng)
        params, _, opt_state, loss = train_step(
            params, {}, opt_state, snps, y, w, srng, lr_t)
        losses_jax.append(float(loss))
    final_params = jax.device_get(params)

    tm = TorchSnpMLP(int(snps.shape[1]))
    load_snp_mlp_params(tm, init_params)
    tm.drop = 0.0
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=LR)
    x_t = torch.from_numpy(np.asarray(snps).copy())
    y_t = torch.from_numpy(np.asarray(y).copy())
    losses_torch = []
    for epoch in range(STEPS):
        for g in opt.param_groups:
            g["lr"] = steplr_host(LR, FACTOR, DECAY_EVERY, epoch)
        opt.zero_grad()
        y_hat = tm(x_t)
        p = y_hat[:, 0].clamp(1e-7, 1.0)
        q = (1 - y_hat[:, 0]).clamp(1e-7, 1.0)
        loss = -(y_t * torch.log(p) + (1 - y_t) * torch.log(q)).sum()
        loss.backward()
        opt.step()
        losses_torch.append(float(loss.detach()))

    np.testing.assert_allclose(losses_jax, losses_torch, rtol=2e-4,
                               err_msg="per-step MLP training losses diverged")
    assert abs(losses_jax[0] - losses_jax[-1]) > 1e-3
    for name, t, a in iter_snp_mlp_param_pairs(tm, final_params):
        np.testing.assert_allclose(
            np.asarray(a), t.detach().numpy(), rtol=2e-3, atol=2.5e-4,
            err_msg=f"param {name} diverged after {STEPS} steps")
