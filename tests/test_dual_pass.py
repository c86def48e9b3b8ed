"""Vmapped dual-pass fused objective == sequential two-apply objective."""

import jax
import numpy as np

from iggcn_tpu.config import ModelConfig, TrainConfig
from iggcn_tpu.models.fused_sgcn import FusedSGCN
from iggcn_tpu.train.steps import fused_objective


def _setup(cohort, topo, b=8):
    mcfg = ModelConfig(num_layers=2, hidden=8, hidden_linear=16, l_dim=8)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    from tests.conftest import device_batch
    batch = device_batch(cohort, b)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["x"],
                                    batch["adj"], batch["snps"])
    return model, mcfg, variables, batch


def _run(model, mcfg, variables, batch, *, vmapped, train):
    tcfg = TrainConfig(epochs=1, batch_size=batch["y"].shape[0],
                       dual_pass_vmap=vmapped)
    fn = jax.jit(lambda p, s, b, r: fused_objective(
        model, p, s, b, mcfg, tcfg, train=train, rng=r))
    return fn(variables["params"], variables["batch_stats"], batch,
              jax.random.PRNGKey(7))


def test_dual_pass_train_matches_sequential(cohort, topo):
    model, mcfg, variables, batch = _setup(cohort, topo)
    loss_v, aux_v = _run(model, mcfg, variables, batch, vmapped=True,
                         train=True)
    loss_s, aux_s = _run(model, mcfg, variables, batch, vmapped=False,
                         train=True)
    np.testing.assert_allclose(float(loss_v), float(loss_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_v["out"].log_probs),
                               np.asarray(aux_s["out"].log_probs),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_v["out_prob"].log_probs),
                               np.asarray(aux_s["out_prob"].log_probs),
                               rtol=1e-4, atol=1e-5)
    # sequential BatchNorm running-stat reconstruction must match exactly
    for a, b2 in zip(jax.tree_util.tree_leaves(aux_v["batch_stats"]),
                     jax.tree_util.tree_leaves(aux_s["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-5, atol=1e-6)


def test_dual_pass_eval_matches_sequential(cohort, topo):
    model, mcfg, variables, batch = _setup(cohort, topo)
    loss_v, aux_v = _run(model, mcfg, variables, batch, vmapped=True,
                         train=False)
    loss_s, aux_s = _run(model, mcfg, variables, batch, vmapped=False,
                         train=False)
    np.testing.assert_allclose(float(loss_v), float(loss_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_v["out"].our_reg),
                               np.asarray(aux_s["out"].our_reg),
                               rtol=1e-4, atol=1e-5)


def test_remat_step_equivalence(cohort, topo):
    """`TrainConfig.remat` (jax.checkpoint around the step's loss_fn) is a
    memory/bandwidth-vs-recompute trade only — one full optimizer step
    must produce the same loss, parameters, and BN stats as the stored-
    activation path (gradients of a checkpointed function are exact)."""
    import dataclasses as dc

    from iggcn_tpu.train.steps import (TrainState, make_optimizer,
                                       make_train_step)
    from tests.conftest import device_batch

    mcfg = ModelConfig(num_layers=2, hidden=8, dropout_lin=0.0,
                       dropout_regr=0.0, dropout_go=0.0, dropout_readout=0.0)
    tcfg = TrainConfig(epochs=2, batch_size=8)
    batch = device_batch(cohort, 8)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    variables = jax.jit(model.init)(jax.random.PRNGKey(5), batch["x"],
                                    batch["adj"], batch["snps"])

    def one_step(cfg):
        optimizer = make_optimizer(cfg)
        step = jax.jit(make_train_step(model, mcfg, cfg, optimizer))
        state = TrainState.create(variables, optimizer, steps_per_epoch=1)
        state, loss = step(state, batch, jax.random.PRNGKey(9))
        return float(loss), jax.device_get(state.params), \
            jax.device_get(state.batch_stats)

    loss_a, params_a, stats_a = one_step(tcfg)
    loss_b, params_b, stats_b = one_step(dc.replace(tcfg, remat=True))
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        params_a, params_b)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        stats_a, stats_b)
