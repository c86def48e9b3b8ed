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
