"""End-to-end smoke: init + forward + grad of the fused model on synthetic data."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iggcn_tpu.config import ModelConfig, SparsityWeights
from iggcn_tpu.models.fused_sgcn import FusedSGCN
from iggcn_tpu.models.go_network import GeneOntologyNetwork
from iggcn_tpu.train import losses


def _batch(cohort, n=8):
    return (jnp.asarray(cohort.x[:n]), jnp.asarray(cohort.adj[:n]),
            jnp.asarray(cohort.snps[:n]))


def test_go_network_shapes(topo):
    model = GeneOntologyNetwork(topo=topo, in_f_dim=2, n_l=2, f_dim=(5, 5),
                                l_dim=32, dim_snps_atten=10)
    snps = jnp.asarray(np.random.default_rng(0).random((6, topo.num_snps)),
                       jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), snps)
    latent, x_hat, atten = jax.jit(model.apply)(variables, snps)
    n_top = topo.n - sum(topo.pool[:2])
    assert latent.shape == (6, 32)
    assert x_hat.shape == (6, topo.num_snps)
    assert atten.shape == (6, n_top, 10)
    assert np.isfinite(np.asarray(latent)).all()
    assert np.isfinite(np.asarray(x_hat)).all()


def test_go_network_train_mode(topo):
    model = GeneOntologyNetwork(topo=topo)
    snps = jnp.ones((4, topo.num_snps))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), snps)
    out, mutated = jax.jit(lambda v, s: model.apply(
        v, s, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"]))(variables, snps)
    assert "batch_stats" in mutated
    # running stats must have moved off their init values
    leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert np.isfinite(np.asarray(leaf)).all()


@pytest.fixture(scope="module")
def fused(topo):
    cfg = ModelConfig(num_layers=2, hidden=16, rois=90, feat_dim=3,
                      num_classes=2, num_regr=3)
    model = FusedSGCN(cfg=cfg, topo=topo)
    return cfg, model


def test_fused_forward_and_explain(fused, cohort):
    cfg, model = fused
    x, adj, snps = _batch(cohort)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, adj, snps)
    apply = jax.jit(model.apply, static_argnames=("is_explain",))
    out = apply(variables, x, adj, snps)
    assert out.log_probs.shape == (8, 2)
    np.testing.assert_allclose(np.exp(np.asarray(out.log_probs)).sum(-1),
                               1.0, rtol=1e-4)
    assert out.snps_hat.shape == (8, 54)
    assert out.our_reg.shape == (8, 3)
    assert out.out_z.shape == (8, 90 * cfg.jk_dim)
    out_m = apply(variables, x, adj, snps, is_explain=True)
    # masked pass must differ from plain pass
    assert not np.allclose(np.asarray(out.log_probs), np.asarray(out_m.log_probs))


def test_fused_grads_finite(fused, cohort):
    cfg, model = fused
    x, adj, snps = _batch(cohort)
    y = jnp.asarray(cohort.y[:8])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, adj, snps)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, x, adj, snps,
            train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        ce = losses.nll_loss(out.log_probs, y)
        sp = losses.sparsity_loss(p["prob"], p["prob_bias"], p["snps_prob"],
                                  x, adj, SparsityWeights())
        return ce + sp

    val, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # importance parameters must receive gradient through the sparsity loss
    assert float(jnp.abs(grads["prob"]).sum()) > 0
    assert float(jnp.abs(grads["snps_prob"]).sum()) > 0
