"""Pallas fused GCN stack vs jnp reference (interpreted on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iggcn_tpu.ops.pallas_gcn import fused_gcn_stack, gcn_stack_reference


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    b, n, f0, h = 4, 90, 3, 16
    prop = rng.normal(0, 0.1, (b, n, n)).astype(np.float32)
    x = rng.normal(size=(b, n, f0)).astype(np.float32)
    ws = (rng.normal(0, 0.3, (f0, h)).astype(np.float32),
          rng.normal(0, 0.3, (h, h)).astype(np.float32))
    bs = (rng.normal(0, 0.1, (h,)).astype(np.float32),
          rng.normal(0, 0.1, (h,)).astype(np.float32))
    return tuple(jnp.asarray(a) for a in (prop, x)) + (
        tuple(map(jnp.asarray, ws)), tuple(map(jnp.asarray, bs)))


def test_forward_matches_reference(inputs):
    prop, x, ws, bs = inputs
    ref = gcn_stack_reference(prop, x, ws, bs)
    out = fused_gcn_stack(prop, x, ws, bs, True)
    assert out.shape == (4, 90, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference(inputs):
    prop, x, ws, bs = inputs

    def loss_pallas(prop, x, ws, bs):
        return jnp.sum(fused_gcn_stack(prop, x, ws, bs, True) ** 2)

    def loss_ref(prop, x, ws, bs):
        return jnp.sum(gcn_stack_reference(prop, x, ws, bs) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(prop, x, ws, bs)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(prop, x, ws, bs)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_model_pallas_path_matches(cohort, topo):
    """FusedSGCN(use_pallas_gcn=True) output == default XLA path."""
    import dataclasses as dc

    from iggcn_tpu.config import ModelConfig
    from iggcn_tpu.models.fused_sgcn import FusedSGCN

    cfg = ModelConfig(num_layers=2, hidden=8, hidden_linear=16, l_dim=8)
    x = jnp.asarray(cohort.x[:4])
    adj = jnp.asarray(cohort.adj[:4])
    snps = jnp.asarray(cohort.snps[:4])
    m0 = FusedSGCN(cfg=cfg, topo=topo)
    m1 = FusedSGCN(cfg=dc.replace(cfg, use_pallas_gcn=True), topo=topo)
    variables = jax.jit(m0.init)(jax.random.PRNGKey(0), x, adj, snps)
    out0 = m0.apply(variables, x, adj, snps)
    out1 = m1.apply(variables, x, adj, snps)
    np.testing.assert_allclose(np.asarray(out0.log_probs),
                               np.asarray(out1.log_probs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out0.our_reg),
                               np.asarray(out1.our_reg),
                               rtol=1e-4, atol=1e-5)
