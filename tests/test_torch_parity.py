"""Logit-level parity of the JAX fused model vs the torch oracle with shared
weights (eval mode, deterministic). This validates every torch-semantics
claim in `nn_compat` (BatchNorm1d axes, node LayerNorm, MHA packing) and the
dense reformulations of the reference's sparse ops in one shot."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from iggcn_tpu.config import ModelConfig
from iggcn_tpu.models.fused_sgcn import FusedSGCN
from iggcn_tpu.models.go_network import GeneOntologyNetwork
from iggcn_tpu.oracle.torch_ref import (TorchFused, TorchGoNetwork,
                                        load_fused_params, load_go_params)


def test_go_network_matches_torch(topo):
    model = GeneOntologyNetwork(topo=topo, in_f_dim=2, n_l=2, f_dim=(5, 5),
                                l_dim=32, dim_snps_atten=7)
    rng = np.random.default_rng(0)
    snps = rng.random((5, topo.num_snps)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), jnp.asarray(snps))
    latent_j, xhat_j, atten_j = jax.jit(model.apply)(variables,
                                                     jnp.asarray(snps))

    tmodel = TorchGoNetwork(topo, 2, 2, (5, 5), 32, 7)
    load_go_params(tmodel, jax.device_get(variables["params"]))
    tmodel.eval()
    with torch.no_grad():
        latent_t, xhat_t, atten_t = tmodel(torch.from_numpy(snps))

    np.testing.assert_allclose(np.asarray(latent_j), latent_t.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(xhat_j), xhat_t.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(atten_j), atten_t.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_fused_matches_torch(topo, cohort):
    cfg = ModelConfig(num_layers=2, hidden=16)
    model = FusedSGCN(cfg=cfg, topo=topo)
    x = cohort.x[:6]
    adj = cohort.adj[:6]
    snps = cohort.snps[:6]
    variables = jax.jit(model.init)(jax.random.PRNGKey(7), jnp.asarray(x),
                                    jnp.asarray(adj), jnp.asarray(snps))
    apply = jax.jit(model.apply, static_argnames=("is_explain",))
    out_j = apply(variables, jnp.asarray(x), jnp.asarray(adj),
                  jnp.asarray(snps))
    out_jm = apply(variables, jnp.asarray(x), jnp.asarray(adj),
                   jnp.asarray(snps), is_explain=True)

    tmodel = TorchFused(topo)
    load_fused_params(tmodel, jax.device_get(variables["params"]))
    tmodel.eval()
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x), torch.from_numpy(adj),
                       torch.from_numpy(snps))
        out_tm = tmodel(torch.from_numpy(x), torch.from_numpy(adj),
                        torch.from_numpy(snps), is_explain=True)

    for j, t, name in [(out_j.log_probs, out_t[0], "log_probs"),
                       (out_j.snps_hat, out_t[1], "snps_hat"),
                       (out_j.our_reg, out_t[5], "our_reg"),
                       (out_jm.log_probs, out_tm[0], "log_probs_masked"),
                       (out_jm.our_reg, out_tm[5], "our_reg_masked")]:
        np.testing.assert_allclose(np.asarray(j), t.numpy(), rtol=5e-4,
                                   atol=5e-5, err_msg=name)
