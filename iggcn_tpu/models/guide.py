"""Guided autoencoder fusion model (GUIDE_IMGSNP).

Re-design of `kernel/guide_img_snp.py:14-135`: the imaging branch is an MLP
autoencoder over the flattened (rois*H_0) features with a learned Bernoulli
hard feature mask drawn by straight-through Gumbel-softmax at temperature tau
during training; the GO branch is the PReLU `guide_go_model` variant; fusion
is the latent average. Returns the surrogate reconstruction pair and the
importance probabilities used by the KL sparsity penalty of the guide trainer
(`kernel/train_eval_guide_img_snps.py:450-489`).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggcn_tpu.config import ModelConfig
from iggcn_tpu.models.go_network import GeneOntologyNetwork, PReLU
from iggcn_tpu.models.nn_compat import BatchNorm1d, TorchLinear, dropout


class GuideOutputs(NamedTuple):
    log_probs: jax.Array
    snps_hat: jax.Array
    out_z: jax.Array
    out_lin: jax.Array
    linear_outf: jax.Array
    our_reg: jax.Array
    surrogate_img: jax.Array       # flattened imaging input (recon target)
    surrogate_recon: jax.Array     # decoder(latent) reconstruction
    imp_prob: jax.Array            # (rois*H_0,) keep-probabilities (KL target)


class GuideImgSnp(nn.Module):
    """Dropout rates come from `cfg.dropout_go/lin/regr` (defaults equal the
    reference's hardcoded 0.4/0.5/0.3, `guide_img_snp.py:103-128`) so the
    trajectory-parity test can zero them. `gumbel_zero=True` replaces the
    Gumbel noise with zeros — the deterministic parity mode (framework PRNGs
    cannot be aligned across JAX/torch, same principle as zeroed dropout);
    training always uses the stochastic draw."""

    cfg: ModelConfig
    topo: Any
    hidden_linear: int = 32
    gumbel_zero: bool = False

    def setup(self):
        cfg = self.cfg
        d = cfg.rois * cfg.feat_dim
        self.enc1 = TorchLinear(self.hidden_linear, use_bias=False, name="enc1")
        self.enc_act = PReLU(name="enc_act")
        # image latent must match the GO latent (they are averaged at :98);
        # the reference passes the same l_dim to both (guide_img_snp.py:28,58)
        self.enc2 = TorchLinear(cfg.l_dim, use_bias=False, name="enc2")
        self.dec_bn1 = BatchNorm1d(name="dec_bn1")
        self.dec_act1 = PReLU(name="dec_act1")
        self.dec1 = TorchLinear(self.hidden_linear, use_bias=False, name="dec1")
        self.dec_bn2 = BatchNorm1d(name="dec_bn2")
        self.dec_act2 = PReLU(name="dec_act2")
        self.dec2 = TorchLinear(d, use_bias=False, name="dec2")
        # Bernoulli logits over features (parity guide_img_snp.py:67)
        self.bias_n = self.param(
            "bias_n", lambda k, s: 0.1 * (2 * jax.random.uniform(k, s) - 1),
            (d, 2))
        self.go_network = GeneOntologyNetwork(
            topo=self.topo, in_f_dim=2, n_l=cfg.go_n_l, f_dim=cfg.go_f_dim,
            l_dim=cfg.l_dim, dim_snps_atten=cfg.hidden,
            dropout_gcn=cfg.dropout_go, dropout_readout=cfg.dropout_readout,
            activation="prelu",
            attention_impl=cfg.go_attention_impl, name="go_network")
        self.lin1 = TorchLinear(self.hidden_linear, name="lin1")
        self.lin2 = TorchLinear(cfg.num_classes, name="lin2")
        self.lin1_regr = TorchLinear(self.hidden_linear, name="lin1_regr")
        self.lin2_regr = TorchLinear(cfg.num_regr, name="lin2_regr")

    def __call__(self, x: jax.Array, adj: jax.Array, snps: jax.Array, *,
                 temperature: float = 0.1, train: bool = False,
                 sample_weight: jax.Array | None = None) -> GuideOutputs:
        cfg = self.cfg
        b = x.shape[0]
        img_out = x.reshape(b, -1)

        imp = jax.nn.softmax(self.bias_n, axis=1)      # (d, 2)
        imp_keep = imp[:, 1]
        if train:
            # straight-through Gumbel-softmax, hard=True
            # (parity F.gumbel_softmax(log(imp), tau, hard=True), :99)
            if self.gumbel_zero:
                g = jnp.zeros((b,) + self.bias_n.shape)
            else:
                g = jax.random.gumbel(self.make_rng("gumbel"),
                                      (b,) + self.bias_n.shape)
            logits = (jnp.log(imp)[None] + g) / temperature
            soft = jax.nn.softmax(logits, axis=-1)
            hard = jax.nn.one_hot(jnp.argmax(logits, axis=-1), 2,
                                  dtype=soft.dtype)
            z = hard + soft - jax.lax.stop_gradient(soft)
            x_in = img_out * z[:, :, 1]
        else:
            x_in = img_out

        latent_g, snps_hat, _ = self.go_network(
            snps, train=train, sample_weight=sample_weight)

        h = self.enc1(x_in)
        h = self.enc_act(h)
        if train:
            h = dropout(self.make_rng("dropout"), h, cfg.dropout_go)
        latent_n = self.enc2(h)
        latent = (latent_g + latent_n) / 2

        det = not train
        r = self.dec_bn1(latent, use_running_average=det, weight=sample_weight)
        r = self.dec_act1(r)
        if train:
            r = dropout(self.make_rng("dropout"), r, cfg.dropout_go)
        r = self.dec1(r)
        r = self.dec_bn2(r, use_running_average=det, weight=sample_weight)
        r = self.dec_act2(r)
        if train:
            r = dropout(self.make_rng("dropout"), r, cfg.dropout_go)
        recon = self.dec2(r)

        linear_outf = nn.relu(self.lin1(latent))
        hc = linear_outf
        if train:
            hc = dropout(self.make_rng("dropout"), hc, cfg.dropout_lin)
        logits = self.lin2(hc)
        reg = nn.relu(self.lin1_regr(latent))
        if train:
            reg = dropout(self.make_rng("dropout"), reg, cfg.dropout_regr)
        reg = self.lin2_regr(reg)

        return GuideOutputs(jax.nn.log_softmax(logits, -1), snps_hat, latent,
                            latent, linear_outf, reg, img_out, recon, imp_keep)
