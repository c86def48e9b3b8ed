"""Cluster-label multitask fused model (SGCN_GCN_CLUSTERLABEL).

Re-design of `kernel/sgcn_img_snp_clusterlabel.py:13-228`: the fused SGCN x GO
skeleton with TWO classification heads — disease and unsupervised image
cluster — and no regression head. `is_predict_cluster=False` feeds zeros to
the cluster head (parity `:218-221`).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggcn_tpu.config import ModelConfig
from iggcn_tpu.models.go_network import GeneOntologyNetwork
from iggcn_tpu.models.nn_compat import (TorchLinear, dropout,
                                        kaiming_uniform_a5, pyg_glorot,
                                        torch_linear_init)
from iggcn_tpu.ops.attention import MHAParams, multihead_cross_attention
from iggcn_tpu.ops.gcn import gcn_conv, gcn_propagation_matrix
from iggcn_tpu.ops.masking import importance_masks


class ClusterOutputs(NamedTuple):
    log_probs: jax.Array          # disease head
    log_probs_cluster: jax.Array  # cluster head
    snps_hat: jax.Array
    out_z: jax.Array


class ClusterLabelSGCN(nn.Module):
    cfg: ModelConfig
    topo: Any

    def setup(self):
        cfg = self.cfg
        hidden = cfg.hidden
        self.conv_w = [self.param(f"conv_w_{i}", pyg_glorot,
                                  (cfg.feat_dim if i == 0 else hidden, hidden))
                       for i in range(cfg.num_layers)]
        self.conv_b = [self.param(f"conv_b_{i}", nn.initializers.zeros,
                                  (hidden,)) for i in range(cfg.num_layers)]
        self.prob = self.param("prob", kaiming_uniform_a5,
                               (cfg.rois, cfg.feat_dim))
        self.prob_bias = self.param("prob_bias", kaiming_uniform_a5,
                                    (2 * cfg.feat_dim, 1))
        self.snps_prob = self.param("snps_prob", kaiming_uniform_a5,
                                    (1, cfg.num_snps))
        dim_atten = cfg.jk_dim
        self.go_network = GeneOntologyNetwork(
            topo=self.topo, in_f_dim=cfg.go_in_f_dim, n_l=cfg.go_n_l,
            f_dim=cfg.go_f_dim, l_dim=cfg.l_dim, dim_snps_atten=dim_atten,
            dropout_gcn=cfg.dropout_go, dropout_readout=cfg.dropout_readout,
            attention_impl=cfg.go_attention_impl, name="go_network")
        if cfg.is_cross_atten:
            e = dim_atten
            self.mha = MHAParams(
                in_proj_weight=self.param("mha_in_proj_weight",
                                          nn.initializers.xavier_uniform(),
                                          (3 * e, e)),
                in_proj_bias=self.param("mha_in_proj_bias",
                                        nn.initializers.zeros, (3 * e,)),
                # torch MultiheadAttention only xavier-inits in_proj;
                # out_proj keeps nn.Linear's default U(-1/sqrt(E), 1/sqrt(E))
                out_proj_weight=self.param("mha_out_proj_weight",
                                           torch_linear_init(e), (e, e)),
                out_proj_bias=self.param("mha_out_proj_bias",
                                         nn.initializers.zeros, (e,)))
        self.lin1_classify = TorchLinear(cfg.hidden_linear, name="lin1_classify")
        self.lin2_classify = TorchLinear(cfg.num_classes, name="lin2_classify")
        self.lin1_cluster = TorchLinear(cfg.hidden_linear, name="lin1_cluster")
        self.lin2_cluster = TorchLinear(cfg.num_cluster, name="lin2_cluster")

    def __call__(self, x: jax.Array, adj: jax.Array, snps: jax.Array, *,
                 is_explain: bool = False, train: bool = False,
                 sample_weight: Optional[jax.Array] = None) -> ClusterOutputs:
        cfg = self.cfg
        b = x.shape[0]
        if is_explain:
            masks = importance_masks(x, adj, self.prob, self.prob_bias,
                                     snps, self.snps_prob)
            x_used, adj_used, snps_used = (masks.x_masked, masks.adj_masked,
                                           masks.snps_masked)
        else:
            x_used, adj_used, snps_used = x, adj, snps

        prop = gcn_propagation_matrix(adj_used)
        h = x_used
        feats = []
        for i in range(cfg.num_layers):
            h = nn.relu(gcn_conv(h, prop, self.conv_w[i], self.conv_b[i]))
            feats.append(h)
        batch_x = jnp.concatenate(feats, axis=-1)
        img_out = batch_x.reshape(b, -1)

        latent, snps_hat, atten_out = self.go_network(
            snps_used, train=train, sample_weight=sample_weight)

        if cfg.is_cross_atten:
            attn_out, _ = multihead_cross_attention(
                self.mha, batch_x, atten_out, atten_out, cfg.num_attn_heads)
            cross = nn.relu(attn_out).reshape(b, -1)
        else:
            cross = img_out
        out_z = jnp.concatenate([(img_out + cross) / 2.0, latent], axis=-1)

        # head dropout rate from cfg (default 0.5 = the reference's hardcoded
        # rate, sgcn_img_snp_clusterlabel.py:219-224) so the trajectory-parity
        # test can zero it
        cluster_in = out_z if cfg.is_predict_cluster else jnp.zeros_like(out_z)
        hc = nn.relu(self.lin1_cluster(cluster_in))
        if train:
            hc = dropout(self.make_rng("dropout"), hc, cfg.dropout_lin)
        logits_cluster = self.lin2_cluster(hc)

        hd = nn.relu(self.lin1_classify(out_z))
        if train:
            hd = dropout(self.make_rng("dropout"), hd, cfg.dropout_lin)
        logits = self.lin2_classify(hd)

        return ClusterOutputs(jax.nn.log_softmax(logits, -1),
                              jax.nn.log_softmax(logits_cluster, -1),
                              snps_hat, out_z)
