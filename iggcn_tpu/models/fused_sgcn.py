"""Flagship fused imaging x genetics model (SGCN brain-GCN + GO network +
cross-attention fusion + classification/regression heads).

TPU-native re-design of `SGCN_GCN_IMGSNP` (`kernel/sgcn_img_snp.py:13-307`):

  * The imaging branch is a JK-concat GCN stack over a dense batched (B, N, N)
    propagation matrix (`ops/gcn.py`) instead of PyG gather/scatter convs
    (`sgcn_img_snp.py:218-223`); `to_dense_batch` disappears because batches
    are dense (B, N, F) throughout (every ADNI graph has exactly N nodes, so
    the reference's min()-1 fill value never materializes,
    `sgcn_img_snp.py:225-228`).
  * Importance masking (`cal_probability`, `sgcn_img_snp.py:133-151`) is a
    dense rank-1 edge scorer (`ops/masking.py`); the "explain" pass reuses the
    same forward with masked inputs.
  * Cross-modal fusion is a 2-head torch-parity MHA (`ops/attention.py`,
    cf. `sgcn_img_snp.py:46,239-242`).

Loss terms (sparsity / consistency / orthogonality) live in
`train/losses.py` as pure functions of params + activations.
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
                                        pyg_glorot_att, torch_linear_init)
from iggcn_tpu.ops.attention import MHAParams, multihead_cross_attention
from iggcn_tpu.ops.gcn import gcn_conv, gcn_propagation_matrix
from iggcn_tpu.ops.masking import importance_masks


# canonical inits live in nn_compat; aliases keep the param lines short
_kaiming_uniform_a5 = kaiming_uniform_a5
_glorot_uniform = pyg_glorot


class FusedOutputs(NamedTuple):
    log_probs: jax.Array     # (B, num_classes) log-softmax
    snps_hat: jax.Array      # (B, S) SNP reconstruction
    out_z: jax.Array         # fused embedding (consistency/orthogonality input)
    out_lin: jax.Array       # pre-head features ("hidden" artifact)
    linear_outf: jax.Array   # post-lin1 features ("linear_out" artifact)
    our_reg: jax.Array       # (B, num_regr) clinical-score regression


class FusedSGCN(nn.Module):
    """SGCN_GCN_IMGSNP-parity fused model."""

    cfg: ModelConfig
    topo: Any  # GoTopology

    def setup(self):
        cfg = self.cfg
        hidden = cfg.hidden
        if cfg.use_gat:
            from iggcn_tpu.ops.gat import GATParams
            self.gat_ps = [GATParams(
                weight=self.param(f"gat_w_{i}", _glorot_uniform,
                                  (cfg.feat_dim if i == 0 else hidden, hidden)),
                att_src=self.param(f"gat_att_src_{i}", pyg_glorot_att,
                                   (hidden,)),
                att_dst=self.param(f"gat_att_dst_{i}", pyg_glorot_att,
                                   (hidden,)),
                lin_edge=self.param(f"gat_lin_edge_{i}", _glorot_uniform,
                                    (1, hidden)),
                att_edge=self.param(f"gat_att_edge_{i}",
                                    pyg_glorot_att, (hidden,)),
                bias=self.param(f"gat_b_{i}", nn.initializers.zeros, (hidden,)))
                for i in range(cfg.num_layers)]
        else:
            self.conv_w = [self.param(f"conv_w_{i}", _glorot_uniform,
                                      (cfg.feat_dim if i == 0 else hidden, hidden))
                           for i in range(cfg.num_layers)]
            self.conv_b = [self.param(f"conv_b_{i}", nn.initializers.zeros,
                                      (hidden,))
                           for i in range(cfg.num_layers)]

        # learned importance parameters (parity sgcn_img_snp.py:88-97)
        self.prob = self.param("prob", _kaiming_uniform_a5,
                               (cfg.rois, cfg.feat_dim))
        self.prob_bias = self.param("prob_bias", _kaiming_uniform_a5,
                                    (2 * cfg.feat_dim, 1))
        self.snps_prob = self.param("snps_prob", _kaiming_uniform_a5,
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
                # torch MultiheadAttention only xavier-inits in_proj; out_proj
                # keeps nn.Linear's default U(-1/sqrt(E), 1/sqrt(E))
                out_proj_weight=self.param("mha_out_proj_weight",
                                           torch_linear_init(e), (e, e)),
                out_proj_bias=self.param("mha_out_proj_bias",
                                         nn.initializers.zeros, (e,)))

        self.lin1 = TorchLinear(cfg.hidden_linear, name="lin1")
        self.lin2 = TorchLinear(cfg.num_classes, name="lin2")
        if cfg.model4eachregr:
            # per-score regression heads (parity kernel/gcn_img_snp.py:64-88)
            self.lin1_regr_each = [TorchLinear(cfg.hidden_linear,
                                               name=f"lin1_regr_{i}")
                                   for i in range(cfg.num_regr)]
            self.lin2_regr_each = [TorchLinear(1, name=f"lin2_regr_{i}")
                                   for i in range(cfg.num_regr)]
        else:
            self.lin1_regr = TorchLinear(cfg.hidden_linear, name="lin1_regr")
            self.lin2_regr = TorchLinear(cfg.num_regr, name="lin2_regr")

    def __call__(self, x: jax.Array, adj: jax.Array, snps: jax.Array, *,
                 is_explain: bool = False, train: bool = False,
                 sample_weight: Optional[jax.Array] = None,
                 raw_x: Optional[jax.Array] = None) -> FusedOutputs:
        """Forward one dense batch.

        Args:
          x: (B, N, D) ROI features.
          adj: (B, N, N) diffusion-sparsified weighted adjacency
               (adj[b, r, c] = weight of edge r->c).
          snps: (B, S) SNP vector.
          is_explain: apply the learned importance masks (second pass of the
            reference training loop, `train_eval_sgcn_img_snps.py:523`).
          raw_x: unmasked ROI features for the prob4regr regression input
            (the reference always uses `data.x` there even in the masked
            pass, `sgcn_img_snp.py:292-294`). Defaults to `x`; the vmapped
            dual-pass objective (`steps._dual_pass`) pre-masks `x` and must
            pass the raw features here explicitly.
        """
        cfg = self.cfg
        b, n, d = x.shape
        if raw_x is None:
            raw_x = x

        if is_explain:
            masks = importance_masks(x, adj, self.prob, self.prob_bias,
                                     snps, self.snps_prob)
            x_used, adj_used, snps_used = (masks.x_masked, masks.adj_masked,
                                           masks.snps_masked)
        else:
            x_used, adj_used, snps_used = x, adj, snps

        # ---- imaging GNN stack with jumping-knowledge concat ---------------
        h = x_used
        feats = []
        if cfg.use_gat:
            from iggcn_tpu.ops.gat import gat_conv
            for i in range(cfg.num_layers):
                h = nn.relu(gat_conv(h, adj_used, self.gat_ps[i]))
                feats.append(h)
        elif cfg.use_pallas_gcn:
            from iggcn_tpu.ops.pallas_gcn import fused_gcn_stack
            prop = gcn_propagation_matrix(adj_used)
            feats = [fused_gcn_stack(prop, h, tuple(self.conv_w),
                                     tuple(self.conv_b),
                                     jax.default_backend() != "tpu")]
        else:
            prop = gcn_propagation_matrix(adj_used)
            for i in range(cfg.num_layers):
                h = nn.relu(gcn_conv(h, prop, self.conv_w[i], self.conv_b[i]))
                feats.append(h)
        batch_x = jnp.concatenate(feats, axis=-1)        # (B, N, L*hidden)
        img_out = batch_x.reshape(b, -1)

        if cfg.graph_pool:
            img_out = jnp.concatenate([batch_x.mean(axis=1),
                                       batch_x.max(axis=1),
                                       batch_x.sum(axis=1)], axis=-1)

        # ---- genetics branch ------------------------------------------------
        latent, snps_hat, atten_out = self.go_network(
            snps_used, train=train, sample_weight=sample_weight)

        # ---- fusion ---------------------------------------------------------
        if cfg.is_cross_atten:
            attn_out, _ = multihead_cross_attention(
                self.mha, batch_x, atten_out, atten_out, cfg.num_attn_heads)
            out_cross = nn.relu(attn_out)                # (B, N, L*hidden)
            if cfg.graph_pool:
                out_cross = jnp.concatenate([out_cross.mean(axis=1),
                                             out_cross.max(axis=1),
                                             out_cross.sum(axis=1)], axis=-1)
            else:
                out_cross = out_cross.reshape(b, -1)
        else:
            # Reference-bug note: the `isCrossAtten=False` branch upstream
            # (`sgcn_img_snp.py:242-243` -> `:287`) adds (B, N*L*h) to
            # (B, N*L*h + l_dim) and cannot run — and the flag is not even
            # settable to False from its CLI (`main.py:` store_true with
            # default=True). Rebuilt as evidently intended: concat fusion.
            out_cross = None

        # ---- heads ----------------------------------------------------------
        if cfg.is_image_only:
            out_z = img_out
            out_lin = out_z
        elif cfg.is_snps_only:
            out_z = latent
            out_lin = jnp.concatenate([snps_used, latent], axis=-1)
        elif out_cross is None:
            out_z = img_out
            out_lin = jnp.concatenate([img_out, latent], axis=-1)
        else:
            out_z = (img_out + out_cross) / 2.0
            out_lin = jnp.concatenate([out_z, latent], axis=-1)

        linear_outf = nn.relu(self.lin1(out_lin))
        hcls = linear_outf
        if train:
            hcls = dropout(self.make_rng("dropout"), hcls, cfg.dropout_lin)
        logits = self.lin2(hcls)

        if cfg.is_use_prob4regr and not cfg.is_snps_only:
            img_feat = (raw_x * self.prob).reshape(b, -1)  # raw feats * prob
            feat4regr = jnp.concatenate([out_lin, img_feat], axis=-1)
        else:
            feat4regr = out_lin
        if cfg.model4eachregr:
            regs = []
            for i in range(cfg.num_regr):
                r = nn.relu(self.lin1_regr_each[i](feat4regr))
                if train:
                    r = dropout(self.make_rng("dropout"), r, cfg.dropout_regr)
                regs.append(self.lin2_regr_each[i](r))
            reg = jnp.concatenate(regs, axis=-1)
        else:
            reg = nn.relu(self.lin1_regr(feat4regr))
            if train:
                reg = dropout(self.make_rng("dropout"), reg, cfg.dropout_regr)
            reg = self.lin2_regr(reg)

        return FusedOutputs(jax.nn.log_softmax(logits, axis=-1), snps_hat,
                            out_z, out_lin, linear_outf, reg)
