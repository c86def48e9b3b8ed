"""Torch oracle models mirroring the JAX fused model one-to-one.

The math follows the reference (`kernel/go_model.py`, `kernel/sgcn_img_snp.py`)
in its dense formulation; torch-native layers (nn.LayerNorm over the node
axis, nn.BatchNorm1d with 2-D/3-D semantics, nn.MultiheadAttention) provide
the authoritative semantics the JAX `nn_compat` layer claims to match.
Weights load from a JAX param tree via `load_fused_params` for logit-level
parity checks (eval mode, deterministic).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a).copy()).float()


class TorchGoNetwork(nn.Module):
    """`activation='relu'` mirrors `kernel/go_model.py`; `'prelu'` mirrors
    `kernel/guide_go_model.py` (PReLU at every activation site and a latent
    MLP that ends WITHOUT the final BN/ReLU, `guide_go_model.py:138-144`)."""

    def __init__(self, topo, in_f_dim=2, n_l=2, f_dim=(5, 5), l_dim=32,
                 dim_snps_atten=5, activation="relu"):
        super().__init__()
        self.activation = activation
        if activation == "prelu":
            self.acts_enc = nn.ModuleList([nn.PReLU() for _ in range(n_l)])
            self.acts_dec = nn.ModuleList([nn.PReLU() for _ in range(n_l)])
            self.act_atten = nn.PReLU()
            self.act_b = nn.PReLU()
            self.act_b_d = nn.PReLU()
            self.act_latent1 = nn.PReLU()
        self.pool = list(topo.pool)
        self.n_l = n_l
        self.n = topo.n
        self.n_top = self.n - sum(self.pool[:n_l])
        fdims = [in_f_dim] + list(f_dim)
        self.fdims = fdims
        self.enc_masks = [torch.from_numpy(m.astype(np.float32))
                          for m in topo.encoder_masks(n_l)]
        self.dec_masks = [torch.from_numpy(m.astype(np.float32))
                          for m in topo.decoder_masks(n_l)]
        self.gene_mask = torch.from_numpy((topo.go_snps != 0).astype(np.float32))
        s = topo.go_snps.shape[1]
        self.gene_enc = nn.ParameterList(
            [nn.Parameter(torch.randn(self.n, s) * 0.1 + 1.0)
             for _ in range(in_f_dim)])
        self.gene_dec = nn.Parameter(torch.randn(self.n, s) * 0.1 + 1.0)
        self.w_inc = nn.ParameterList(
            [nn.Parameter(torch.zeros(fdims[i], fdims[i + 1]))
             for i in range(n_l)])
        self.w_s_loop = nn.ParameterList(
            [nn.Parameter(torch.zeros(fdims[i], fdims[i + 1]))
             for i in range(n_l)])
        self.w_att_s = nn.ParameterList(
            [nn.Parameter(torch.zeros(fdims[i + 1], 1)) for i in range(n_l)])
        self.w_att_in = nn.ParameterList(
            [nn.Parameter(torch.zeros(2 * fdims[i + 1], 1)) for i in range(n_l)])
        self.g_b = nn.ModuleList(
            [nn.LayerNorm(sum(self.pool[i:])) for i in range(n_l)])
        self.w_out = nn.ParameterList(
            [nn.Parameter(torch.zeros(fdims[i], fdims[i - 1]))
             for i in range(n_l, 0, -1)])
        self.w_s_loop_out = nn.ParameterList(
            [nn.Parameter(torch.zeros(fdims[i], fdims[i - 1]))
             for i in range(n_l, 0, -1)])
        self.g_b_d = nn.ModuleList(
            [nn.LayerNorm(sum(self.pool[i:])) for i in range(n_l - 1, -1, -1)])
        self.conc_for_attention = nn.Parameter(
            torch.zeros(fdims[-1], dim_snps_atten))
        self.bn_atten = nn.BatchNorm1d(self.n_top)
        self.conc = nn.Parameter(torch.zeros(fdims[-1], 1))
        self.bn_b = nn.BatchNorm1d(self.n_top)
        self.conc_d = nn.Parameter(torch.zeros(fdims[0], 1))
        self.bn_b_d = nn.BatchNorm1d(self.n)
        self.latent1 = nn.Parameter(torch.zeros(self.n_top, 32))
        self.bn_latent1 = nn.BatchNorm1d(32)
        self.latent2 = nn.Parameter(torch.zeros(32, l_dim))
        self.bn_latent2 = nn.BatchNorm1d(l_dim)
        self.drop_gcn = 0.4
        self.drop_readout = 0.5

    def _act(self, x, bank, i=0):
        if self.activation == "prelu":
            if bank == "enc":
                return self.acts_enc[i](x)
            if bank == "dec":
                return self.acts_dec[i](x)
            return {"atten": self.act_atten, "b": self.act_b,
                    "b_d": self.act_b_d, "latent1": self.act_latent1}[bank](x)
        return F.relu(x)

    def forward(self, snps):
        x = torch.stack([snps @ (self.gene_mask * w).t()
                         for w in self.gene_enc], dim=2)
        for jj in range(self.n_l):
            mask = self.enc_masks[jj]
            x_in = x @ self.w_inc[jj]
            x_s = x @ self.w_s_loop[jj]
            f = x_in.shape[-1]
            u = x_in @ self.w_att_in[jj][:f, 0]
            v = x_in @ self.w_att_in[jj][f:, 0]
            scores = torch.exp(torch.tanh(u[:, :, None] + v[:, None, :]))
            masked = scores * mask
            row = masked.sum(-1, keepdim=True)
            a_hat = torch.where(row > 0, masked / row.clamp_min(1e-38),
                                torch.zeros_like(masked))
            v_s = torch.sigmoid(x_s @ self.w_att_s[jj])
            out = torch.einsum("brc,bcf->brf", a_hat, x_in) + x_s * v_s
            out = self.g_b[jj](out.permute(0, 2, 1)).permute(0, 2, 1)
            out = F.dropout1d(self._act(out, "enc", jj), self.drop_gcn,
                              self.training)
            x = out[:, self.pool[jj]:, :]

        atten_out = self._act(self.bn_atten(x @ self.conc_for_attention),
                              "atten")
        inp = F.dropout(self._act(self.bn_b((x @ self.conc)[..., 0]), "b"),
                        self.drop_readout, self.training)
        h = F.dropout(self._act(self.bn_latent1(inp @ self.latent1),
                                "latent1"),
                      self.drop_readout, self.training)
        if self.activation == "prelu":
            latent = h @ self.latent2   # guide_go_model.py:138-144: no BN/ReLU
        else:
            latent = F.relu(self.bn_latent2(h @ self.latent2))

        for jj in range(self.n_l):
            mask = self.dec_masks[jj]
            x_out = x @ self.w_out[jj]
            x_s_out = x @ self.w_s_loop_out[jj]
            row = mask.sum(-1, keepdim=True)
            a_dec = torch.where(row > 0, mask / row.clamp_min(1.0),
                                torch.zeros_like(mask))
            x_outgoing = torch.einsum("rc,bcf->brf", a_dec, x_out)
            grow = self.pool[self.n_l - jj - 1]
            x_self = F.pad(x_s_out, (0, 0, grow, 0))
            out = x_outgoing + x_self
            out = self.g_b_d[jj](out.permute(0, 2, 1)).permute(0, 2, 1)
            x = F.dropout1d(self._act(out, "dec", jj), self.drop_gcn,
                            self.training)

        out_d = F.dropout(self._act(self.bn_b_d((x @ self.conc_d)[..., 0]),
                                    "b_d"),
                          self.drop_readout, self.training)
        x_hat = out_d @ (self.gene_mask * self.gene_dec)
        return latent, x_hat, atten_out


class TorchFused(nn.Module):
    """Mirror of FusedSGCN (cross-attention fused path)."""

    def __init__(self, topo, num_layers=2, hidden=16, rois=90, feat_dim=3,
                 num_classes=2, num_regr=3, hidden_linear=64, l_dim=32,
                 num_snps=54, is_use_prob4regr=True):
        super().__init__()
        self.num_layers = num_layers
        self.rois = rois
        self.is_use_prob4regr = is_use_prob4regr
        dims = [feat_dim] + [hidden] * num_layers
        self.conv_w = nn.ParameterList(
            [nn.Parameter(torch.zeros(dims[i], dims[i + 1]))
             for i in range(num_layers)])
        self.conv_b = nn.ParameterList(
            [nn.Parameter(torch.zeros(dims[i + 1])) for i in range(num_layers)])
        self.prob = nn.Parameter(torch.zeros(rois, feat_dim))
        self.prob_bias = nn.Parameter(torch.zeros(2 * feat_dim, 1))
        self.snps_prob = nn.Parameter(torch.zeros(1, num_snps))
        dim_atten = num_layers * hidden
        self.go = TorchGoNetwork(topo, 2, 2, (5, 5), l_dim, dim_atten)
        self.mha = nn.MultiheadAttention(dim_atten, 2, batch_first=True)
        self.lin1 = nn.Linear(rois * dim_atten + l_dim, hidden_linear)
        self.lin2 = nn.Linear(hidden_linear, num_classes)
        regr_in = rois * dim_atten + l_dim + (rois * feat_dim
                                              if is_use_prob4regr else 0)
        self.lin1_regr = nn.Linear(regr_in, hidden_linear)
        self.lin2_regr = nn.Linear(hidden_linear, num_regr)
        # head dropout rates as attributes (reference hardcodes 0.5/0.3,
        # kernel/sgcn_img_snp.py:289,304) so deterministic trajectory-parity
        # tests can zero every dropout in both frameworks
        self.drop_lin = 0.5
        self.drop_regr = 0.3

    @staticmethod
    def gcn_prop(adj):
        # PyG gcn_norm uses add_REMAINING_self_loops: existing diagonal
        # weights are kept, missing ones get 1
        n = adj.shape[-1]
        eye = torch.eye(n, dtype=torch.bool)
        diag = adj.diagonal(dim1=-2, dim2=-1)
        new_diag = torch.where(diag != 0, diag, torch.ones_like(diag))
        m = torch.where(eye, new_diag[..., None, :] * eye, adj)
        deg = m.sum(-2)
        dis = torch.where(deg > 0, deg.clamp_min(1e-38).rsqrt(),
                          torch.zeros_like(deg))
        return dis[..., :, None] * m.transpose(-1, -2) * dis[..., None, :]

    def cal_probability(self, x, adj, snps):
        xp = x * self.prob
        d = x.shape[-1]
        b = self.prob_bias.reshape(-1)
        u = xp @ b[:d]
        v = xp @ b[d:]
        ep = torch.sigmoid(u[:, :, None] + v[:, None, :])
        return xp, adj * ep, snps * torch.sigmoid(self.snps_prob)

    def forward(self, x, adj, snps, is_explain=False):
        b = x.shape[0]
        if is_explain:
            x_u, adj_u, snps_u = self.cal_probability(x, adj, snps)
        else:
            x_u, adj_u, snps_u = x, adj, snps
        prop = self.gcn_prop(adj_u)
        h = x_u
        feats = []
        for i in range(self.num_layers):
            h = F.relu(torch.einsum("bij,bjf,fk->bik", prop, h,
                                    self.conv_w[i]) + self.conv_b[i])
            feats.append(h)
        batch_x = torch.cat(feats, dim=-1)
        img_out = batch_x.reshape(b, -1)
        latent, snps_hat, atten_out = self.go(snps_u)
        attn_out, _ = self.mha(batch_x, atten_out, atten_out)
        out_cross = F.relu(attn_out).reshape(b, -1)
        out_z = (img_out + out_cross) / 2
        out_lin = torch.cat([out_z, latent], dim=-1)
        linear_outf = F.relu(self.lin1(out_lin))
        logits = self.lin2(F.dropout(linear_outf, self.drop_lin,
                                     self.training))
        if self.is_use_prob4regr:
            feat4regr = torch.cat([out_lin, (x * self.prob).reshape(b, -1)], -1)
        else:
            feat4regr = out_lin
        reg = F.relu(self.lin1_regr(feat4regr))
        reg = self.lin2_regr(F.dropout(reg, self.drop_regr, self.training))
        return (F.log_softmax(logits, dim=-1), snps_hat, out_z, out_lin,
                linear_outf, reg)


def iter_go_param_pairs(torch_go: TorchGoNetwork, go_params: Dict[str, Any]):
    """Yield (name, torch_param, jax_array_in_torch_layout) pairs — the ONE
    mapping between the frameworks' GO parameter trees, used both to load
    weights (JAX -> torch) and to compare them after training steps."""
    g = go_params
    for c in range(len(torch_go.gene_enc)):
        yield f"go.gene_enc_{c}", torch_go.gene_enc[c], g[f"gene_enc_{c}"]
    yield "go.gene_dec", torch_go.gene_dec, g["gene_dec"]
    for i in range(torch_go.n_l):
        yield f"go.w_inc_{i}", torch_go.w_inc[i], g[f"w_inc_{i}"]["kernel"]
        yield (f"go.w_s_loop_{i}", torch_go.w_s_loop[i],
               g[f"w_s_loop_{i}"]["kernel"])
        yield (f"go.w_att_s_{i}", torch_go.w_att_s[i],
               g[f"w_att_s_{i}"]["kernel"])
        yield f"go.w_att_in_{i}", torch_go.w_att_in[i], g[f"w_att_in_{i}"]
        yield f"go.g_b_{i}.w", torch_go.g_b[i].weight, g[f"g_b_{i}"]["scale"]
        yield f"go.g_b_{i}.b", torch_go.g_b[i].bias, g[f"g_b_{i}"]["bias"]
        yield f"go.w_out_{i}", torch_go.w_out[i], g[f"w_out_{i}"]["kernel"]
        yield (f"go.w_s_loop_out_{i}", torch_go.w_s_loop_out[i],
               g[f"w_s_loop_out_{i}"]["kernel"])
        yield (f"go.g_b_d_{i}.w", torch_go.g_b_d[i].weight,
               g[f"g_b_d_{i}"]["scale"])
        yield (f"go.g_b_d_{i}.b", torch_go.g_b_d[i].bias,
               g[f"g_b_d_{i}"]["bias"])
    yield ("go.conc_for_attention", torch_go.conc_for_attention,
           g["conc_for_attention"]["kernel"])
    yield "go.conc", torch_go.conc, g["conc"]["kernel"]
    yield "go.conc_d", torch_go.conc_d, g["conc_d"]["kernel"]
    yield "go.latent1", torch_go.latent1, g["latent1"]["kernel"]
    yield "go.latent2", torch_go.latent2, g["latent2"]["kernel"]
    bn_names = ["bn_atten", "bn_b", "bn_b_d", "bn_latent1", "bn_latent2"]
    if torch_go.activation == "prelu":
        # the prelu variant's latent MLP ends without bn_latent2
        # (guide_go_model.py:138-144); the flax module never calls it, so
        # its params do not exist in the JAX tree
        bn_names.remove("bn_latent2")
        for i in range(torch_go.n_l):
            yield (f"go.act_enc_{i}", torch_go.acts_enc[i].weight,
                   g[f"act_enc_{i}"]["alpha"])
            yield (f"go.act_dec_{i}", torch_go.acts_dec[i].weight,
                   g[f"act_dec_{i}"]["alpha"])
        for site in ["atten", "b", "b_d", "latent1"]:
            yield (f"go.act_{site}", getattr(torch_go, f"act_{site}").weight,
                   g[f"act_{site}"]["alpha"])
    for bn_name in bn_names:
        bn = getattr(torch_go, bn_name)
        yield f"go.{bn_name}.w", bn.weight, g[bn_name]["scale"]
        yield f"go.{bn_name}.b", bn.bias, g[bn_name]["bias"]


def iter_fused_param_pairs(torch_model: TorchFused, params: Dict[str, Any]):
    """(name, torch_param, jax_array_in_torch_layout) for the fused model
    (linear kernels are transposed into torch's (out, in) layout)."""
    if hasattr(torch_model, "conv_w"):   # the GAT variant replaces the stack
        for i in range(torch_model.num_layers):
            yield f"conv_w_{i}", torch_model.conv_w[i], params[f"conv_w_{i}"]
            yield f"conv_b_{i}", torch_model.conv_b[i], params[f"conv_b_{i}"]
    yield "prob", torch_model.prob, params["prob"]
    yield "prob_bias", torch_model.prob_bias, params["prob_bias"]
    yield "snps_prob", torch_model.snps_prob, params["snps_prob"]
    yield ("mha.in_proj_weight", torch_model.mha.in_proj_weight,
           params["mha_in_proj_weight"])
    yield ("mha.in_proj_bias", torch_model.mha.in_proj_bias,
           params["mha_in_proj_bias"])
    yield ("mha.out_proj.weight", torch_model.mha.out_proj.weight,
           params["mha_out_proj_weight"])
    yield ("mha.out_proj.bias", torch_model.mha.out_proj.bias,
           params["mha_out_proj_bias"])
    for name in ["lin1", "lin2", "lin1_regr", "lin2_regr"]:
        lin = getattr(torch_model, name)
        yield (f"{name}.weight", lin.weight,
               np.asarray(params[name]["kernel"]).T)
        yield f"{name}.bias", lin.bias, params[name]["bias"]
    yield from iter_go_param_pairs(torch_model.go, params["go_network"])


def load_go_params(torch_go: TorchGoNetwork, go_params: Dict[str, Any]) -> None:
    with torch.no_grad():
        for _, t, a in iter_go_param_pairs(torch_go, go_params):
            t.copy_(_t(a))


def load_fused_params(torch_model: TorchFused, params: Dict[str, Any]) -> None:
    with torch.no_grad():
        for _, t, a in iter_fused_param_pairs(torch_model, params):
            t.copy_(_t(a))


class TorchGoClassifier(nn.Module):
    """SNP-only classifier mirror: TorchGoNetwork + the classification head
    (`kernel/go_model.py:148-157`; mirrors `GeneOntologyNetwork.classify`).
    Used by the SNP-trainer trajectory-parity test."""

    def __init__(self, topo, in_f_dim=2, n_l=2, f_dim=(5, 5), l_dim=32):
        super().__init__()
        self.go = TorchGoNetwork(topo, in_f_dim=in_f_dim, n_l=n_l,
                                 f_dim=f_dim, l_dim=l_dim)
        num_snps = topo.go_snps.shape[1]
        self.bn_cls = nn.BatchNorm1d(l_dim + num_snps)
        self.cls1 = nn.Linear(l_dim + num_snps, 16, bias=False)
        self.cls2 = nn.Linear(16, 1)
        self.drop_cls = (0.5, 0.3)

    def forward(self, snps):
        latent, x_hat, _ = self.go(snps)
        h = torch.cat([latent, snps], dim=-1)
        h = F.dropout(F.relu(self.bn_cls(h)), self.drop_cls[0],
                      self.training)
        h = F.dropout(F.relu(self.cls1(h)), self.drop_cls[1], self.training)
        y_hat = torch.sigmoid(self.cls2(h))
        return latent, x_hat, y_hat


def iter_go_classifier_param_pairs(tm: TorchGoClassifier,
                                   params: Dict[str, Any]):
    """(name, torch_param, jax_array_in_torch_layout) for the SNP-only
    classifier — `params` is the standalone GeneOntologyNetwork tree (body
    and head share one flax scope there, unlike the fused model's
    'go_network' sub-tree)."""
    yield from iter_go_param_pairs(tm.go, params)
    yield "bn_cls.w", tm.bn_cls.weight, params["bn_cls"]["scale"]
    yield "bn_cls.b", tm.bn_cls.bias, params["bn_cls"]["bias"]
    yield ("cls1.weight", tm.cls1.weight,
           np.asarray(params["cls1"]["kernel"]).T)
    yield ("cls2.weight", tm.cls2.weight,
           np.asarray(params["cls2"]["kernel"]).T)
    yield "cls2.bias", tm.cls2.bias, params["cls2"]["bias"]


def load_go_classifier_params(tm: TorchGoClassifier,
                              params: Dict[str, Any]) -> None:
    with torch.no_grad():
        for _, t, a in iter_go_classifier_param_pairs(tm, params):
            t.copy_(_t(a))


class TorchSnpMLP(nn.Module):
    """Mirror of `MLPModel` (`kernel/mlp.py:74-119`): 54 -> 32 -> 16 -> 1
    sigmoid SNP classifier, dropout after fc1 only."""

    def __init__(self, num_snps: int):
        super().__init__()
        self.fc1 = nn.Linear(num_snps, 32)
        self.fc2 = nn.Linear(32, 16)
        self.fc3 = nn.Linear(16, 1)
        self.drop = 0.3

    def forward(self, snps):
        h = F.dropout(F.relu(self.fc1(snps)), self.drop, self.training)
        h = F.relu(self.fc2(h))
        return torch.sigmoid(self.fc3(h))


def iter_snp_mlp_param_pairs(tm: TorchSnpMLP, params: Dict[str, Any]):
    for name in ("fc1", "fc2", "fc3"):
        lin = getattr(tm, name)
        yield (f"{name}.weight", lin.weight,
               np.asarray(params[name]["kernel"]).T)
        yield f"{name}.bias", lin.bias, params[name]["bias"]


def load_snp_mlp_params(tm: TorchSnpMLP, params: Dict[str, Any]) -> None:
    with torch.no_grad():
        for _, t, a in iter_snp_mlp_param_pairs(tm, params):
            t.copy_(_t(a))


class TorchClusterLabel(nn.Module):
    """Mirror of ClusterLabelSGCN (`kernel/sgcn_img_snp_clusterlabel.py:13-228`
    as rebuilt in `models/clusterlabel.py`): the fused skeleton with disease +
    cluster classification heads and no regression head."""

    def __init__(self, topo, num_layers=2, hidden=16, rois=90, feat_dim=3,
                 num_classes=2, num_cluster=2, hidden_linear=64, l_dim=32,
                 num_snps=54, is_predict_cluster=True):
        super().__init__()
        self.num_layers = num_layers
        self.is_predict_cluster = is_predict_cluster
        dims = [feat_dim] + [hidden] * num_layers
        self.conv_w = nn.ParameterList(
            [nn.Parameter(torch.zeros(dims[i], dims[i + 1]))
             for i in range(num_layers)])
        self.conv_b = nn.ParameterList(
            [nn.Parameter(torch.zeros(dims[i + 1])) for i in range(num_layers)])
        self.prob = nn.Parameter(torch.zeros(rois, feat_dim))
        self.prob_bias = nn.Parameter(torch.zeros(2 * feat_dim, 1))
        self.snps_prob = nn.Parameter(torch.zeros(1, num_snps))
        dim_atten = num_layers * hidden
        self.go = TorchGoNetwork(topo, 2, 2, (5, 5), l_dim, dim_atten)
        self.mha = nn.MultiheadAttention(dim_atten, 2, batch_first=True)
        self.lin1_classify = nn.Linear(rois * dim_atten + l_dim, hidden_linear)
        self.lin2_classify = nn.Linear(hidden_linear, num_classes)
        self.lin1_cluster = nn.Linear(rois * dim_atten + l_dim, hidden_linear)
        self.lin2_cluster = nn.Linear(hidden_linear, num_cluster)
        self.drop_head = 0.5

    def forward(self, x, adj, snps, is_explain=False):
        b = x.shape[0]
        if is_explain:
            x_u, adj_u, snps_u = TorchFused.cal_probability(self, x, adj, snps)
        else:
            x_u, adj_u, snps_u = x, adj, snps
        prop = TorchFused.gcn_prop(adj_u)
        h = x_u
        feats = []
        for i in range(self.num_layers):
            h = F.relu(torch.einsum("bij,bjf,fk->bik", prop, h,
                                    self.conv_w[i]) + self.conv_b[i])
            feats.append(h)
        batch_x = torch.cat(feats, dim=-1)
        img_out = batch_x.reshape(b, -1)
        latent, snps_hat, atten_out = self.go(snps_u)
        attn_out, _ = self.mha(batch_x, atten_out, atten_out)
        cross = F.relu(attn_out).reshape(b, -1)
        out_z = torch.cat([(img_out + cross) / 2, latent], dim=-1)

        cluster_in = out_z if self.is_predict_cluster \
            else torch.zeros_like(out_z)
        hc = F.dropout(F.relu(self.lin1_cluster(cluster_in)), self.drop_head,
                       self.training)
        logits_cluster = self.lin2_cluster(hc)
        hd = F.dropout(F.relu(self.lin1_classify(out_z)), self.drop_head,
                       self.training)
        logits = self.lin2_classify(hd)
        return (F.log_softmax(logits, dim=-1),
                F.log_softmax(logits_cluster, dim=-1), snps_hat, out_z)


def iter_clusterlabel_param_pairs(tm: TorchClusterLabel,
                                  params: Dict[str, Any]):
    for i in range(tm.num_layers):
        yield f"conv_w_{i}", tm.conv_w[i], params[f"conv_w_{i}"]
        yield f"conv_b_{i}", tm.conv_b[i], params[f"conv_b_{i}"]
    yield "prob", tm.prob, params["prob"]
    yield "prob_bias", tm.prob_bias, params["prob_bias"]
    yield "snps_prob", tm.snps_prob, params["snps_prob"]
    yield ("mha.in_proj_weight", tm.mha.in_proj_weight,
           params["mha_in_proj_weight"])
    yield "mha.in_proj_bias", tm.mha.in_proj_bias, params["mha_in_proj_bias"]
    yield ("mha.out_proj.weight", tm.mha.out_proj.weight,
           params["mha_out_proj_weight"])
    yield ("mha.out_proj.bias", tm.mha.out_proj.bias,
           params["mha_out_proj_bias"])
    for name in ["lin1_classify", "lin2_classify", "lin1_cluster",
                 "lin2_cluster"]:
        lin = getattr(tm, name)
        yield (f"{name}.weight", lin.weight,
               np.asarray(params[name]["kernel"]).T)
        yield f"{name}.bias", lin.bias, params[name]["bias"]
    yield from iter_go_param_pairs(tm.go, params["go_network"])


def load_clusterlabel_params(tm: TorchClusterLabel,
                             params: Dict[str, Any]) -> None:
    with torch.no_grad():
        for _, t, a in iter_clusterlabel_param_pairs(tm, params):
            t.copy_(_t(a))


class TorchGuide(nn.Module):
    """Mirror of GuideImgSnp (`kernel/guide_img_snp.py:14-135` as rebuilt in
    `models/guide.py`): MLP autoencoder imaging branch with a straight-through
    Gumbel-softmax hard feature mask, PReLU GO branch, latent-average fusion.

    `gumbel_zero=True` replaces the Gumbel noise with zeros — the
    deterministic parity mode matching `GuideImgSnp(gumbel_zero=True)`
    (framework PRNGs cannot be aligned, same principle as zeroed dropout)."""

    def __init__(self, topo, rois=90, feat_dim=3, num_classes=2, num_regr=3,
                 hidden_linear=32, l_dim=32, go_hidden=16, gumbel_zero=True):
        super().__init__()
        d = rois * feat_dim
        self.gumbel_zero = gumbel_zero
        self.enc1 = nn.Linear(d, hidden_linear, bias=False)
        self.enc_act = nn.PReLU()
        self.enc2 = nn.Linear(hidden_linear, l_dim, bias=False)
        self.dec_bn1 = nn.BatchNorm1d(l_dim)
        self.dec_act1 = nn.PReLU()
        self.dec1 = nn.Linear(l_dim, hidden_linear, bias=False)
        self.dec_bn2 = nn.BatchNorm1d(hidden_linear)
        self.dec_act2 = nn.PReLU()
        self.dec2 = nn.Linear(hidden_linear, d, bias=False)
        self.bias_n = nn.Parameter(torch.zeros(d, 2))
        self.go = TorchGoNetwork(topo, 2, 2, (5, 5), l_dim, go_hidden,
                                 activation="prelu")
        self.lin1 = nn.Linear(l_dim, hidden_linear)
        self.lin2 = nn.Linear(hidden_linear, num_classes)
        self.lin1_regr = nn.Linear(l_dim, hidden_linear)
        self.lin2_regr = nn.Linear(hidden_linear, num_regr)
        self.drop_enc = 0.4
        self.drop_dec = 0.4
        self.drop_lin = 0.5
        self.drop_regr = 0.3

    def forward(self, x, adj, snps, temperature=0.1):
        del adj  # imaging branch is an MLP over flattened features
        b = x.shape[0]
        img_out = x.reshape(b, -1)
        imp = F.softmax(self.bias_n, dim=1)
        if self.training:
            g = torch.zeros(b, *self.bias_n.shape) if self.gumbel_zero else \
                -torch.log(-torch.log(torch.rand(b, *self.bias_n.shape)))
            logits = (torch.log(imp)[None] + g) / temperature
            soft = F.softmax(logits, dim=-1)
            hard = F.one_hot(logits.argmax(-1), 2).to(soft.dtype)
            z = hard + soft - soft.detach()
            x_in = img_out * z[:, :, 1]
        else:
            x_in = img_out

        latent_g, snps_hat, _ = self.go(snps)
        h = F.dropout(self.enc_act(self.enc1(x_in)), self.drop_enc,
                      self.training)
        latent_n = self.enc2(h)
        latent = (latent_g + latent_n) / 2

        r = F.dropout(self.dec_act1(self.dec_bn1(latent)), self.drop_dec,
                      self.training)
        r = self.dec1(r)
        r = F.dropout(self.dec_act2(self.dec_bn2(r)), self.drop_dec,
                      self.training)
        recon = self.dec2(r)

        linear_outf = F.relu(self.lin1(latent))
        logits_cls = self.lin2(F.dropout(linear_outf, self.drop_lin,
                                         self.training))
        reg = F.relu(self.lin1_regr(latent))
        reg = self.lin2_regr(F.dropout(reg, self.drop_regr, self.training))
        return (F.log_softmax(logits_cls, dim=-1), snps_hat, latent, reg,
                img_out, recon, imp[:, 1])


def iter_guide_param_pairs(tm: TorchGuide, params: Dict[str, Any]):
    for name in ["enc1", "enc2", "dec1", "dec2"]:
        lin = getattr(tm, name)
        yield (f"{name}.weight", lin.weight,
               np.asarray(params[name]["kernel"]).T)
    for name in ["enc_act", "dec_act1", "dec_act2"]:
        yield name, getattr(tm, name).weight, params[name]["alpha"]
    for name in ["dec_bn1", "dec_bn2"]:
        bn = getattr(tm, name)
        yield f"{name}.w", bn.weight, params[name]["scale"]
        yield f"{name}.b", bn.bias, params[name]["bias"]
    yield "bias_n", tm.bias_n, params["bias_n"]
    for name in ["lin1", "lin2", "lin1_regr", "lin2_regr"]:
        lin = getattr(tm, name)
        yield (f"{name}.weight", lin.weight,
               np.asarray(params[name]["kernel"]).T)
        yield f"{name}.bias", lin.bias, params[name]["bias"]
    yield from iter_go_param_pairs(tm.go, params["go_network"])


def load_guide_params(tm: TorchGuide, params: Dict[str, Any]) -> None:
    with torch.no_grad():
        for _, t, a in iter_guide_param_pairs(tm, params):
            t.copy_(_t(a))


class TorchSgcnOri(nn.Module):
    """Mirror of SGCNOri (`kernel/sgcn.py:11-151` as rebuilt in
    `models/sgcn_image.py`): fixed conv1 -> conv3 image-only SGCN with the
    concat readout and fc1/bn1 -> fc2/bn2 -> fc3 head."""

    def __init__(self, rois=90, h0=3, h1=32, h3=5, num_classes=2, dim2=64,
                 dim3=16):
        super().__init__()
        self.conv1_w = nn.Parameter(torch.zeros(h0, h1))
        self.conv1_b = nn.Parameter(torch.zeros(h1))
        self.conv3_w = nn.Parameter(torch.zeros(h1, h3))
        self.conv3_b = nn.Parameter(torch.zeros(h3))
        self.fc1 = nn.Linear(rois * (h1 + h3), dim2)
        self.bn1 = nn.BatchNorm1d(dim2)
        self.fc2 = nn.Linear(dim2, dim3)
        self.bn2 = nn.BatchNorm1d(dim3)
        self.fc3 = nn.Linear(dim3, num_classes)
        self.prob = nn.Parameter(torch.zeros(rois, h0))
        self.prob_bias = nn.Parameter(torch.zeros(2 * h0, 1))
        self.drop1 = 0.5
        self.drop2 = 0.7

    def cal_probability(self, x, adj):
        xp = x * self.prob
        d = x.shape[-1]
        bvec = self.prob_bias.reshape(-1)
        u = xp @ bvec[:d]
        v = xp @ bvec[d:]
        ep = torch.sigmoid(u[:, :, None] + v[:, None, :])
        return xp, adj * ep

    def forward(self, x, adj, is_explain=False):
        b = x.shape[0]
        if is_explain:
            x_u, adj_u = self.cal_probability(x, adj)
        else:
            x_u, adj_u = x, adj
        prop = TorchFused.gcn_prop(adj_u)
        h1 = F.relu(torch.einsum("bij,bjf,fk->bik", prop, x_u, self.conv1_w)
                    + self.conv1_b)
        acts = torch.einsum("bij,bjf,fk->bik", prop, h1, self.conv3_w) \
            + self.conv3_b
        h3 = F.relu(acts)
        z = torch.cat([h1.reshape(b, -1), h3.reshape(b, -1)], dim=-1)
        z = F.dropout(self.bn1(F.relu(self.fc1(z))), self.drop1,
                      self.training)
        z = F.dropout(self.bn2(F.relu(self.fc2(z))), self.drop2,
                      self.training)
        return F.log_softmax(self.fc3(z), dim=-1)


def iter_sgcn_ori_param_pairs(tm: TorchSgcnOri, params: Dict[str, Any]):
    yield "conv1_w", tm.conv1_w, params["conv1_w"]
    yield "conv1_b", tm.conv1_b, params["conv1_b"]
    yield "conv3_w", tm.conv3_w, params["conv3_w"]
    yield "conv3_b", tm.conv3_b, params["conv3_b"]
    yield "prob", tm.prob, params["prob"]
    yield "prob_bias", tm.prob_bias, params["prob_bias"]
    for name in ["fc1", "fc2", "fc3"]:
        lin = getattr(tm, name)
        yield (f"{name}.weight", lin.weight,
               np.asarray(params[name]["kernel"]).T)
        yield f"{name}.bias", lin.bias, params[name]["bias"]
    for name in ["bn1", "bn2"]:
        bn = getattr(tm, name)
        yield f"{name}.w", bn.weight, params[name]["scale"]
        yield f"{name}.b", bn.bias, params[name]["bias"]


def load_sgcn_ori_params(tm: TorchSgcnOri, params: Dict[str, Any]) -> None:
    with torch.no_grad():
        for _, t, a in iter_sgcn_ori_param_pairs(tm, params):
            t.copy_(_t(a))


class TorchSgcnImage(nn.Module):
    """Mirror of SGCNImage (SGCN_GCN, `kernel/sgcn.py:272-387` as rebuilt in
    `models/sgcn_image.py`): configurable-depth JK-concat conv stack, flatten
    readout, lin1/lin2 head. No batch norms — unlike SGCNOri this family's
    training trajectory has no relu->BN gradient-degenerate head biases, so
    every parameter holds elementwise over multiple steps."""

    def __init__(self, num_layers=2, hidden=16, rois=90, feat_dim=3,
                 num_classes=2, hidden_linear=64):
        super().__init__()
        self.num_layers = num_layers
        dims = [feat_dim] + [hidden] * num_layers
        self.conv_w = nn.ParameterList(
            [nn.Parameter(torch.zeros(dims[i], dims[i + 1]))
             for i in range(num_layers)])
        self.conv_b = nn.ParameterList(
            [nn.Parameter(torch.zeros(dims[i + 1])) for i in range(num_layers)])
        self.prob = nn.Parameter(torch.zeros(rois, feat_dim))
        self.prob_bias = nn.Parameter(torch.zeros(2 * feat_dim, 1))
        self.lin1 = nn.Linear(rois * hidden * num_layers, hidden_linear)
        self.lin2 = nn.Linear(hidden_linear, num_classes)
        self.drop = 0.5

    def forward(self, x, adj, is_explain=False):
        b = x.shape[0]
        if is_explain:
            x_u, adj_u = TorchSgcnOri.cal_probability(self, x, adj)
        else:
            x_u, adj_u = x, adj
        prop = TorchFused.gcn_prop(adj_u)
        h = x_u
        feats = []
        for i in range(self.num_layers):
            h = F.relu(torch.einsum("bij,bjf,fk->bik", prop, h,
                                    self.conv_w[i]) + self.conv_b[i])
            feats.append(h)
        z = torch.cat(feats, dim=-1).reshape(b, -1)
        z = F.dropout(F.relu(self.lin1(z)), self.drop, self.training)
        return F.log_softmax(self.lin2(z), dim=-1)


def iter_sgcn_image_param_pairs(tm: TorchSgcnImage, params: Dict[str, Any]):
    for i in range(tm.num_layers):
        yield f"conv_w_{i}", tm.conv_w[i], params[f"conv_w_{i}"]
        yield f"conv_b_{i}", tm.conv_b[i], params[f"conv_b_{i}"]
    yield "prob", tm.prob, params["prob"]
    yield "prob_bias", tm.prob_bias, params["prob_bias"]
    for name in ["lin1", "lin2"]:
        lin = getattr(tm, name)
        yield (f"{name}.weight", lin.weight,
               np.asarray(params[name]["kernel"]).T)
        yield f"{name}.bias", lin.bias, params[name]["bias"]


def load_sgcn_image_params(tm: TorchSgcnImage, params: Dict[str, Any]) -> None:
    with torch.no_grad():
        for _, t, a in iter_sgcn_image_param_pairs(tm, params):
            t.copy_(_t(a))


class TorchGcnFlat(nn.Module):
    """Mirror of GCNFlat (`kernel/gcn.py:87-123` as rebuilt in
    `models/baselines.py`): JK-concat GCN + flatten readout + lin1/lin2 —
    the generic zoo trainer's plain-NLL workhorse."""

    def __init__(self, num_layers=2, hidden=16, rois=90, feat_dim=3,
                 num_classes=2, hidden_linear=64):
        super().__init__()
        self.num_layers = num_layers
        dims = [feat_dim] + [hidden] * num_layers
        self.conv_w = nn.ParameterList(
            [nn.Parameter(torch.zeros(dims[i], dims[i + 1]))
             for i in range(num_layers)])
        self.conv_b = nn.ParameterList(
            [nn.Parameter(torch.zeros(dims[i + 1])) for i in range(num_layers)])
        self.lin1 = nn.Linear(rois * hidden * num_layers, hidden_linear)
        self.lin2 = nn.Linear(hidden_linear, num_classes)
        self.drop = 0.5

    def forward(self, x, adj):
        b = x.shape[0]
        prop = TorchFused.gcn_prop(adj)
        h = x
        feats = []
        for i in range(self.num_layers):
            h = F.relu(torch.einsum("bij,bjf,fk->bik", prop, h,
                                    self.conv_w[i]) + self.conv_b[i])
            feats.append(h)
        z = torch.cat(feats, dim=-1).reshape(b, -1)
        z = F.dropout(F.relu(self.lin1(z)), self.drop, self.training)
        return F.log_softmax(self.lin2(z), dim=-1)


def iter_gcn_flat_param_pairs(tm: TorchGcnFlat, params: Dict[str, Any]):
    for i in range(tm.num_layers):
        yield f"conv_w_{i}", tm.conv_w[i], params[f"conv_w_{i}"]
        yield f"conv_b_{i}", tm.conv_b[i], params[f"conv_b_{i}"]
    for name in ["lin1", "lin2"]:
        lin = getattr(tm, name)
        yield (f"{name}.weight", lin.weight,
               np.asarray(params[name]["kernel"]).T)
        yield f"{name}.bias", lin.bias, params[name]["bias"]


def load_gcn_flat_params(tm: TorchGcnFlat, params: Dict[str, Any]) -> None:
    with torch.no_grad():
        for _, t, a in iter_gcn_flat_param_pairs(tm, params):
            t.copy_(_t(a))
