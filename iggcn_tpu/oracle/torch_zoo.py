"""Independent torch re-derivations of the baseline zoo for golden parity.

Pattern: `oracle/torch_ref.py` `TorchGcnFlat` — each mirror rebuilds the
REFERENCE model's math (kernel/gin.py, graph_sage.py, top_k.py,
sort_pool.py, set2set.py, global_attention.py, graclus.py, diff_pool.py)
in torch on dense masked batches, registers parameters under the same
names as the flax module, and loads a flax param tree via `load_flax`.
The value of the pin comes from the INDEPENDENT primitives: torch's own
`nn.LSTM` (gate order/layout), `nn.BatchNorm1d` (masked batch stats),
`nn.Conv1d`, `torch.topk`/`torch.sort` (selection), per-sample Python
loops where the JAX side uses vectorized masked ops. PyG itself is not
installable here; these mirrors follow the published PyG-2.0.2 op
semantics the reference imports (SAGEConv/GraphConv(aggr='mean') =
lin_root(x) + lin_rel(mean of in-neighbors); TopKPooling score x·w/‖w‖,
keep ceil(ratio·n), gate by tanh; global_sort_pool sort by last channel,
zero-pad to k; Set2Set over nn.LSTM; GlobalAttention masked softmax;
graclus+max_pool cluster feature-max with binary coarsened connectivity;
DenseSAGEConv row-sum-normalized aggregation + dense_diff_pool).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a).copy())


def _load_linear(lin: nn.Linear, tree: Dict[str, Any]) -> None:
    """flax TorchLinear {kernel (in, out), bias} -> torch Linear."""
    with torch.no_grad():
        lin.weight.copy_(_t(tree["kernel"]).T)
        if lin.bias is not None:
            lin.bias.copy_(_t(tree["bias"]))


def _neighbor_mean(x: torch.Tensor, adj: torch.Tensor) -> torch.Tensor:
    """Mean of in-neighbors: edge r->c (adj[r, c] != 0) aggregates x[r] at
    node c — PyG's source_to_target flow on edge_index built from a dense
    adjacency."""
    a = (adj != 0).to(x.dtype)
    indeg = a.sum(dim=1)                                   # (B, N) at c
    return torch.matmul(a.transpose(1, 2), x) / indeg.clamp(min=1.0)[..., None]


class _SageStack(nn.Module):
    """Shared conv stack: SAGEConv / GraphConv(aggr='mean') layers with the
    flax zoo's parameter names (w_self_i, w_nb_i, b_i)."""

    def __init__(self, dims):
        super().__init__()
        self.w_self = nn.ParameterList(
            [nn.Parameter(torch.zeros(i, o)) for i, o in dims])
        self.w_nb = nn.ParameterList(
            [nn.Parameter(torch.zeros(i, o)) for i, o in dims])
        self.b = nn.ParameterList(
            [nn.Parameter(torch.zeros(o)) for _, o in dims])

    def load_flax(self, params, offset: int = 0) -> None:
        with torch.no_grad():
            for i in range(len(self.w_self)):
                self.w_self[i].copy_(_t(params[f"w_self_{i + offset}"]))
                self.w_nb[i].copy_(_t(params[f"w_nb_{i + offset}"]))
                self.b[i].copy_(_t(params[f"b_{i + offset}"]))

    def layer(self, i: int, h: torch.Tensor, adj: torch.Tensor,
              mask: torch.Tensor) -> torch.Tensor:
        out = h @ self.w_self[i] + _neighbor_mean(h, adj) @ self.w_nb[i]
        return F.relu(out + self.b[i]) * mask[..., None].to(h.dtype)


class TorchZooSAGE(nn.Module):
    """`GraphSAGE`(±JK) (`kernel/graph_sage.py:79-142`)."""

    def __init__(self, num_layers=2, hidden=16, feat_dim=4, num_classes=2,
                 jk=True):
        super().__init__()
        self.jk = jk
        dims = [(feat_dim, hidden)] + [(hidden, hidden)] * (num_layers - 1)
        self.stack = _SageStack(dims)
        self.lin1 = nn.Linear(hidden * (num_layers if jk else 1), hidden)
        self.lin2 = nn.Linear(hidden, num_classes)

    def load_flax(self, params) -> None:
        self.stack.load_flax(params)
        _load_linear(self.lin1, params["lin1"])
        _load_linear(self.lin2, params["lin2"])

    def forward(self, x, adj, mask):
        feats = []
        h = x
        for i in range(len(self.stack.w_self)):
            h = self.stack.layer(i, h, adj, mask)
            feats.append(h)
        z = torch.cat(feats, -1) if self.jk else feats[-1]
        m = mask[..., None].to(x.dtype)
        z = (z * m).sum(1) / m.sum(1).clamp(min=1.0)      # masked mean pool
        z = F.relu(self.lin1(z))
        return F.log_softmax(self.lin2(z), dim=-1)


class TorchZooGIN(nn.Module):
    """`GIN`/`GIN0` (`kernel/gin.py:119-236`) with REAL nn.BatchNorm1d over
    the valid-node flat list (PyG operates on the ragged node list; masked
    rows never exist there). `train_eps=True` = reference GIN: learned eps,
    MLP Linear-ReLU-Linear-ReLU-BN, mean-pool; False = GIN0: eps 0, MLP
    Linear-BN-ReLU-Linear-BN-ReLU, add-pool."""

    def __init__(self, num_layers=2, hidden=16, feat_dim=4, num_classes=2,
                 train_eps=True):
        super().__init__()
        self.train_eps = train_eps
        self.num_layers = num_layers
        dims = [feat_dim] + [hidden] * num_layers
        self.l1 = nn.ModuleList([nn.Linear(dims[i], hidden)
                                 for i in range(num_layers)])
        self.l2 = nn.ModuleList([nn.Linear(hidden, hidden)
                                 for i in range(num_layers)])
        self.bn1 = nn.ModuleList([nn.BatchNorm1d(hidden)
                                  for _ in range(num_layers)])
        self.bn2 = None if train_eps else nn.ModuleList(
            [nn.BatchNorm1d(hidden) for _ in range(num_layers)])
        if train_eps:
            self.eps = nn.ParameterList([nn.Parameter(torch.zeros(()))
                                         for _ in range(num_layers)])
        self.lin1 = nn.Linear(num_layers * hidden, hidden)
        self.lin2 = nn.Linear(hidden, num_classes)

    def load_flax(self, params, stats) -> None:
        with torch.no_grad():
            for i in range(self.num_layers):
                mlp, st = params[f"mlp_{i}"], stats[f"mlp_{i}"]
                _load_linear(self.l1[i], mlp["l1"])
                _load_linear(self.l2[i], mlp["l2"])
                for bn_list, tag in ((self.bn1, "bn1"), (self.bn2, "bn2")):
                    if bn_list is None:
                        continue
                    bn = bn_list[i]
                    bn.weight.copy_(_t(mlp[tag]["scale"]))
                    bn.bias.copy_(_t(mlp[tag]["bias"]))
                    bn.running_mean.copy_(_t(st[tag]["mean"]))
                    bn.running_var.copy_(_t(st[tag]["var"]))
                if self.train_eps:
                    self.eps[i].copy_(_t(params[f"eps_{i}"]))
            _load_linear(self.lin1, params["lin1"])
            _load_linear(self.lin2, params["lin2"])

    def _bn(self, bn: nn.BatchNorm1d, h: torch.Tensor, mask: torch.Tensor
            ) -> torch.Tensor:
        """BN over the flat VALID rows only (train mode uses their batch
        stats), masked rows pass through running stats (they are zeroed by
        the caller anyway)."""
        b, n, f = h.shape
        flat = h.reshape(b * n, f)
        idx = mask.reshape(b * n)
        out = torch.zeros_like(flat)
        out[idx] = bn(flat[idx])
        with torch.no_grad():
            bn.eval()
            out[~idx] = bn(flat[~idx])
            bn.train(self.training)
        return out.reshape(b, n, f)

    def forward(self, x, adj, mask):
        a = (adj != 0).to(x.dtype)
        feats = []
        h = x
        for i in range(self.num_layers):
            eps = self.eps[i] if self.train_eps else 0.0
            agg = (1.0 + eps) * h + torch.matmul(a.transpose(1, 2), h)
            if self.train_eps:       # GIN: L-ReLU-L-ReLU-BN
                z = F.relu(self.l1[i](agg))
                z = F.relu(self.l2[i](z))
                h = self._bn(self.bn1[i], z, mask)
            else:                    # GIN0: L-BN-ReLU-L-BN-ReLU
                z = F.relu(self._bn(self.bn1[i], self.l1[i](agg), mask))
                h = F.relu(self._bn(self.bn2[i], self.l2[i](z), mask))
            h = h * mask[..., None].to(x.dtype)
            feats.append(h)
        z = torch.cat(feats, -1)
        m = mask[..., None].to(x.dtype)
        if self.train_eps:
            z = (z * m).sum(1) / m.sum(1).clamp(min=1.0)   # mean pool
        else:
            z = (z * m).sum(1)                             # add pool
        z = F.relu(self.lin1(z))
        return F.log_softmax(self.lin2(z), dim=-1)


class TorchZooTopK(nn.Module):
    """`TopK` (`kernel/top_k.py:15-40`): GraphConv(mean) stack, per-layer
    mean-pool readout, TopKPooling(0.8) after convs with even index — the
    selection runs through torch.topk per sample."""

    def __init__(self, num_layers=3, hidden=16, feat_dim=4, num_classes=2,
                 ratio=0.8):
        super().__init__()
        self.ratio = ratio
        dims = [(feat_dim, hidden)] + [(hidden, hidden)] * (num_layers - 1)
        self.stack = _SageStack(dims)
        self.pool_w = nn.ParameterList(
            [nn.Parameter(torch.zeros(hidden))
             for i in range(num_layers - 1) if i % 2 == 0])
        self.lin1 = nn.Linear(num_layers * hidden, hidden)
        self.lin2 = nn.Linear(hidden, num_classes)

    def load_flax(self, params) -> None:
        self.stack.load_flax(params)
        with torch.no_grad():
            for j, i in enumerate(i for i in range(len(self.stack.w_self) - 1)
                                  if i % 2 == 0):
                self.pool_w[j].copy_(_t(params[f"pool_w_{i}"]))
        _load_linear(self.lin1, params["lin1"])
        _load_linear(self.lin2, params["lin2"])

    @staticmethod
    def _mean_pool(h, mask):
        m = mask[..., None].to(h.dtype)
        return (h * m).sum(1) / m.sum(1).clamp(min=1.0)

    def forward(self, x, adj, mask):
        h = self.stack.layer(0, x, adj, mask)
        readouts = [self._mean_pool(h, mask)]
        pool_j = 0
        for i in range(len(self.stack.w_self) - 1):
            h = self.stack.layer(i + 1, h, adj, mask)
            readouts.append(self._mean_pool(h, mask))
            if i % 2 == 0:
                w = self.pool_w[pool_j]
                pool_j += 1
                score = h @ (w / w.norm().clamp(min=1e-12))
                keep = torch.zeros_like(mask)
                for s in range(h.shape[0]):                 # per-sample topk
                    valid = mask[s].nonzero(as_tuple=True)[0]
                    k = int(math.ceil(self.ratio * len(valid)))
                    top = torch.topk(score[s, valid], k).indices
                    keep[s, valid[top]] = True
                h = torch.where(keep[..., None], h * torch.tanh(score)[..., None],
                                torch.zeros_like(h))
                adj = torch.where(keep[:, :, None] & keep[:, None, :], adj,
                                  torch.zeros_like(adj))
                mask = keep
        z = torch.cat(readouts, -1)
        z = F.relu(self.lin1(z))
        return F.log_softmax(self.lin2(z), dim=-1)


class TorchZooSortPool(nn.Module):
    """`SortPool` (`kernel/sort_pool.py:11-73`, non-`original` branch): GCN
    stack -> global_sort_pool (torch.sort by last channel, zero-pad to k)
    -> REAL nn.Conv1d(hidden, 32, 5) -> lin1/lin2."""

    def __init__(self, num_layers=2, hidden=16, feat_dim=4, num_classes=2,
                 k=30, conv1d_channels=32, conv1d_kernel=5):
        super().__init__()
        self.k = k
        self.num_layers = num_layers
        dims = [feat_dim] + [hidden] * num_layers
        self.conv_w = nn.ParameterList(
            [nn.Parameter(torch.zeros(dims[i], dims[i + 1]))
             for i in range(num_layers)])
        self.conv_b = nn.ParameterList(
            [nn.Parameter(torch.zeros(dims[i + 1]))
             for i in range(num_layers)])
        self.conv1d = nn.Conv1d(hidden, conv1d_channels, conv1d_kernel)
        self.lin1 = nn.Linear(conv1d_channels * (k - conv1d_kernel + 1),
                              hidden)
        self.lin2 = nn.Linear(hidden, num_classes)

    def load_flax(self, params) -> None:
        with torch.no_grad():
            for i in range(self.num_layers):
                self.conv_w[i].copy_(_t(params[f"conv_w_{i}"]))
                self.conv_b[i].copy_(_t(params[f"conv_b_{i}"]))
            # flax nn.Conv kernel (window, in, out) -> torch (out, in, window)
            self.conv1d.weight.copy_(
                _t(params["conv1d"]["kernel"]).permute(2, 1, 0))
            self.conv1d.bias.copy_(_t(params["conv1d"]["bias"]))
            _load_linear(self.lin1, params["lin1"])
            _load_linear(self.lin2, params["lin2"])

    def forward(self, x, adj, mask):
        from iggcn_tpu.oracle.torch_ref import TorchFused

        prop = TorchFused.gcn_prop(adj)
        h = x
        for i in range(self.num_layers):
            h = F.relu(torch.matmul(prop, h) @ self.conv_w[i]
                       + self.conv_b[i]) * mask[..., None].to(x.dtype)
        b, n, f = h.shape
        key = torch.where(mask, h[..., -1], torch.full_like(h[..., -1], -1e30))
        order = torch.sort(key, dim=1, descending=True).indices[:, :self.k]
        g = torch.gather(h, 1, order[..., None].expand(-1, -1, f))
        valid = torch.gather(mask, 1, order)
        g = torch.where(valid[..., None], g, torch.zeros_like(g))
        if n < self.k:
            g = F.pad(g, (0, 0, 0, self.k - n))
        z = F.relu(self.conv1d(g.permute(0, 2, 1)))        # (B, C, k-4)
        z = z.reshape(b, -1)
        z = F.relu(self.lin1(z))
        return F.log_softmax(self.lin2(z), dim=-1)


class TorchZooSet2Set(nn.Module):
    """`Set2SetNet` (`kernel/set2set.py:14-35`) driven by a REAL
    torch.nn.LSTM (PyG's Set2Set wraps nn.LSTM(2H, H)) — pins the JAX
    side's hand-rolled cell: gate order i,f,g,o, both bias vectors, tanh
    cell path."""

    def __init__(self, num_layers=2, hidden=16, feat_dim=4, num_classes=2,
                 processing_steps=4):
        super().__init__()
        self.steps = processing_steps
        dims = [(feat_dim, hidden)] + [(hidden, hidden)] * (num_layers - 1)
        self.stack = _SageStack(dims)
        self.lstm = nn.LSTM(2 * hidden, hidden)
        self.lin1 = nn.Linear(2 * hidden, hidden)
        self.lin2 = nn.Linear(hidden, num_classes)

    def load_flax(self, params) -> None:
        self.stack.load_flax(params)
        with torch.no_grad():
            self.lstm.weight_ih_l0.copy_(_t(params["lstm_w_ih"]))
            self.lstm.weight_hh_l0.copy_(_t(params["lstm_w_hh"]))
            self.lstm.bias_ih_l0.copy_(_t(params["lstm_b_ih"]))
            self.lstm.bias_hh_l0.copy_(_t(params["lstm_b_hh"]))
        _load_linear(self.lin1, params["lin1"])
        _load_linear(self.lin2, params["lin2"])

    def forward(self, x, adj, mask):
        h = x
        for i in range(len(self.stack.w_self)):
            h = self.stack.layer(i, h, adj, mask)
        b, n, f = h.shape
        q_star = h.new_zeros(b, 2 * f)
        hc = (h.new_zeros(1, b, f), h.new_zeros(1, b, f))
        for _ in range(self.steps):
            q, hc = self.lstm(q_star.unsqueeze(0), hc)
            q = q.squeeze(0)
            e = (h * q[:, None, :]).sum(-1)
            e = torch.where(mask, e, torch.full_like(e, -1e30))
            a = torch.softmax(e, dim=1) * mask.to(h.dtype)
            r = (a[..., None] * h).sum(1)
            q_star = torch.cat([q, r], dim=-1)
        z = F.relu(self.lin1(q_star))
        return F.log_softmax(self.lin2(z), dim=-1)


class TorchZooGlobalAttention(nn.Module):
    """`GlobalAttentionNet` (`kernel/global_attention.py:14-35`)."""

    def __init__(self, num_layers=2, hidden=16, feat_dim=4, num_classes=2):
        super().__init__()
        dims = [(feat_dim, hidden)] + [(hidden, hidden)] * (num_layers - 1)
        self.stack = _SageStack(dims)
        self.gate = nn.Linear(hidden, 1)
        self.lin1 = nn.Linear(hidden, hidden)
        self.lin2 = nn.Linear(hidden, num_classes)

    def load_flax(self, params) -> None:
        self.stack.load_flax(params)
        _load_linear(self.gate, params["gate"])
        _load_linear(self.lin1, params["lin1"])
        _load_linear(self.lin2, params["lin2"])

    def forward(self, x, adj, mask):
        h = x
        for i in range(len(self.stack.w_self)):
            h = self.stack.layer(i, h, adj, mask)
        e = self.gate(h)[..., 0]
        e = torch.where(mask, e, torch.full_like(e, -1e30))
        a = torch.softmax(e, dim=1) * mask.to(h.dtype)
        z = (a[..., None] * h).sum(1)
        z = F.relu(self.lin1(z))
        return F.log_softmax(self.lin2(z), dim=-1)


class TorchZooGraclus(nn.Module):
    """`Graclus` (`kernel/graclus.py:10-41`): GraphConv(mean) stack with one
    cluster max_pool coarsening (assignments precomputed host-side, same as
    the JAX model — torch-cluster's graclus is randomized). Coarsened
    connectivity is BINARY (PyG pool_edge coalesces with edge_attr None) and
    self-loops are removed; per-cluster features are element-wise maxima."""

    def __init__(self, num_layers=3, hidden=16, feat_dim=4, num_classes=2):
        super().__init__()
        dims = [(feat_dim, hidden)] + [(hidden, hidden)] * (num_layers - 1)
        self.stack = _SageStack(dims)
        self.lin1 = nn.Linear(num_layers * hidden, hidden)
        self.lin2 = nn.Linear(hidden, num_classes)

    def load_flax(self, params) -> None:
        self.stack.load_flax(params)
        _load_linear(self.lin1, params["lin1"])
        _load_linear(self.lin2, params["lin2"])

    @staticmethod
    def _mean_pool(h, mask):
        m = mask[..., None].to(h.dtype)
        return (h * m).sum(1) / m.sum(1).clamp(min=1.0)

    @staticmethod
    def _max_pool_clusters(h, adj, mask, assign):
        b, n, f = h.shape
        xk = h.new_zeros(b, n, f)
        new_mask = torch.zeros_like(mask)
        adj_new = adj.new_zeros(b, n, n)
        for s in range(b):                                  # per-sample loop
            for k in assign[s][mask[s]].unique():
                members = (assign[s] == k) & mask[s]
                xk[s, k] = h[s, members].max(dim=0).values
                new_mask[s, k] = True
            ks = assign[s].long()
            onehot = F.one_hot(ks, n).to(adj.dtype) * mask[s][:, None].to(adj.dtype)
            coars = onehot.T @ adj[s] @ onehot
            coars = (coars != 0).to(adj.dtype)
            coars.fill_diagonal_(0)
            adj_new[s] = coars
        return xk, adj_new, new_mask

    def forward(self, x, adj, mask, assign):
        h = self.stack.layer(0, x, adj, mask)
        readouts = [self._mean_pool(h, mask)]
        pooled = False
        for i in range(len(self.stack.w_self) - 1):
            h = self.stack.layer(i + 1, h, adj, mask)
            readouts.append(self._mean_pool(h, mask))
            if i % 2 == 0 and not pooled:
                h, adj, mask = self._max_pool_clusters(h, adj, mask, assign)
                pooled = True
        z = torch.cat(readouts, -1)
        z = F.relu(self.lin1(z))
        return F.log_softmax(self.lin2(z), dim=-1)


def _gat_layer_sparse(h_in, adj, w_lin, att_src_p, att_dst_p, lin_edge,
                      att_edge, slope):
    """One GATConv (heads=1, edge_dim=1) in the SPARSE per-target form PyG
    actually computes: remove self loops, add them back with the
    per-target MEAN incoming edge weight (fill_value='mean'; 0 for
    isolated targets), leaky_relu logits, softmax per target's incoming
    group, aggregate. Returns pre-bias, pre-activation output."""
    b, n, _ = h_in.shape
    h = h_in @ w_lin
    out = torch.zeros_like(h)
    e_coef = lin_edge[0] @ att_edge
    for s in range(b):
        a_src = h[s] @ att_src_p
        a_dst = h[s] @ att_dst_p
        w = adj[s].clone()
        w.fill_diagonal_(0.0)
        for c in range(n):
            rows = torch.nonzero((w[:, c] != 0), as_tuple=True)[0]
            mean_in = (w[rows, c].mean() if len(rows)
                       else w.new_zeros(()))
            srcs = torch.cat([rows, torch.tensor([c])])
            weights = torch.cat([w[rows, c], mean_in[None]])
            logits = F.leaky_relu(
                a_src[srcs] + a_dst[c] + weights * e_coef, slope)
            alpha = torch.softmax(logits, dim=0)
            out[s, c] = alpha @ h[s][srcs]
    return out


class TorchZooSgcnGat(nn.Module):
    """`SGCN_GAT` (`kernel/sgcn.py:154-269`): GAT conv stack over the
    importance-maskable brain graph + JK-concat flatten head — the fused
    image family's GAT variant, with the GAT layers in the sparse
    per-target derivation and cal_probability borrowed from the pinned
    TorchSgcnOri (same masking math, `kernel/sgcn.py:76-91`)."""

    def __init__(self, num_layers=2, hidden=16, rois=20, feat_dim=3,
                 num_classes=2, hidden_linear=64, negative_slope=0.2):
        super().__init__()
        self.num_layers = num_layers
        self.rois = rois
        self.slope = negative_slope
        dims = [feat_dim] + [hidden] * num_layers
        mk = lambda *s: nn.Parameter(torch.zeros(*s))  # noqa: E731
        self.gat_w = nn.ParameterList([mk(dims[i], hidden)
                                       for i in range(num_layers)])
        self.att_src = nn.ParameterList([mk(hidden)
                                         for _ in range(num_layers)])
        self.att_dst = nn.ParameterList([mk(hidden)
                                         for _ in range(num_layers)])
        self.lin_edge = nn.ParameterList([mk(1, hidden)
                                          for _ in range(num_layers)])
        self.att_edge = nn.ParameterList([mk(hidden)
                                          for _ in range(num_layers)])
        self.gat_b = nn.ParameterList([mk(hidden)
                                       for _ in range(num_layers)])
        self.prob = mk(rois, feat_dim)
        self.prob_bias = mk(2 * feat_dim, 1)
        self.lin1 = nn.Linear(rois * num_layers * hidden, hidden_linear)
        self.lin2 = nn.Linear(hidden_linear, num_classes)

    def load_flax(self, params) -> None:
        with torch.no_grad():
            for i in range(self.num_layers):
                self.gat_w[i].copy_(_t(params[f"gat_w_{i}"]))
                self.att_src[i].copy_(_t(params[f"gat_att_src_{i}"]))
                self.att_dst[i].copy_(_t(params[f"gat_att_dst_{i}"]))
                self.lin_edge[i].copy_(_t(params[f"gat_lin_edge_{i}"]))
                self.att_edge[i].copy_(_t(params[f"gat_att_edge_{i}"]))
                self.gat_b[i].copy_(_t(params[f"gat_b_{i}"]))
            self.prob.copy_(_t(params["prob"]))
            self.prob_bias.copy_(_t(params["prob_bias"]))
            _load_linear(self.lin1, params["lin1"])
            _load_linear(self.lin2, params["lin2"])

    def forward(self, x, adj, is_explain=False):
        from iggcn_tpu.oracle.torch_ref import TorchSgcnOri

        if is_explain:
            x, adj = TorchSgcnOri.cal_probability(self, x, adj)
        feats = []
        h = x
        for i in range(self.num_layers):
            h = F.relu(_gat_layer_sparse(
                h, adj, self.gat_w[i], self.att_src[i], self.att_dst[i],
                self.lin_edge[i], self.att_edge[i], self.slope)
                + self.gat_b[i])
            feats.append(h)
        z = torch.cat(feats, -1).reshape(x.shape[0], -1)
        z = F.relu(self.lin1(z))
        return F.log_softmax(self.lin2(z), dim=-1)


class TorchZooFusedGat(nn.Module):
    """The fused family's `ifUseGAT` variant (`kernel/gcn_img_snp.py:32-47`
    as carried by FusedSGCN(use_gat=True)): replace the imaging GCN stack
    of the pinned TorchFused with GAT layers in the sparse per-target
    derivation, keep everything else (GO branch, cross-MHA, fusion heads,
    importance masking) from the existing mirror."""

    def __init__(self, topo, num_layers=2, hidden=16, rois=90, feat_dim=3,
                 num_classes=2, num_regr=3, hidden_linear=64, l_dim=32,
                 negative_slope=0.2):
        super().__init__()
        from iggcn_tpu.oracle.torch_ref import TorchFused

        self.base = TorchFused(topo, num_layers=num_layers, hidden=hidden,
                               rois=rois, feat_dim=feat_dim,
                               num_classes=num_classes, num_regr=num_regr,
                               hidden_linear=hidden_linear, l_dim=l_dim)
        del self.base.conv_w, self.base.conv_b
        self.num_layers = num_layers
        self.slope = negative_slope
        dims = [feat_dim] + [hidden] * num_layers
        mk = lambda *s: nn.Parameter(torch.zeros(*s))  # noqa: E731
        self.gat_w = nn.ParameterList([mk(dims[i], hidden)
                                       for i in range(num_layers)])
        self.att_src = nn.ParameterList([mk(hidden)
                                         for _ in range(num_layers)])
        self.att_dst = nn.ParameterList([mk(hidden)
                                         for _ in range(num_layers)])
        self.lin_edge = nn.ParameterList([mk(1, hidden)
                                          for _ in range(num_layers)])
        self.att_edge = nn.ParameterList([mk(hidden)
                                          for _ in range(num_layers)])
        self.gat_b = nn.ParameterList([mk(hidden)
                                       for _ in range(num_layers)])

    def load_flax(self, params) -> None:
        from iggcn_tpu.oracle.torch_ref import load_fused_params

        load_fused_params(self.base, params)   # skips the absent conv stack
        with torch.no_grad():
            for i in range(self.num_layers):
                self.gat_w[i].copy_(_t(params[f"gat_w_{i}"]))
                self.att_src[i].copy_(_t(params[f"gat_att_src_{i}"]))
                self.att_dst[i].copy_(_t(params[f"gat_att_dst_{i}"]))
                self.lin_edge[i].copy_(_t(params[f"gat_lin_edge_{i}"]))
                self.att_edge[i].copy_(_t(params[f"gat_att_edge_{i}"]))
                self.gat_b[i].copy_(_t(params[f"gat_b_{i}"]))

    def forward(self, x, adj, snps, is_explain=False):
        m = self.base
        b = x.shape[0]
        if is_explain:
            x_u, adj_u, snps_u = m.cal_probability(x, adj, snps)
        else:
            x_u, adj_u, snps_u = x, adj, snps
        h = x_u
        feats = []
        for i in range(self.num_layers):
            h = F.relu(_gat_layer_sparse(
                h, adj_u, self.gat_w[i], self.att_src[i], self.att_dst[i],
                self.lin_edge[i], self.att_edge[i], self.slope)
                + self.gat_b[i])
            feats.append(h)
        batch_x = torch.cat(feats, dim=-1)
        img_out = batch_x.reshape(b, -1)
        latent, snps_hat, atten_out = m.go(snps_u)
        attn_out, _ = m.mha(batch_x, atten_out, atten_out)
        out_cross = F.relu(attn_out).reshape(b, -1)
        out_z = (img_out + out_cross) / 2
        out_lin = torch.cat([out_z, latent], dim=-1)
        linear_outf = F.relu(m.lin1(out_lin))
        logits = m.lin2(F.dropout(linear_outf, m.drop_lin, self.training))
        if m.is_use_prob4regr:
            feat4regr = torch.cat([out_lin, (x * m.prob).reshape(b, -1)], -1)
        else:
            feat4regr = out_lin
        reg = F.relu(m.lin1_regr(feat4regr))
        reg = m.lin2_regr(F.dropout(reg, m.drop_regr, self.training))
        return (F.log_softmax(logits, dim=-1), snps_hat, out_z, out_lin,
                linear_outf, reg)


class TorchZooGATFlat(nn.Module):
    """`GAT` (`kernel/gat.py:80-122`): JK-concat GAT + flatten readout,
    re-derived in the SPARSE per-target form PyG actually computes —
    per-edge logits leaky_relu(a_src·h_r + a_dst·h_c + a_edge·(W_e w_rc)),
    self-loops added with the per-target MEAN incoming edge weight
    (fill_value='mean'), softmax grouped over each target's incoming
    edges via explicit python loops — against the JAX side's dense masked
    softmax."""

    def __init__(self, num_layers=2, hidden=16, feat_dim=4, num_classes=2,
                 rois=11, hidden_linear=64, negative_slope=0.2):
        super().__init__()
        self.num_layers = num_layers
        self.slope = negative_slope
        dims = [feat_dim] + [hidden] * num_layers
        mk = lambda *s: nn.Parameter(torch.zeros(*s))  # noqa: E731
        self.gat_w = nn.ParameterList([mk(dims[i], hidden)
                                       for i in range(num_layers)])
        self.att_src = nn.ParameterList([mk(hidden)
                                         for _ in range(num_layers)])
        self.att_dst = nn.ParameterList([mk(hidden)
                                         for _ in range(num_layers)])
        self.lin_edge = nn.ParameterList([mk(1, hidden)
                                          for _ in range(num_layers)])
        self.att_edge = nn.ParameterList([mk(hidden)
                                          for _ in range(num_layers)])
        self.gat_b = nn.ParameterList([mk(hidden)
                                       for _ in range(num_layers)])
        self.lin1 = nn.Linear(rois * num_layers * hidden, hidden_linear)
        self.lin2 = nn.Linear(hidden_linear, num_classes)

    def load_flax(self, params) -> None:
        with torch.no_grad():
            for i in range(self.num_layers):
                self.gat_w[i].copy_(_t(params[f"gat_w_{i}"]))
                self.att_src[i].copy_(_t(params[f"att_src_{i}"]))
                self.att_dst[i].copy_(_t(params[f"att_dst_{i}"]))
                self.lin_edge[i].copy_(_t(params[f"lin_edge_{i}"]))
                self.att_edge[i].copy_(_t(params[f"att_edge_{i}"]))
                self.gat_b[i].copy_(_t(params[f"gat_b_{i}"]))
            _load_linear(self.lin1, params["lin1"])
            _load_linear(self.lin2, params["lin2"])

    def _layer(self, i, h_in, adj):
        return F.relu(_gat_layer_sparse(
            h_in, adj, self.gat_w[i], self.att_src[i], self.att_dst[i],
            self.lin_edge[i], self.att_edge[i], self.slope)
            + self.gat_b[i])

    def forward(self, x, adj):
        feats = []
        h = x
        for i in range(self.num_layers):
            h = self._layer(i, h, adj)
            feats.append(h)
        z = torch.cat(feats, -1).reshape(x.shape[0], -1)
        z = F.relu(self.lin1(z))
        return F.log_softmax(self.lin2(z), dim=-1)


class TorchZooNested(nn.Module):
    """`Nested{GCN,GIN,GIN0}` (`kernel/gcn.py:8-84`, `kernel/gin.py:7-183`)
    on the dense union-graph layout: optional hop-label embedding
    (Embedding(1000, 8)) and resistance-distance projection (Linear(1, 8))
    summed and concatenated to the features, conv stack over the
    block-diagonal union adjacency, JK-concat mean-pooled per subgraph
    (per-sample loops here vs the JAX one-hot matmul), then either the
    dense-flattened per-graph readout (NestedGCN/NestedGIN) or the
    subgraph add-pool (NestedGIN0's subconv branch). The nested GIN MLP is
    the two-BN Linear-BN-ReLU-Linear-BN-ReLU (`kernel/gin.py:20-27`) for
    BOTH eps variants — unlike the flat zoo's GIN."""

    def __init__(self, conv="gcn", num_layers=2, hidden=16, feat_dim=4,
                 num_classes=2, num_subgraphs=6, hidden_linear=64,
                 use_z=False, use_rd=False, readout="flatten",
                 train_eps=True):
        super().__init__()
        self.conv = conv
        self.num_layers = num_layers
        self.num_subgraphs = num_subgraphs
        self.readout = readout
        self.use_z, self.use_rd = use_z, use_rd
        self.train_eps = train_eps
        in_dim = feat_dim + (8 if use_z or use_rd else 0)
        dims = [in_dim] + [hidden] * num_layers
        if conv == "gcn":
            self.conv_w = nn.ParameterList(
                [nn.Parameter(torch.zeros(dims[i], dims[i + 1]))
                 for i in range(num_layers)])
            self.conv_b = nn.ParameterList(
                [nn.Parameter(torch.zeros(dims[i + 1]))
                 for i in range(num_layers)])
        elif conv == "gin":
            self.l1 = nn.ModuleList([nn.Linear(dims[i], hidden)
                                     for i in range(num_layers)])
            self.l2 = nn.ModuleList([nn.Linear(hidden, hidden)
                                     for _ in range(num_layers)])
            self.bn1 = nn.ModuleList([nn.BatchNorm1d(hidden)
                                      for _ in range(num_layers)])
            self.bn2 = nn.ModuleList([nn.BatchNorm1d(hidden)
                                      for _ in range(num_layers)])
            if train_eps:
                self.eps = nn.ParameterList(
                    [nn.Parameter(torch.zeros(()))
                     for _ in range(num_layers)])
        else:
            raise ValueError(conv)
        if use_z:
            self.z_embedding = nn.Parameter(torch.zeros(1000, 8))
        if use_rd:
            self.rd_projection = nn.Linear(1, 8)
        if readout == "flatten":
            self.lin1 = nn.Linear(num_subgraphs * num_layers * hidden,
                                  hidden_linear)
            self.lin2 = nn.Linear(hidden_linear, num_classes)
        else:
            self.lin1 = nn.Linear(num_layers * hidden, hidden)
            self.lin2 = nn.Linear(hidden, num_classes)

    def load_flax(self, params, stats=None) -> None:
        with torch.no_grad():
            for i in range(self.num_layers):
                if self.conv == "gcn":
                    self.conv_w[i].copy_(_t(params[f"conv_w_{i}"]))
                    self.conv_b[i].copy_(_t(params[f"conv_b_{i}"]))
                else:
                    mlp, st = params[f"mlp_{i}"], stats[f"mlp_{i}"]
                    _load_linear(self.l1[i], mlp["l1"])
                    _load_linear(self.l2[i], mlp["l2"])
                    for bn_list, tag in ((self.bn1, "bn1"),
                                         (self.bn2, "bn2")):
                        bn = bn_list[i]
                        bn.weight.copy_(_t(mlp[tag]["scale"]))
                        bn.bias.copy_(_t(mlp[tag]["bias"]))
                        bn.running_mean.copy_(_t(st[tag]["mean"]))
                        bn.running_var.copy_(_t(st[tag]["var"]))
                    if self.train_eps:
                        self.eps[i].copy_(_t(params[f"eps_{i}"]))
            if self.use_z:
                self.z_embedding.copy_(_t(params["z_embedding"]))
            if self.use_rd:
                _load_linear(self.rd_projection, params["rd_projection"])
            _load_linear(self.lin1, params["lin1"])
            _load_linear(self.lin2, params["lin2"])

    def _masked_bn(self, bn, h, mask):
        b, n, f = h.shape
        flat = h.reshape(b * n, f)
        idx = mask.reshape(b * n)
        out = torch.zeros_like(flat)
        out[idx] = bn(flat[idx])
        with torch.no_grad():
            bn.eval()
            out[~idx] = bn(flat[~idx])
            bn.train(self.training)
        return out.reshape(b, n, f)

    def _subgraph_mean(self, h, assign, mask):
        b, m, d = h.shape
        out = h.new_zeros(b, self.num_subgraphs, d)
        for s in range(b):
            for k in range(self.num_subgraphs):
                members = (assign[s] == k) & mask[s]
                if members.any():
                    out[s, k] = h[s, members].mean(dim=0)
        return out

    def forward(self, x, adj, mask, assign, z=None, rd=None):
        from iggcn_tpu.oracle.torch_ref import TorchFused

        mf = mask[..., None].to(x.dtype)
        if self.use_z or self.use_rd:
            emb = x.new_zeros(x.shape[:2] + (8,))
            if self.use_z:
                zi = (z if z is not None
                      else torch.zeros(x.shape[:2], dtype=torch.long))
                ze = self.z_embedding[zi.long().clamp(0, 999)]
                if ze.ndim == 4:      # multi-dim labels: sum the label axis
                    ze = ze.sum(dim=2)
                emb = emb + ze
            if self.use_rd:
                ri = rd if rd is not None else x.new_zeros(x.shape[:2] + (1,))
                emb = emb + self.rd_projection(ri)
            x = torch.cat([emb, x], dim=-1)
        feats = []
        h = x
        if self.conv == "gcn":
            prop = TorchFused.gcn_prop(adj)
            for i in range(self.num_layers):
                h = F.relu(torch.matmul(prop, h) @ self.conv_w[i]
                           + self.conv_b[i])
                feats.append(h)
        else:
            a = (adj != 0).to(x.dtype)
            for i in range(self.num_layers):
                eps = self.eps[i] if self.train_eps else 0.0
                hm = h * mf
                agg = (1.0 + eps) * hm + torch.matmul(a.transpose(1, 2), hm)
                v = F.relu(self._masked_bn(self.bn1[i], self.l1[i](agg),
                                           mask))
                h = F.relu(self._masked_bn(self.bn2[i], self.l2[i](v),
                                           mask))
                feats.append(h)
        jk = torch.cat(feats, dim=-1)
        sub = self._subgraph_mean(jk, assign, mask)
        if self.readout == "add":
            g = sub.sum(dim=1)
        else:
            g = sub.reshape(sub.shape[0], -1)
        g = F.relu(self.lin1(g))
        return F.log_softmax(self.lin2(g), dim=-1)


class TorchZooCNN(nn.Module):
    """`CNN_Model` (`kernel/mlp.py:13-72`) with REAL nn.Conv2d/MaxPool2d:
    Conv2d(1, 4, 3) -> MaxPool(3, 3) -> Conv2d(4, 4, 3) -> MaxPool(3, 3)
    -> channel-major flatten -> fc1(64) -> fc2(16) -> fc3."""

    def __init__(self, num_classes=2):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 4, 3)
        self.conv2 = nn.Conv2d(4, 4, 3)
        self.pool = nn.MaxPool2d(3, 3)
        self.fc1 = nn.Linear(324, 64)
        self.fc2 = nn.Linear(64, 16)
        self.fc3 = nn.Linear(16, num_classes)

    def load_flax(self, params) -> None:
        with torch.no_grad():
            # flax nn.Conv kernel (kh, kw, in, out) -> torch (out, in, kh, kw)
            self.conv1.weight.copy_(
                _t(params["conv1"]["kernel"]).permute(3, 2, 0, 1))
            self.conv1.bias.copy_(_t(params["conv1"]["bias"]))
            self.conv2.weight.copy_(
                _t(params["conv2"]["kernel"]).permute(3, 2, 0, 1))
            self.conv2.bias.copy_(_t(params["conv2"]["bias"]))
            for name in ("fc1", "fc2", "fc3"):
                _load_linear(getattr(self, name), params[name])

    def forward(self, adj):
        h = adj[:, None, :, :]
        h = self.pool(F.relu(self.conv1(h)))
        h = self.pool(F.relu(self.conv2(h)))
        h = h.reshape(h.shape[0], -1)
        h = F.relu(self.fc1(h))
        h = F.relu(self.fc2(h))
        return F.log_softmax(self.fc3(h), dim=-1)


class _TorchBlock(nn.Module):
    """`Block` (`kernel/diff_pool.py:114-133`): two DenseSAGEConvs (lin_rel
    bias-free, lin_root biased; aggregation = A x row-normalized by
    clamp(rowsum(A), 1)) + JK linear over [x1 ‖ x2]."""

    def __init__(self, in_dim, hidden, out):
        super().__init__()
        self.conv1_rel = nn.Linear(in_dim, hidden, bias=False)
        self.conv1_root = nn.Linear(in_dim, hidden)
        self.conv2_rel = nn.Linear(hidden, out, bias=False)
        self.conv2_root = nn.Linear(hidden, out)
        self.lin = nn.Linear(hidden + out, out)

    def load_flax(self, tree) -> None:
        for name in ("conv1_rel", "conv1_root", "conv2_rel", "conv2_root",
                     "lin"):
            _load_linear(getattr(self, name), tree[name])

    @staticmethod
    def _conv(rel, root, x, adj, mask):
        agg = torch.matmul(adj, x) / adj.sum(dim=-1, keepdim=True).clamp(min=1)
        out = rel(agg) + root(x)
        if mask is not None:
            out = out * mask[..., None].to(x.dtype)
        return out

    def forward(self, x, adj, mask=None):
        x1 = F.relu(self._conv(self.conv1_rel, self.conv1_root, x, adj, mask))
        x2 = F.relu(self._conv(self.conv2_rel, self.conv2_root, x1, adj, mask))
        return self.lin(torch.cat([x1, x2], dim=-1))


def _dense_diff_pool(z, adj, s_logits, mask=None):
    """PyG `dense_diff_pool`: softmax assignments, masked, link loss =
    ‖A − S Sᵀ‖_F / numel(A) (one Frobenius norm over the whole tensor),
    entropy loss = mean row entropy over ALL B·N rows."""
    s = torch.softmax(s_logits, dim=-1)
    if mask is not None:
        m = mask[..., None].to(z.dtype)
        z, s = z * m, s * m
    x_new = torch.matmul(s.transpose(1, 2), z)
    adj_new = torch.matmul(torch.matmul(s.transpose(1, 2), adj), s)
    link = torch.norm(adj - torch.matmul(s, s.transpose(1, 2)), p=2)
    link = link / adj.numel()
    ent = (-s * torch.log(s + 1e-15)).sum(dim=-1).mean()
    return x_new, adj_new, link, ent


class TorchZooDiffPool(nn.Module):
    """`DiffPool` (`kernel/diff_pool.py:135-183`): pool/embed Block pairs at
    0.25 coarsening, per-level readout x.mean(dim=1) (full dense node axis,
    padding included — the reference quirk), JK-concat -> lin1 -> lin2."""

    def __init__(self, max_nodes, num_layers=2, hidden=16, feat_dim=4,
                 num_classes=2):
        super().__init__()
        n_k = max(1, math.ceil(0.25 * max_nodes))
        self.blocks = nn.ModuleDict({
            "pool_block1": _TorchBlock(feat_dim, hidden, n_k),
            "embed_block1": _TorchBlock(feat_dim, hidden, hidden)})
        self.extra = num_layers // 2 - 1
        for i in range(self.extra):
            n_k = max(1, math.ceil(0.25 * n_k))
            self.blocks[f"pool_block{i + 2}"] = _TorchBlock(hidden, hidden,
                                                            n_k)
            self.blocks[f"embed_block{i + 2}"] = _TorchBlock(hidden, hidden,
                                                             hidden)
        self.lin1 = nn.Linear((self.extra + 1) * hidden, hidden)
        self.lin2 = nn.Linear(hidden, num_classes)

    def load_flax(self, params) -> None:
        for name, block in self.blocks.items():
            block.load_flax(params[name])
        _load_linear(self.lin1, params["lin1"])
        _load_linear(self.lin2, params["lin2"])

    def forward(self, x, adj, mask):
        s = self.blocks["pool_block1"](x, adj, mask)
        z = F.relu(self.blocks["embed_block1"](x, adj, mask))
        readouts = [z.mean(dim=1)]
        x, adj, link, ent = _dense_diff_pool(z, adj, s, mask)
        for i in range(self.extra):
            s = self.blocks[f"pool_block{i + 2}"](x, adj)
            z = F.relu(self.blocks[f"embed_block{i + 2}"](x, adj))
            readouts.append(z.mean(dim=1))
            x, adj, link_i, ent_i = _dense_diff_pool(z, adj, s)
            link, ent = link + link_i, ent + ent_i
        g = torch.cat(readouts, -1)
        g = F.relu(self.lin1(g))
        return F.log_softmax(self.lin2(g), dim=-1), link, ent
