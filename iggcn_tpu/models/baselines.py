"""Baseline GNN zoo + pooling baselines + CNN/MLP baselines.

Dense masked re-designs of the reference baseline models, one class per
reference class (capability parity for `kernel/gcn.py`, `gat.py`, `gin.py`,
`graph_sage.py`, `top_k.py`, `diff_pool.py`, `sort_pool.py`, `set2set.py`,
`global_attention.py`, `graclus.py`, `mlp.py`). All operate on dense
(B, N, F) node tensors + (B, N) validity masks so variable-size TU graphs
ride the same static-shape path (pad-to-max batching, `data/tu.py`).

Reference-bug notes (SURVEY §4): `sort_pool.py:13-16` references undefined
module globals `hidden`/`num_layers` — rebuilt here as constructor args;
`mlp.py:7,10` imports nonexistent modules — rebuilt from the evident intent.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from iggcn_tpu.models.nn_compat import (BatchNorm1d, TorchLinear, dropout,
                                        torch_linear_init,
                                        pyg_glorot, pyg_glorot_att)
from iggcn_tpu.ops import pool as P
from iggcn_tpu.ops.gat import GATParams, gat_conv
from iggcn_tpu.ops.gcn import gcn_conv, gcn_propagation_matrix


# canonical init lives in nn_compat; alias keeps the many call sites short
_glorot = pyg_glorot


def _ones_mask(x):
    return jnp.ones(x.shape[:2], bool)


class GCNFlat(nn.Module):
    """`GCN` (`kernel/gcn.py:87-123`): JK-concat GCN + flatten readout
    (fixed-N brain graphs)."""

    num_layers: int = 2
    hidden: int = 16
    num_classes: int = 2
    hidden_linear: int = 64
    # head dropout rate (reference hardcodes 0.5, kernel/gcn.py:117) as an
    # attribute so the trajectory-parity test can zero it
    dropout_lin: float = 0.5

    @nn.compact
    def __call__(self, x, adj, *, train: bool = False):
        b = x.shape[0]
        prop = gcn_propagation_matrix(adj)
        feats = []
        h = x
        for i in range(self.num_layers):
            w = self.param(f"conv_w_{i}", _glorot,
                           (h.shape[-1], self.hidden))
            bb = self.param(f"conv_b_{i}", nn.initializers.zeros,
                            (self.hidden,))
            h = nn.relu(gcn_conv(h, prop, w, bb))
            feats.append(h)
        z = jnp.concatenate(feats, -1).reshape(b, -1)
        z = nn.relu(TorchLinear(self.hidden_linear, name="lin1")(z))
        if train:
            z = dropout(self.make_rng("dropout"), z, self.dropout_lin)
        return jax.nn.log_softmax(TorchLinear(self.num_classes, name="lin2")(z), -1)


class GATFlat(nn.Module):
    """`GAT` (`kernel/gat.py:80-122`): JK-concat GAT + flatten readout."""

    num_layers: int = 2
    hidden: int = 16
    num_classes: int = 2
    hidden_linear: int = 64
    # head dropout (reference hardcodes 0.5) as a zeroable attribute
    dropout_lin: float = 0.5

    @nn.compact
    def __call__(self, x, adj, *, train: bool = False):
        b = x.shape[0]
        feats = []
        h = x
        for i in range(self.num_layers):
            p = GATParams(
                weight=self.param(f"gat_w_{i}", _glorot,
                                  (h.shape[-1], self.hidden)),
                att_src=self.param(f"att_src_{i}", pyg_glorot_att,
                                   (self.hidden,)),
                att_dst=self.param(f"att_dst_{i}", pyg_glorot_att,
                                   (self.hidden,)),
                lin_edge=self.param(f"lin_edge_{i}", _glorot, (1, self.hidden)),
                att_edge=self.param(f"att_edge_{i}",
                                    pyg_glorot_att, (self.hidden,)),
                bias=self.param(f"gat_b_{i}", nn.initializers.zeros,
                                (self.hidden,)))
            h = nn.relu(gat_conv(h, adj, p))
            feats.append(h)
        z = jnp.concatenate(feats, -1).reshape(b, -1)
        z = nn.relu(TorchLinear(self.hidden_linear, name="lin1")(z))
        if train:
            z = dropout(self.make_rng("dropout"), z, self.dropout_lin)
        return jax.nn.log_softmax(TorchLinear(self.num_classes, name="lin2")(z), -1)


class _GINMLP(nn.Module):
    """GIN0's / NestedGIN's per-conv MLP: Linear-BN-ReLU-Linear-BN-ReLU
    (`kernel/gin.py:124-131,20-27`)."""

    hidden: int

    @nn.compact
    def __call__(self, x, *, train: bool = False, mask=None):
        h = TorchLinear(self.hidden, name="l1")(x)
        h = _bn_nodes(BatchNorm1d(name="bn1"), h, train, mask)
        h = nn.relu(h)
        h = TorchLinear(self.hidden, name="l2")(h)
        h = _bn_nodes(BatchNorm1d(name="bn2"), h, train, mask)
        return nn.relu(h)


class _GINMLPLateBN(nn.Module):
    """GIN's per-conv MLP: Linear-ReLU-Linear-ReLU-BN — ONE BatchNorm at
    the END (`kernel/gin.py:190-196`), unlike GIN0's two interleaved BNs."""

    hidden: int

    @nn.compact
    def __call__(self, x, *, train: bool = False, mask=None):
        h = nn.relu(TorchLinear(self.hidden, name="l1")(x))
        h = nn.relu(TorchLinear(self.hidden, name="l2")(h))
        return _bn_nodes(BatchNorm1d(name="bn1"), h, train, mask)


def _bn_nodes(bn, h, train, mask):
    """BatchNorm1d over flattened valid nodes of a (B, N, F) tensor (torch
    applies BN to the PyG flat node list)."""
    b, n, f = h.shape
    flat = h.reshape(b * n, f)
    w = None
    if mask is not None:
        w = mask.reshape(b * n).astype(h.dtype)
    out = bn(flat, use_running_average=not train, weight=w)
    return out.reshape(b, n, f)


class GIN(nn.Module):
    """`GIN`/`GIN0` (`kernel/gin.py:119-236`): `train_eps=True` is the
    reference `GIN` (`:188-236`) — learned eps, per-conv MLP
    Linear-ReLU-Linear-ReLU-BN, global_MEAN_pool of the JK-concat;
    `train_eps=False` is `GIN0` (`:119-183`) — eps fixed at 0, per-conv MLP
    Linear-BN-ReLU-Linear-BN-ReLU, global_ADD_pool. The two variants differ
    in all three of eps/MLP/readout, not just eps."""

    num_layers: int = 2
    hidden: int = 16
    num_classes: int = 2
    train_eps: bool = True
    # head dropout (reference hardcodes 0.5, kernel/gin.py:165,231) as an
    # attribute so the trajectory-parity test can zero it
    dropout_lin: float = 0.5

    @nn.compact
    def __call__(self, x, adj, mask=None, *, train: bool = False,
                 sample_weight=None):
        if mask is None:
            mask = _ones_mask(x)
        # zero-weight (epoch-padding) samples must not enter the BN batch
        # statistics; everything else is per-sample so they are harmless
        bn_mask = mask if sample_weight is None else (
            mask & (sample_weight > 0)[:, None])
        mlp_cls = _GINMLPLateBN if self.train_eps else _GINMLP
        feats = []
        h = x
        for i in range(self.num_layers):
            if self.train_eps:
                eps = self.param(f"eps_{i}", nn.initializers.zeros, ())
            else:
                eps = 0.0
            agg = P.gin_conv_aggregate(h, adj, eps)
            h = mlp_cls(self.hidden, name=f"mlp_{i}")(agg, train=train,
                                                      mask=bn_mask)
            h = h * mask[..., None]
            feats.append(h)
        readout = P.mean_pool if self.train_eps else P.add_pool
        z = readout(jnp.concatenate(feats, -1), mask)
        z = nn.relu(TorchLinear(self.hidden, name="lin1")(z))
        if train:
            z = dropout(self.make_rng("dropout"), z, self.dropout_lin)
        return jax.nn.log_softmax(TorchLinear(self.num_classes, name="lin2")(z), -1)


class GraphSAGE(nn.Module):
    """`GraphSAGE` (`kernel/graph_sage.py:79-110`): SAGE convs, JK-concat,
    mean-pool readout. `jk=False` gives GraphSAGEWithoutJK (`:113-142`)."""

    num_layers: int = 2
    hidden: int = 16
    num_classes: int = 2
    # head dropout (reference hardcodes 0.5) as a zeroable attribute
    dropout_lin: float = 0.5
    jk: bool = True

    @nn.compact
    def __call__(self, x, adj, mask=None, *, train: bool = False):
        if mask is None:
            mask = _ones_mask(x)
        feats = []
        h = x
        for i in range(self.num_layers):
            ws = self.param(f"w_self_{i}", _glorot, (h.shape[-1], self.hidden))
            wn = self.param(f"w_nb_{i}", _glorot, (h.shape[-1], self.hidden))
            bb = self.param(f"b_{i}", nn.initializers.zeros, (self.hidden,))
            h = nn.relu(P.sage_conv(h, adj, ws, wn, bb)) * mask[..., None]
            feats.append(h)
        z = P.mean_pool(jnp.concatenate(feats, -1) if self.jk else feats[-1],
                        mask)
        z = nn.relu(TorchLinear(self.hidden, name="lin1")(z))
        if train:
            z = dropout(self.make_rng("dropout"), z, self.dropout_lin)
        return jax.nn.log_softmax(TorchLinear(self.num_classes, name="lin2")(z), -1)


class TopK(nn.Module):
    """`TopK` (`kernel/top_k.py:15-40`): GraphConv(mean) stack, mean-pool
    readout per layer, TopKPooling(0.8) every 2 layers."""

    num_layers: int = 3
    hidden: int = 16
    num_classes: int = 2
    # head dropout (reference hardcodes 0.5) as a zeroable attribute
    dropout_lin: float = 0.5
    ratio: float = 0.8

    @nn.compact
    def __call__(self, x, adj, mask=None, *, train: bool = False):
        if mask is None:
            mask = _ones_mask(x)
        ws = self.param("w_self_0", _glorot, (x.shape[-1], self.hidden))
        wn = self.param("w_nb_0", _glorot, (x.shape[-1], self.hidden))
        b0 = self.param("b_0", nn.initializers.zeros, (self.hidden,))
        h = nn.relu(P.sage_conv(x, adj, ws, wn, b0)) * mask[..., None]
        readouts = [P.mean_pool(h, mask)]
        for i in range(self.num_layers - 1):
            ws = self.param(f"w_self_{i + 1}", _glorot,
                            (self.hidden, self.hidden))
            wn = self.param(f"w_nb_{i + 1}", _glorot,
                            (self.hidden, self.hidden))
            bb = self.param(f"b_{i + 1}", nn.initializers.zeros, (self.hidden,))
            h = nn.relu(P.sage_conv(h, adj, ws, wn, bb)) * mask[..., None]
            readouts.append(P.mean_pool(h, mask))
            if i % 2 == 0:
                # PyG TopKPooling weight init: U(+-1/sqrt(in_channels))
                pw = self.param(f"pool_w_{i}",
                                torch_linear_init(self.hidden),
                                (self.hidden,))
                res = P.topk_pool(h, adj, mask, pw, self.ratio)
                h, adj, mask = res.x, res.adj, res.mask
        z = jnp.concatenate(readouts, -1)
        z = nn.relu(TorchLinear(self.hidden, name="lin1")(z))
        if train:
            z = dropout(self.make_rng("dropout"), z, self.dropout_lin)
        return jax.nn.log_softmax(TorchLinear(self.num_classes, name="lin2")(z), -1)


class SortPool(nn.Module):
    """`SortPool` (`kernel/sort_pool.py:11-73`, non-`original` branch):
    GCN stack -> sort-pool top-k=30 by last channel -> Conv1d(32, kernel 5)."""

    num_layers: int = 2
    hidden: int = 16
    num_classes: int = 2
    # head dropout (reference hardcodes 0.5) as a zeroable attribute
    dropout_lin: float = 0.5
    k: int = 30
    conv1d_channels: int = 32
    conv1d_kernel: int = 5

    @nn.compact
    def __call__(self, x, adj, mask=None, *, train: bool = False):
        if mask is None:
            mask = _ones_mask(x)
        prop = gcn_propagation_matrix(adj)
        h = x
        for i in range(self.num_layers):
            w = self.param(f"conv_w_{i}", _glorot, (h.shape[-1], self.hidden))
            bb = self.param(f"conv_b_{i}", nn.initializers.zeros,
                            (self.hidden,))
            h = nn.relu(gcn_conv(h, prop, w, bb)) * mask[..., None]
        z = P.sort_pool(h, mask, self.k)                  # (B, k, H)
        z = nn.Conv(self.conv1d_channels, (self.conv1d_kernel,),
                    padding="VALID", name="conv1d")(z)    # (B, k-4, C)
        # the reference flattens the torch (B, C, L) layout channel-major
        # (`sort_pool.py:68-69` x.view(len(x), -1) after Conv1d) — match
        # that element order so lin1 weights are interchangeable
        z = jnp.swapaxes(nn.relu(z), 1, 2).reshape(z.shape[0], -1)
        z = nn.relu(TorchLinear(self.hidden, name="lin1")(z))
        if train:
            z = dropout(self.make_rng("dropout"), z, self.dropout_lin)
        return jax.nn.log_softmax(TorchLinear(self.num_classes, name="lin2")(z), -1)


class Set2SetNet(nn.Module):
    """`Set2SetNet` (`kernel/set2set.py:14-35`)."""

    num_layers: int = 2
    hidden: int = 16
    num_classes: int = 2
    # head dropout (reference hardcodes 0.5) as a zeroable attribute
    dropout_lin: float = 0.5

    @nn.compact
    def __call__(self, x, adj, mask=None, *, train: bool = False):
        if mask is None:
            mask = _ones_mask(x)
        h = x
        for i in range(self.num_layers):
            ws = self.param(f"w_self_{i}", _glorot, (h.shape[-1], self.hidden))
            wn = self.param(f"w_nb_{i}", _glorot, (h.shape[-1], self.hidden))
            bb = self.param(f"b_{i}", nn.initializers.zeros, (self.hidden,))
            h = nn.relu(P.sage_conv(h, adj, ws, wn, bb)) * mask[..., None]
        hdim = self.hidden
        # torch LSTM init: EVERY weight and bias is U(+-1/sqrt(hidden))
        # (nn.LSTM.reset_parameters; PyG Set2Set wraps a plain nn.LSTM)
        lstm_init = torch_linear_init(hdim)
        params = P.Set2SetParams(
            w_ih=self.param("lstm_w_ih", lstm_init, (4 * hdim, 2 * hdim)),
            w_hh=self.param("lstm_w_hh", lstm_init, (4 * hdim, hdim)),
            b_ih=self.param("lstm_b_ih", lstm_init, (4 * hdim,)),
            b_hh=self.param("lstm_b_hh", lstm_init, (4 * hdim,)))
        z = P.set2set(h, mask, params, processing_steps=4)
        z = nn.relu(TorchLinear(self.hidden, name="lin1")(z))
        if train:
            z = dropout(self.make_rng("dropout"), z, self.dropout_lin)
        return jax.nn.log_softmax(TorchLinear(self.num_classes, name="lin2")(z), -1)


class GlobalAttentionNet(nn.Module):
    """`GlobalAttentionNet` (`kernel/global_attention.py:14-35`)."""

    num_layers: int = 2
    hidden: int = 16
    num_classes: int = 2
    # head dropout (reference hardcodes 0.5) as a zeroable attribute
    dropout_lin: float = 0.5

    @nn.compact
    def __call__(self, x, adj, mask=None, *, train: bool = False):
        if mask is None:
            mask = _ones_mask(x)
        h = x
        for i in range(self.num_layers):
            ws = self.param(f"w_self_{i}", _glorot, (h.shape[-1], self.hidden))
            wn = self.param(f"w_nb_{i}", _glorot, (h.shape[-1], self.hidden))
            bb = self.param(f"b_{i}", nn.initializers.zeros, (self.hidden,))
            h = nn.relu(P.sage_conv(h, adj, ws, wn, bb)) * mask[..., None]
        gate = TorchLinear(1, name="gate")(h)
        z = P.global_attention_pool(h, mask, gate)
        z = nn.relu(TorchLinear(self.hidden, name="lin1")(z))
        if train:
            z = dropout(self.make_rng("dropout"), z, self.dropout_lin)
        return jax.nn.log_softmax(TorchLinear(self.num_classes, name="lin2")(z), -1)


class Graclus(nn.Module):
    """`Graclus` (`kernel/graclus.py:10-41`): GraphConv(mean) stack with
    cluster max-pool coarsening every 2 layers. Cluster assignments are
    precomputed host-side (`ops/pool.py:greedy_matching`) and passed per
    sample; pooled node count stays N (masked)."""

    num_layers: int = 3
    hidden: int = 16
    num_classes: int = 2
    # head dropout (reference hardcodes 0.5) as a zeroable attribute
    dropout_lin: float = 0.5

    @nn.compact
    def __call__(self, x, adj, mask=None, assign=None, *,
                 train: bool = False):
        if mask is None:
            mask = _ones_mask(x)
        n = x.shape[1]
        ws = self.param("w_self_0", _glorot, (x.shape[-1], self.hidden))
        wn = self.param("w_nb_0", _glorot, (x.shape[-1], self.hidden))
        b0 = self.param("b_0", nn.initializers.zeros, (self.hidden,))
        h = nn.relu(P.sage_conv(x, adj, ws, wn, b0)) * mask[..., None]
        readouts = [P.mean_pool(h, mask)]
        pooled = False
        for i in range(self.num_layers - 1):
            ws = self.param(f"w_self_{i + 1}", _glorot,
                            (self.hidden, self.hidden))
            wn = self.param(f"w_nb_{i + 1}", _glorot,
                            (self.hidden, self.hidden))
            bb = self.param(f"b_{i + 1}", nn.initializers.zeros, (self.hidden,))
            h = nn.relu(P.sage_conv(h, adj, ws, wn, bb)) * mask[..., None]
            readouts.append(P.mean_pool(h, mask))
            if i % 2 == 0 and assign is not None and not pooled:
                h, adj, mask = P.cluster_max_pool(h, adj, mask, assign, n)
                pooled = True  # one coarsening level precomputed host-side
        z = jnp.concatenate(readouts, -1)
        z = nn.relu(TorchLinear(self.hidden, name="lin1")(z))
        if train:
            z = dropout(self.make_rng("dropout"), z, self.dropout_lin)
        return jax.nn.log_softmax(TorchLinear(self.num_classes, name="lin2")(z), -1)


class _DiffPoolBlock(nn.Module):
    """`Block` (`kernel/diff_pool.py:114-133`): two DenseSAGEConvs with a
    JK linear over their concat — x1 = relu(conv1(x)), x2 = relu(conv2(x1)),
    out = lin([x1 ‖ x2]). DenseSAGEConv = lin_rel(A x / clamp(rowsum(A), 1))
    + lin_root(x), lin_rel bias-free (PyG dense_sage_conv.py), masked rows
    zeroed at the end. (The reference threads an `add_loop` flag its PyG
    version ignores — no self-loop is added.)"""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x, adj, mask=None):
        def conv(tag, h, out_dim):
            deg = jnp.clip(jnp.sum(adj, axis=-1, keepdims=True), 1.0, None)
            agg = jnp.einsum("bnm,bmf->bnf", adj, h,
                             preferred_element_type=jnp.float32) / deg
            o = (TorchLinear(out_dim, use_bias=False, name=f"{tag}_rel")(agg)
                 + TorchLinear(out_dim, name=f"{tag}_root")(h))
            if mask is not None:
                o = o * mask[..., None]
            return o

        x1 = nn.relu(conv("conv1", x, self.hidden))
        x2 = nn.relu(conv("conv2", x1, self.out))
        return TorchLinear(self.out, name="lin")(
            jnp.concatenate([x1, x2], axis=-1))


class DiffPool(nn.Module):
    """`DiffPool` (`kernel/diff_pool.py:135-183`): pool/embed Block pairs
    with 0.25 coarsening — s = pool_block(x), x = relu(embed_block(x)),
    readout x.mean over the FULL dense node axis (the reference's
    `x.mean(dim=1)` divides by N with padding included — quirk parity),
    then dense_diff_pool; (num_layers // 2) - 1 extra block pairs on the
    coarsened (unmasked) graphs; JK-concat of the per-level readouts ->
    lin1 -> dropout -> lin2. Returns (log_probs, link_loss, ent_loss)
    summed over pools — the reference DISCARDS both losses
    (`:95,168: x, adj, _, _ = dense_diff_pool(...)`); they are returned
    for the canonical DiffPool objective (`generic_cv` aux_loss)."""

    max_nodes: int = 90
    num_layers: int = 2
    hidden: int = 16
    num_classes: int = 2
    # head dropout (reference hardcodes 0.5, kernel/diff_pool.py:105) as an
    # attribute so the trajectory-parity test can zero it
    dropout_lin: float = 0.5

    @nn.compact
    def __call__(self, x, adj, mask=None, *, train: bool = False,
                 sample_weight=None):
        import math

        if mask is None:
            mask = _ones_mask(x)
        n_k = max(1, math.ceil(0.25 * self.max_nodes))
        s = _DiffPoolBlock(self.hidden, n_k, name="pool_block1")(x, adj, mask)
        z = nn.relu(_DiffPoolBlock(self.hidden, self.hidden,
                                   name="embed_block1")(x, adj, mask))
        readouts = [jnp.mean(z, axis=1)]
        x, adj, link, ent = P.diff_pool(z, adj, s, mask,
                                        sample_weight=sample_weight)
        for i in range(self.num_layers // 2 - 1):
            n_k = max(1, math.ceil(0.25 * n_k))
            s = _DiffPoolBlock(self.hidden, n_k,
                               name=f"pool_block{i + 2}")(x, adj)
            z = nn.relu(_DiffPoolBlock(self.hidden, self.hidden,
                                       name=f"embed_block{i + 2}")(x, adj))
            readouts.append(jnp.mean(z, axis=1))
            mask_k = jnp.ones(z.shape[:2], bool)   # coarsened graphs: dense
            x, adj, link_i, ent_i = P.diff_pool(z, adj, s, mask_k,
                                                sample_weight=sample_weight)
            link, ent = link + link_i, ent + ent_i
        g = jnp.concatenate(readouts, -1)
        g = nn.relu(TorchLinear(self.hidden, name="lin1")(g))
        if train:
            g = dropout(self.make_rng("dropout"), g, self.dropout_lin)
        logp = jax.nn.log_softmax(TorchLinear(self.num_classes, name="lin2")(g), -1)
        return logp, link, ent


class CNNModel(nn.Module):
    """`CNN_Model` (`kernel/mlp.py:13-72`), exact geometry: Conv2d(1, 4, 3)
    (VALID) -> MaxPool(3, 3) -> Conv2d(4, 4, 3) -> MaxPool(3, 3) -> flatten
    (90x90 input gives 4 * 9 * 9 = 324, matching the reference's hardcoded
    fc1 in-dim) -> fc1(64) -> dropout(hp.droupout_prob=0.5) -> fc2(16)
    -> fc3(num_classes)."""

    num_classes: int = 2
    rois: int = 90

    @nn.compact
    def __call__(self, adj, *, train: bool = False):
        h = adj[..., None]                        # (B, N, N, 1)
        h = nn.relu(nn.Conv(4, (3, 3), padding="VALID", name="conv1")(h))
        h = nn.max_pool(h, (3, 3), strides=(3, 3))
        h = nn.relu(nn.Conv(4, (3, 3), padding="VALID", name="conv2")(h))
        h = nn.max_pool(h, (3, 3), strides=(3, 3))
        # the reference flattens the torch (B, C, H, W) layout
        # channel-major (`mlp.py:60` x.view(-1, 324)) — match that element
        # order so fc1 weights are interchangeable
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
        h = nn.relu(TorchLinear(64, name="fc1")(h))
        if train:
            h = dropout(self.make_rng("dropout"), h, 0.5)
        h = nn.relu(TorchLinear(16, name="fc2")(h))
        return jax.nn.log_softmax(TorchLinear(self.num_classes, name="fc3")(h), -1)


class MLPModel(nn.Module):
    """`MLP_Model` (`kernel/mlp.py:74-119`): 54 -> 32 -> 16 -> 1 sigmoid SNP
    classifier. The dropout rate is an attr (reference 0.3) so the
    trajectory-parity test can zero it."""

    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, snps, *, train: bool = False):
        h = nn.relu(TorchLinear(32, name="fc1")(snps))
        if train:
            h = dropout(self.make_rng("dropout"), h, self.dropout_rate)
        h = nn.relu(TorchLinear(16, name="fc2")(h))
        return jax.nn.sigmoid(TorchLinear(1, name="fc3")(h))
