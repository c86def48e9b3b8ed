"""Nested-GNN models over rooted-subgraph union graphs.

Re-design of the reference `Nested{GCN,GAT,GIN,GIN0,GraphSAGE}` twins
(`kernel/gcn.py:8-84`, `gat.py:8-77`, `gin.py:7-177`, `graph_sage.py:7-77`):
convs run over the disconnected union of per-node rooted subgraphs, node
embeddings are mean-pooled to their subgraph (`global_mean_pool(x,
node_to_subgraph)`), and the per-subgraph embeddings are dense-flattened per
graph and classified.

TPU-native: the union graph is a dense (B, M, M) block-diagonal adjacency
(`data/nested.py`); the node->subgraph pool is a one-hot segment matmul
(MXU), shapes static. Divergence (documented): dense flatten pads absent
subgraphs with 0 instead of the reference's data-dependent `x.min()-1` fill
(`kernel/gcn.py:70`) — padding only occurs for graphs below the dataset max
node count, where the reference's fill is an arbitrary sentinel anyway.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from iggcn_tpu.models.baselines import _GINMLP, _glorot
from iggcn_tpu.models.nn_compat import TorchLinear, dropout, pyg_glorot_att
from iggcn_tpu.ops import pool as P
from iggcn_tpu.ops.gat import GATParams, gat_conv
from iggcn_tpu.ops.gcn import gcn_conv, gcn_propagation_matrix


def subgraph_mean_pool(h: jax.Array, assign: jax.Array, mask: jax.Array,
                       num_subgraphs: int) -> jax.Array:
    """Mean of union-node embeddings per subgraph: one-hot segment matmul.

    h: (B, M, D); assign: (B, M) int subgraph ids; mask: (B, M) validity.
    Returns (B, num_subgraphs, D). Parity: `global_mean_pool(x,
    node_to_subgraph)` (`kernel/gcn.py:67`), vectorized for the MXU.
    """
    onehot = (assign[..., None] == jnp.arange(num_subgraphs)) & mask[..., None]
    onehot = onehot.astype(h.dtype)                       # (B, M, N)
    counts = jnp.maximum(onehot.sum(axis=1), 1.0)          # (B, N)
    summed = jnp.einsum("bmn,bmd->bnd", onehot, h)
    return summed / counts[..., None]


class NestedGNN(nn.Module):
    """Shared nested skeleton; `conv` picks the layer type.

    conv: 'gcn' | 'gat' | 'gin' | 'sage'. `use_z` embeds integer hop labels
    (Embedding(1000, 8), `kernel/gcn.py:16`), `use_rd` projects resistance
    distance (Linear(1, 8), `:14`); both add into one 8-dim embedding
    concatenated to the features (`:46-58`). readout 'flatten' dense-batches
    subgraph embeddings per graph (`:69-74`); 'add' sum-pools them
    (NestedGIN0, `kernel/gin.py:165-169`).
    """

    conv: str = "gcn"
    num_layers: int = 2
    hidden: int = 16
    num_classes: int = 2
    num_subgraphs: int = 90
    hidden_linear: int = 64
    use_z: bool = False
    use_rd: bool = False
    train_eps: bool = True
    readout: str = "flatten"

    @nn.compact
    def __call__(self, x, adj, mask, assign, *, z=None, rd=None,
                 train: bool = False, sample_weight=None):
        b = x.shape[0]
        # zero-weight (epoch-padding) samples stay out of BN batch stats
        bn_mask = mask if sample_weight is None else (
            mask & (sample_weight > 0)[:, None])
        if self.use_z or self.use_rd:
            emb = 0.0
            if self.use_z:
                table = self.param("z_embedding",
                                   nn.initializers.normal(1.0), (1000, 8))
                zi = jnp.zeros(x.shape[:2], jnp.int32) if z is None else z
                ze = jnp.take(table, jnp.clip(zi, 0, 999), axis=0)
                if ze.ndim == 4:  # multi-dim labels (spd): sum the label axis
                    ze = ze.sum(axis=2)  # parity `kernel/gcn.py:50-51`
                emb = emb + ze
            if self.use_rd:
                ri = jnp.zeros(x.shape[:2] + (1,)) if rd is None else rd
                emb = emb + TorchLinear(8, name="rd_projection")(ri)
            x = jnp.concatenate([emb, x], axis=-1)

        mf = mask[..., None].astype(x.dtype)
        if self.conv == "gcn":
            prop = gcn_propagation_matrix(adj)
        feats = []
        h = x
        for i in range(self.num_layers):
            if self.conv == "gcn":
                w = self.param(f"conv_w_{i}", _glorot, (h.shape[-1], self.hidden))
                bb = self.param(f"conv_b_{i}", nn.initializers.zeros,
                                (self.hidden,))
                h = nn.relu(gcn_conv(h, prop, w, bb))
            elif self.conv == "gat":
                p = GATParams(
                    weight=self.param(f"gat_w_{i}", _glorot,
                                      (h.shape[-1], self.hidden)),
                    att_src=self.param(f"att_src_{i}", pyg_glorot_att,
                                       (self.hidden,)),
                    att_dst=self.param(f"att_dst_{i}", pyg_glorot_att,
                                       (self.hidden,)),
                    lin_edge=self.param(f"lin_edge_{i}", _glorot,
                                        (1, self.hidden)),
                    att_edge=self.param(f"att_edge_{i}", pyg_glorot_att,
                                        (self.hidden,)),
                    bias=self.param(f"gat_b_{i}", nn.initializers.zeros,
                                    (self.hidden,)))
                h = nn.relu(gat_conv(h, adj, p))
            elif self.conv == "gin":
                eps = (self.param(f"eps_{i}", nn.initializers.zeros, ())
                       if self.train_eps else 0.0)
                agg = P.gin_conv_aggregate(h * mf, adj, eps)
                h = _GINMLP(self.hidden, name=f"mlp_{i}")(agg, train=train,
                                                          mask=bn_mask)
            elif self.conv == "sage":
                ws = self.param(f"sage_ws_{i}", _glorot,
                                (h.shape[-1], self.hidden))
                wn = self.param(f"sage_wn_{i}", _glorot,
                                (h.shape[-1], self.hidden))
                bb = self.param(f"sage_b_{i}", nn.initializers.zeros,
                                (self.hidden,))
                h = nn.relu(P.sage_conv(h * mf, adj, ws, wn) + bb)
            else:
                raise ValueError(f"unknown conv {self.conv}")
            feats.append(h)

        jk = jnp.concatenate(feats, axis=-1)
        sub = subgraph_mean_pool(jk, assign, mask, self.num_subgraphs)
        if self.readout == "add":
            g = jnp.sum(sub, axis=1)
            g = nn.relu(TorchLinear(self.hidden, name="lin1")(g))
            if train:
                g = dropout(self.make_rng("dropout"), g, 0.5)
            return jax.nn.log_softmax(
                TorchLinear(self.num_classes, name="lin2")(g), -1)
        flat = sub.reshape(b, -1)
        g = nn.relu(TorchLinear(self.hidden_linear, name="lin1")(flat))
        if train:
            g = dropout(self.make_rng("dropout"), g, 0.5)
        return jax.nn.log_softmax(
            TorchLinear(self.num_classes, name="lin2")(g), -1)


def NestedGCN(**kw):
    return NestedGNN(conv="gcn", **kw)


def NestedGAT(**kw):
    return NestedGNN(conv="gat", **kw)


def NestedGIN(**kw):
    return NestedGNN(conv="gin", **kw)


def NestedGIN0(**kw):
    return NestedGNN(conv="gin", train_eps=False, readout="add", **kw)


def NestedGraphSAGE(**kw):
    return NestedGNN(conv="sage", **kw)
