"""Image-only SGCN family (no genetics branch).

Re-design of `kernel/sgcn.py`:
  * `SGCNOri`   <- SGCN_Ori (`:11-151`): fixed conv1->conv3 net, readout is the
    flattened concat of the hidden and final conv activations, fc1/bn1 ->
    fc2/bn2 -> fc3 head with dropout 0.5/0.7. (The reference's grad-CAM hooks
    are imperative torch; the JAX equivalent is `jax.grad` w.r.t. the conv
    activations, which needs no hooks.)
  * `SGCNImage` <- SGCN_GCN (`:272-387`) and SGCN_GAT (`:154`): configurable
    depth, JK-concat, flatten readout, lin1/lin2 head; `use_gat` switches the
    conv type.

All share the learned ROI/edge importance masking (`cal_probability`,
`kernel/sgcn.py:76-91`); the sparsity penalty lives in
`train/losses.py:sgcn_sparsity_loss` (NOTE: this family normalizes the node
L1 term by N, not N*D, and has no SNP term — `kernel/sgcn.py:88-109`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggcn_tpu.models.nn_compat import (BatchNorm1d, TorchLinear, dropout,
                                        kaiming_uniform_a5, pyg_glorot,
                                        pyg_glorot_att)
from iggcn_tpu.ops.gat import GATParams, gat_conv
from iggcn_tpu.ops.gcn import gcn_conv, gcn_propagation_matrix
from iggcn_tpu.ops.masking import importance_masks


# canonical inits live in nn_compat; aliases keep the param lines short
_glorot = pyg_glorot
_kaiming_a5 = kaiming_uniform_a5


class SGCNImage(nn.Module):
    """SGCN_GCN / SGCN_GAT: JK-concat conv stack + flatten readout."""

    num_layers: int = 2
    hidden: int = 16
    rois: int = 90
    feat_dim: int = 3
    num_classes: int = 2
    hidden_linear: int = 64
    use_gat: bool = False
    # head dropout rate (reference hardcodes 0.5, kernel/sgcn.py:381) as an
    # attribute so the trajectory-parity test can zero it
    dropout_lin: float = 0.5

    def setup(self):
        if self.use_gat:
            dims = [self.feat_dim] + [self.hidden] * self.num_layers
            self.gat_ps = [GATParams(
                weight=self.param(f"gat_w_{i}", _glorot,
                                  (dims[i], self.hidden)),
                att_src=self.param(f"gat_att_src_{i}", pyg_glorot_att,
                                   (self.hidden,)),
                att_dst=self.param(f"gat_att_dst_{i}", pyg_glorot_att,
                                   (self.hidden,)),
                lin_edge=self.param(f"gat_lin_edge_{i}", _glorot,
                                    (1, self.hidden)),
                att_edge=self.param(f"gat_att_edge_{i}", pyg_glorot_att,
                                    (self.hidden,)),
                bias=self.param(f"gat_b_{i}", nn.initializers.zeros,
                                (self.hidden,)))
                for i in range(self.num_layers)]
        else:
            self.conv_w = [self.param(
                f"conv_w_{i}", _glorot,
                (self.feat_dim if i == 0 else self.hidden, self.hidden))
                for i in range(self.num_layers)]
            self.conv_b = [self.param(f"conv_b_{i}", nn.initializers.zeros,
                                      (self.hidden,))
                           for i in range(self.num_layers)]
        # parity kernel/sgcn.py:288: prob is ZERO-initialized in this family
        self.prob = self.param("prob", nn.initializers.zeros,
                               (self.rois, self.feat_dim))
        self.prob_bias = self.param("prob_bias", _kaiming_a5,
                                    (2 * self.feat_dim, 1))
        self.lin1 = TorchLinear(self.hidden_linear, name="lin1")
        self.lin2 = TorchLinear(self.num_classes, name="lin2")

    def trunk(self, x: jax.Array, adj: jax.Array, *,
              is_explain: bool = False):
        """Conv stack up to (and including) the final conv, PRE-relu.

        Grad-CAM seam: the reference hooks `final_conv_acts` (the last
        conv's pre-activation output) and its gradient
        (`kernel/sgcn.py:124-126,195-196`); here the same tensor is simply
        the second return value, differentiated with `jax.grad` in
        `tools/explain.py` — no hooks needed. Returns (prefix_feats, acts):
        prefix_feats are the post-relu outputs of all but the last layer.
        """
        if is_explain:
            masks = importance_masks(x, adj, self.prob, self.prob_bias)
            x_used, adj_used = masks.x_masked, masks.adj_masked
        else:
            x_used, adj_used = x, adj
        h = x_used
        feats = []
        if self.use_gat:
            for p in self.gat_ps[:-1]:
                h = nn.relu(gat_conv(h, adj_used, p))
                feats.append(h)
            acts = gat_conv(h, adj_used, self.gat_ps[-1])
        else:
            prop = gcn_propagation_matrix(adj_used)
            for i in range(self.num_layers - 1):
                h = nn.relu(gcn_conv(h, prop, self.conv_w[i], self.conv_b[i]))
                feats.append(h)
            acts = gcn_conv(h, prop, self.conv_w[-1], self.conv_b[-1])
        return tuple(feats), acts

    def head(self, prefix_feats, acts: jax.Array, *, train: bool = False,
             sample_weight: Optional[jax.Array] = None) -> jax.Array:
        del sample_weight  # no batch statistics in this family
        b = acts.shape[0]
        feats = list(prefix_feats) + [nn.relu(acts)]
        z = jnp.concatenate(feats, axis=-1).reshape(b, -1)
        z = nn.relu(self.lin1(z))
        if train:
            z = dropout(self.make_rng("dropout"), z, self.dropout_lin)
        return jax.nn.log_softmax(self.lin2(z), axis=-1)

    def __call__(self, x: jax.Array, adj: jax.Array, *,
                 is_explain: bool = False, train: bool = False,
                 sample_weight: Optional[jax.Array] = None) -> jax.Array:
        prefix_feats, acts = self.trunk(x, adj, is_explain=is_explain)
        return self.head(prefix_feats, acts, train=train,
                         sample_weight=sample_weight)


class SGCNOri(nn.Module):
    """SGCN_Ori: fixed conv1 -> conv3 with concat readout
    (parity `kernel/sgcn.py:11-151`; conv2 is bypassed there too)."""

    h0: int = 3
    h1: int = 32
    h2: int = 32
    h3: int = 5
    num_classes: int = 2
    rois: int = 90
    dim2: int = 64
    dim3: int = 16
    # head dropout rates (reference hardcodes 0.5/0.7, kernel/sgcn.py:142-146)
    # as attributes so the trajectory-parity test can zero them
    dropout1: float = 0.5
    dropout2: float = 0.7

    def setup(self):
        self.conv1_w = self.param("conv1_w", _glorot, (self.h0, self.h1))
        self.conv1_b = self.param("conv1_b", nn.initializers.zeros, (self.h1,))
        self.conv3_w = self.param("conv3_w", _glorot, (self.h1, self.h3))
        self.conv3_b = self.param("conv3_b", nn.initializers.zeros, (self.h3,))
        self.fc1 = TorchLinear(self.dim2, name="fc1")
        self.bn1 = BatchNorm1d(name="bn1")
        self.fc2 = TorchLinear(self.dim3, name="fc2")
        self.bn2 = BatchNorm1d(name="bn2")
        self.fc3 = TorchLinear(self.num_classes, name="fc3")
        self.prob = self.param("prob", nn.initializers.zeros,
                               (self.rois, self.h0))
        self.prob_bias = self.param("prob_bias", _kaiming_a5,
                                    (2 * self.h0, 1))

    def trunk(self, x: jax.Array, adj: jax.Array, *,
              is_explain: bool = False):
        """(h1, final_conv_acts) — acts is conv3's PRE-relu output, the
        tensor the reference grad-CAM hooks capture
        (`kernel/sgcn.py:124-126`)."""
        if is_explain:
            masks = importance_masks(x, adj, self.prob, self.prob_bias)
            x_used, adj_used = masks.x_masked, masks.adj_masked
        else:
            x_used, adj_used = x, adj
        prop = gcn_propagation_matrix(adj_used)
        h1 = nn.relu(gcn_conv(x_used, prop, self.conv1_w, self.conv1_b))
        acts = gcn_conv(h1, prop, self.conv3_w, self.conv3_b)
        return (h1,), acts

    def head(self, prefix_feats, acts: jax.Array, *, train: bool = False,
             sample_weight: Optional[jax.Array] = None) -> jax.Array:
        """`sample_weight`: (B,) 0/1 padding mask — bn1/bn2 batch statistics
        cover real rows only so padded dense batches bit-match the
        reference's ragged final batch (the framework invariant,
        train/steps.py:11-14)."""
        (h1,) = prefix_feats
        b = acts.shape[0]
        det = not train
        h3 = nn.relu(acts)
        z = jnp.concatenate([h1.reshape(b, -1), h3.reshape(b, -1)], axis=-1)
        z = self.bn1(nn.relu(self.fc1(z)), use_running_average=det,
                     weight=sample_weight)
        if train:
            z = dropout(self.make_rng("dropout"), z, self.dropout1)
        z = self.bn2(nn.relu(self.fc2(z)), use_running_average=det,
                     weight=sample_weight)
        if train:
            z = dropout(self.make_rng("dropout"), z, self.dropout2)
        return jax.nn.log_softmax(self.fc3(z), axis=-1)

    def __call__(self, x: jax.Array, adj: jax.Array, *,
                 is_explain: bool = False, train: bool = False,
                 sample_weight: Optional[jax.Array] = None) -> jax.Array:
        prefix_feats, acts = self.trunk(x, adj, is_explain=is_explain)
        return self.head(prefix_feats, acts, train=train,
                         sample_weight=sample_weight)
