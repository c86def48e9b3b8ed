"""Hierarchical attention GCN encoder/decoder over the GO DAG.

TPU-native re-design of `kernel/go_model.py:23-287` (`Gene_ontology_network`):

  * The reference builds per-sample sparse attention adjacencies in a Python
    loop over the batch (`go_model.py:236-244`) and multiplies with cuSPARSE.
    Here the GO topology is a compile-time constant, so every layer is a
    dense masked (B, n, n) x (B, n, f) batched matmul — vmapped over subjects
    by construction, pure MXU work at these sizes (n in the hundreds).
  * The learned sparse gene->GO lift (per-nnz parameters of the GO x SNP
    incidence, `go_model.py:78-88,206-215`) becomes a dense parameter matrix
    multiplied by the static 0/1 incidence mask: identical math (off-pattern
    entries never contribute or receive gradient), one einsum per channel.
  * Hierarchical pooling = static slicing of the level-sorted node axis
    (`go_model.py:249-251`), shapes known at trace time.
  * Decoder un-pooling (`batch_mul` + torch_scatter, `go_model.py:195-201,
    258-275`) becomes a dense masked matmul with a uniform row-normalized
    rectangular mask.

Activation variant: `activation='relu'` is `go_model.py`; `'prelu'` matches
`kernel/guide_go_model.py` (PReLU everywhere, latent MLP without final
BN+ReLU).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iggcn_tpu.data.go_graph import GoTopology
from iggcn_tpu.models.nn_compat import (BatchNorm1d, NodeLayerNorm,
                                        TorchLinear, dropout, node_dropout,
                                        torch_linear_init)
from iggcn_tpu.ops.attention import masked_row_normalize


def _gaussian_init(mean: float, std: float):
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)
    return init


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, alpha * x)


class GeneOntologyNetwork(nn.Module):
    """Encoder/decoder over a static GO hierarchy.

    Attributes:
      topo: static GoTopology (host numpy; captured as constants under jit).
      in_f_dim: number of learned gene-encoding channels (reference: 2).
      n_l: encoder/decoder depth (levels pooled).
      f_dim: hidden dims per layer, length n_l.
      l_dim: latent dim of the readout MLP.
      dim_snps_atten: width of the cross-attention token readout.
    """

    topo: Any                      # GoTopology
    in_f_dim: int = 2
    n_l: int = 2
    f_dim: Sequence[int] = (5, 5)
    l_dim: int = 32
    dim_snps_atten: int = 5
    dropout_gcn: float = 0.4
    dropout_readout: float = 0.5
    # classify-head dropout rates (reference go_model.py:152,155); attrs so
    # the trajectory-parity test can zero them (PRNGs can't cross frameworks)
    dropout_cls: Tuple[float, float] = (0.5, 0.3)
    activation: str = "relu"       # 'relu' (go_model) | 'prelu' (guide_go_model)
    # Encoder edge-attention implementation (identical math, pinned by the
    # golden sparse-reference test):
    #   'dense' — masked (B, n, n) row-normalize + einsum; fastest at small
    #             batch where gather overhead dominates.
    #   'edge'  — (B, E) gathered scores + static one-hot aggregation
    #             matmuls; avoids the (B, n, n) HBM traffic entirely and
    #             scales ~linearly in batch (~2x throughput at batch 128).
    #   'auto'  — picked per traced batch size (shapes are static under
    #             jit, so exactly one path is compiled). The batch-64
    #             crossover is attested on-chip by the bench's
    #             attention_ab leg (BENCH r4 / BASELINE.md "attention-impl
    #             A/B": b32 dense 62.7k vs edge 54.4k g/s; b64 edge 87.7k
    #             vs dense 63.8k; b128 edge 118.6k vs dense 58.4k).
    attention_impl: str = "auto"

    def setup(self):
        topo: GoTopology = self.topo
        self.pool = list(topo.pool)
        self.n_nodes = topo.n
        self.n_top = self.n_nodes - sum(self.pool[: self.n_l])
        self.fdims = [self.in_f_dim] + list(self.f_dim)

        # static masks (numpy -> baked into the jitted program as constants)
        host_enc_masks = topo.encoder_masks(self.n_l)
        self.enc_masks = [jnp.asarray(m) for m in host_enc_masks]
        self.dec_masks = [jnp.asarray(m) for m in topo.decoder_masks(self.n_l)]
        # static edge lists of the encoder masks: the GO DAG has ~2 edges per
        # node, so the edge attention runs on (B, E) gathered scores + static
        # one-hot aggregation matmuls instead of materializing dense
        # (B, n, n) tensors (~200x less HBM traffic at the real ~440-node
        # scale)
        enc_edges = []
        for m in host_enc_masks:
            r, c = np.nonzero(m)
            # static one-hot row-aggregation matrix (n_cur, E): edge->row
            # sums become dense matmuls (MXU) instead of scatters
            agg = np.zeros((m.shape[0], len(r)), np.float32)
            agg[r, np.arange(len(r))] = 1.0
            enc_edges.append((jnp.asarray(r, jnp.int32),
                              jnp.asarray(c, jnp.int32),
                              jnp.asarray(agg)))
        self.enc_edges = enc_edges
        self.gene_mask = jnp.asarray(topo.go_snps != 0)          # (n, S)

        n, s = topo.go_snps.shape
        # gene encoding lifts: one masked dense (n, S) parameter per channel
        # (parity: per-nnz params normal(1.0, 0.1), go_model.py:80-81)
        self.gene_enc = [self.param(f"gene_enc_{c}", _gaussian_init(1.0, 0.1),
                                    (n, s)) for c in range(self.in_f_dim)]
        self.gene_dec = self.param("gene_dec", _gaussian_init(1.0, 0.1), (n, s))

        # encoder stacks
        self.w_inc = [TorchLinear(self.fdims[i + 1], use_bias=False,
                                  name=f"w_inc_{i}") for i in range(self.n_l)]
        self.w_s_loop = [TorchLinear(self.fdims[i + 1], use_bias=False,
                                     name=f"w_s_loop_{i}") for i in range(self.n_l)]
        self.w_att_s = [TorchLinear(1, use_bias=False, name=f"w_att_s_{i}")
                        for i in range(self.n_l)]
        # raw (2f, 1) kernels: the edge score tanh(W [x_r || x_c]) splits into
        # two rank-1 terms u_r + v_c, so we keep the kernel, not a Linear.
        self.w_att_in = [self.param(f"w_att_in_{i}",
                                    torch_linear_init(2 * self.fdims[i + 1]),
                                    (2 * self.fdims[i + 1], 1))
                         for i in range(self.n_l)]
        self.g_b = [NodeLayerNorm(sum(self.pool[i:]), name=f"g_b_{i}")
                    for i in range(self.n_l)]

        # decoder stacks (fdims reversed)
        self.w_out = [TorchLinear(self.fdims[i - 1], use_bias=False,
                                  name=f"w_out_{self.n_l - i}")
                      for i in range(self.n_l, 0, -1)]
        self.w_s_loop_out = [TorchLinear(self.fdims[i - 1], use_bias=False,
                                         name=f"w_s_loop_out_{self.n_l - i}")
                             for i in range(self.n_l, 0, -1)]
        self.g_b_d = [NodeLayerNorm(sum(self.pool[i:]), name=f"g_b_d_{self.n_l - 1 - i}")
                      for i in range(self.n_l - 1, -1, -1)]

        if self.activation == "prelu":
            self.acts_enc = [PReLU(name=f"act_enc_{i}") for i in range(self.n_l)]
            self.acts_dec = [PReLU(name=f"act_dec_{i}") for i in range(self.n_l)]
            self.act_atten = PReLU(name="act_atten")
            self.act_b = PReLU(name="act_b")
            self.act_b_d = PReLU(name="act_b_d")
            self.act_latent1 = PReLU(name="act_latent1")
        # readouts
        self.conc_for_attention = TorchLinear(self.dim_snps_atten, use_bias=False,
                                              name="conc_for_attention")
        self.bn_atten = BatchNorm1d(name="bn_atten")
        self.conc = TorchLinear(1, use_bias=False, name="conc")
        self.bn_b = BatchNorm1d(name="bn_b")
        self.conc_d = TorchLinear(1, use_bias=False, name="conc_d")
        self.bn_b_d = BatchNorm1d(name="bn_b_d")

        self.latent1 = TorchLinear(32, use_bias=False, name="latent1")
        self.bn_latent1 = BatchNorm1d(name="bn_latent1")
        self.latent2 = TorchLinear(self.l_dim, use_bias=False, name="latent2")
        self.bn_latent2 = BatchNorm1d(name="bn_latent2")

        # standalone classification head (parity go_model.py:148-157; used by
        # the SNP-only trainer train_eval_snps.py)
        self.bn_cls = BatchNorm1d(name="bn_cls")
        self.cls1 = TorchLinear(16, use_bias=False, name="cls1")
        self.cls2 = TorchLinear(1, use_bias=True, name="cls2")

    def _act(self, x, bank: str, i: int = 0):
        if self.activation == "prelu":
            if bank == "enc":
                return self.acts_enc[i](x)
            if bank == "dec":
                return self.acts_dec[i](x)
            return {"atten": self.act_atten, "b": self.act_b,
                    "b_d": self.act_b_d, "latent1": self.act_latent1}[bank](x)
        return nn.relu(x)

    def __call__(self, snps: jax.Array, *, train: bool = False,
                 sample_weight: jax.Array | None = None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Forward.

        Args:
          snps: (B, S) SNP features (possibly importance-masked).
          train: enables dropout and batch-stat updates.
          sample_weight: optional (B,) 0/1 padding mask for batch statistics.
        Returns:
          latent (B, l_dim), x_hat (B, S) reconstructed SNPs,
          atten_out (B, n_top, dim_snps_atten) cross-attention tokens.
        """
        det = not train
        # ---- gene encoding: (B, S) -> (B, n, C) --------------------------
        chans = [snps @ (self.gene_mask * w).T for w in self.gene_enc]
        x = jnp.stack(chans, axis=2)

        # ---- hierarchical encoder ---------------------------------------
        use_edge = (self.attention_impl == "edge"
                    or (self.attention_impl == "auto"
                        and snps.shape[0] >= 64))
        for jj in range(self.n_l):
            x_in = self.w_inc[jj](x)
            x_s = self.w_s_loop[jj](x)
            # edge attention exp(tanh(W [x_r || x_c])) as two rank-1 terms
            # u_r + v_c; identical math across both aggregation impls (the
            # golden sparse-reference test pins it)
            w_att = self.w_att_in[jj]
            f = x_in.shape[-1]
            u = x_in @ w_att[:f, 0]
            v = x_in @ w_att[f:, 0]
            if use_edge:
                # (B, E) gathered scores + static one-hot aggregation
                # matmuls — no (B, n, n) tensors ever materialize
                rows, cols, agg = self.enc_edges[jj]
                scores_e = jnp.exp(jnp.tanh(u[:, rows] + v[:, cols]))
                rowsum = jnp.einsum("ne,be->bn", agg, scores_e,
                                    preferred_element_type=jnp.float32)
                vn = scores_e / rowsum[:, rows]
                msg = vn[..., None] * x_in[:, cols, :]         # (B, E, f)
                incoming = jnp.einsum("ne,bef->bnf", agg, msg,
                                      preferred_element_type=jnp.float32)
            else:
                mask = self.enc_masks[jj]
                scores = jnp.exp(jnp.tanh(u[:, :, None] + v[:, None, :]))
                a_hat = masked_row_normalize(scores, mask)
                incoming = jnp.einsum("brc,bcf->brf", a_hat, x_in,
                                      preferred_element_type=jnp.float32)
            v_s = jax.nn.sigmoid(self.w_att_s[jj](x_s))
            out = incoming + x_s * v_s
            out = self.g_b[jj](out)
            out = self._act(out, "enc", jj)
            if train:
                out = node_dropout(self.make_rng("dropout"), out,
                                   self.dropout_gcn)
            x = out[:, self.pool[jj]:, :]

        # ---- readouts -----------------------------------------------------
        atten_out = self._act(self.bn_atten(self.conc_for_attention(x),
                                            use_running_average=det,
                                            weight=sample_weight), "atten")
        inp = self.bn_b(self.conc(x)[..., 0], use_running_average=det,
                        weight=sample_weight)
        inp = self._act(inp, "b")
        if train:
            inp = dropout(self.make_rng("dropout"), inp, self.dropout_readout)

        h = self.bn_latent1(self.latent1(inp), use_running_average=det,
                            weight=sample_weight)
        h = self._act(h, "latent1")
        if train:
            h = dropout(self.make_rng("dropout"), h, self.dropout_readout)
        h = self.latent2(h)
        if self.activation == "prelu":
            latent = h  # guide_go_model.py:138-144 ends without BN/ReLU
        else:
            latent = nn.relu(self.bn_latent2(h, use_running_average=det,
                                             weight=sample_weight))

        # ---- hierarchical decoder ----------------------------------------
        for jj in range(self.n_l):
            mask = self.dec_masks[jj]
            x_out = self.w_out[jj](x)
            x_s_out = self.w_s_loop_out[jj](x)
            # uniform attention: 1/row-degree over the static mask
            ones = jnp.ones(mask.shape, jnp.float32)
            a_dec = masked_row_normalize(ones, mask)
            x_outgoing = jnp.einsum("rc,bcf->brf", a_dec, x_out,
                                    preferred_element_type=jnp.float32)
            grow = self.pool[self.n_l - jj - 1]
            x_self = jnp.pad(x_s_out, ((0, 0), (grow, 0), (0, 0)))
            out_dec = x_outgoing + x_self
            out_dec = self.g_b_d[jj](out_dec)
            out_dec = self._act(out_dec, "dec", jj)
            if train:
                out_dec = node_dropout(self.make_rng("dropout"), out_dec,
                                       self.dropout_gcn)
            x = out_dec

        out_d = self.bn_b_d(self.conc_d(x)[..., 0], use_running_average=det,
                            weight=sample_weight)
        out_d = self._act(out_d, "b_d")
        if train:
            out_d = dropout(self.make_rng("dropout"), out_d, self.dropout_readout)

        # ---- gene decoding: (B, n) -> (B, S) -------------------------------
        x_hat = out_d @ (self.gene_mask * self.gene_dec)

        return latent, x_hat, atten_out

    def classify(self, latent: jax.Array, snps: jax.Array, *,
                 train: bool = False,
                 sample_weight: jax.Array | None = None) -> jax.Array:
        """Standalone SNP classifier head (parity `go_model.py:148-157`).
        `sample_weight` masks padding rows out of bn_cls batch statistics."""
        det = not train
        h = jnp.concatenate([latent, snps], axis=-1)
        h = nn.relu(self.bn_cls(h, use_running_average=det,
                                weight=sample_weight))
        if train:
            h = dropout(self.make_rng("dropout"), h, self.dropout_cls[0])
        h = nn.relu(self.cls1(h))
        if train:
            h = dropout(self.make_rng("dropout"), h, self.dropout_cls[1])
        return jax.nn.sigmoid(self.cls2(h))
