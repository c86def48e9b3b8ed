"""Typed configuration for the framework.

Replaces the reference's argparse-flag soup (`main.py:35-113`) and module-global
loss weights (`sgcn_hyperparameters.py:1-24`) with frozen dataclasses, while
keeping CLI-flag parity in `main.py`.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class SparsityWeights:
    """Importance-probability penalty weights.

    Parity: `sgcn_hyperparameters.py:18-23` (consumed as `hp.lamda_*` in
    `kernel/sgcn_img_snp.py:177-178` and `kernel/train_eval_sgcn_img_snps.py:543`).
    """

    lamda_x_l1: float = 0.1
    lamda_e_l1: float = 0.1
    lamda_x_ent: float = 0.1
    lamda_e_ent: float = 0.1
    lamda_mi: float = 1.0
    lamda_ce: float = 1.0


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """The positional `lambda_loss` list of the reference, named.

    Parity: `main.py:73-78,204` -> [disease, regr, prob, reco, simi, orth],
    defaults from the reference CLI defaults.
    """

    disease: float = 0.0
    regr: float = 1.0
    prob: float = 0.5
    reco: float = 0.0000015
    simi: float = 0.1
    orth: float = 0.0

    @classmethod
    def from_list(cls, lambda_loss: Sequence[float]) -> "LossWeights":
        d, r, p, rc, s, o = lambda_loss
        return cls(disease=d, regr=r, prob=p, reco=rc, simi=s, orth=o)

    def to_list(self) -> Tuple[float, ...]:
        return (self.disease, self.regr, self.prob, self.reco, self.simi, self.orth)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the fused SGCN x GO model.

    Parity: constructor args of `kernel/sgcn_img_snp.py:15-17` plus the GO
    branch dims hard-coded at `kernel/sgcn_img_snp.py:36,99` (n_l=2, f_dim=[5,5],
    in_f_dim=2) and `kernel/train_eval_sgcn_img_snps.py:72` (l_dim=32).
    """

    num_layers: int = 2
    hidden: int = 16
    rois: int = 90
    feat_dim: int = 3           # H_0: imaging channels per ROI
    num_classes: int = 2
    num_regr: int = 3
    hidden_linear: int = 64
    l_dim: int = 32             # GO latent dim
    go_in_f_dim: int = 2        # GO gene-encoding channels
    go_n_l: int = 2             # GO encoder/decoder depth used by the fusion model
    go_f_dim: Tuple[int, ...] = (5, 5)
    num_snps: int = 54
    is_cross_atten: bool = True
    num_attn_heads: int = 2
    use_gat: bool = False        # ifUseGAT of kernel/gcn_img_snp.py:32-47
    num_cluster: int = 2
    is_predict_cluster: bool = True
    is_soft_similarity: bool = True
    rbf_gamma: float = 0.01
    graph_pool: bool = False
    is_use_prob4regr: bool = True
    model4eachregr: bool = False
    is_image_only: bool = False
    is_snps_only: bool = False
    is_multi_fusion: bool = False
    # Run the imaging GCN stack as one fused Pallas kernel (ops/pallas_gcn.py)
    # instead of per-layer XLA matmuls. Off-TPU backends fall back to the
    # interpreter (tests) — enable for TPU benchmarking.
    use_pallas_gcn: bool = False
    # GO-branch edge-attention aggregation: 'dense' (masked (B, n, n)
    # matmuls), 'edge' ((B, E) gathers + one-hot aggregation), or 'auto'
    # (per traced batch size; crossover attested by the bench's
    # attention-impl A/B leg — see go_network.GeneOntologyNetwork).
    go_attention_impl: str = "auto"
    dropout_lin: float = 0.5
    dropout_regr: float = 0.3
    dropout_go: float = 0.4
    dropout_readout: float = 0.5

    @property
    def jk_dim(self) -> int:
        """Jumping-knowledge concat width of the imaging GCN stack."""
        return self.num_layers * self.hidden


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization / CV settings.

    Parity: `main.py:94-104` defaults and the trainer signature
    `kernel/train_eval_sgcn_img_snps.py:35-60`.
    """

    epochs: int = 200
    batch_size: int = 32
    lr: float = 1e-3
    lr_decay_factor: float = 0.5
    lr_decay_step_size: int = 50
    weight_decay: float = 0.0
    folds: int = 5
    seed: int = 1000
    no_val: bool = False
    temperature: float = 0.1
    num_cluster: int = 2
    clinical_score_index: int = -1
    is_permut_test: bool = False
    # Run each CV fold as ONE jitted lax.scan over epochs (single device
    # dispatch per fold) instead of ~4 dispatches per epoch. Disable only for
    # debugging; results are identical.
    use_fold_scan: bool = True
    # Run ALL folds simultaneously: the fold runner is vmapped over a fold
    # axis sharded across the device mesh (train/fold_parallel.py). Requires
    # use_fold_scan. Results are identical up to float reduction order.
    fold_parallel: bool = False
    # Upload the full cohort to HBM once and gather each fold's rows ON
    # DEVICE (one jitted gather per fold) instead of re-uploading ~overlapping
    # fold arrays from the host — 5x less host->device traffic for 5-fold CV.
    # Padding rows carry arbitrary (w=0-masked) content instead of zeros;
    # every reduction is w-weighted so results are identical.
    device_gather: bool = True
    # Fuse the flagship's two forwards per step (plain + importance-masked)
    # into one vmapped apply over a mask axis of size 2 (SURVEY §7.1) —
    # ~1.5-2x step throughput; identical math incl. sequential BatchNorm
    # running-stat updates (steps._dual_pass).
    dual_pass_vmap: bool = True
    # Unroll factor for the within-epoch step scan (lax.scan unroll=k):
    # trades compile time for less loop overhead / cross-step fusion on the
    # dispatch-latency-bound tiny-op program. 1 = no unrolling.
    scan_unroll: int = 1
    # Rematerialize the whole forward in the backward pass
    # (jax.checkpoint around the step's loss_fn): stores only the inputs
    # and recomputes activations instead of streaming them back from HBM.
    # A memory/bandwidth-vs-recompute trade probed for the past-the-knee
    # batches (BASELINE.md r5 profile). Measured on TPU: SLOWER at every
    # batch (256: -24%, 512: -27%, 1024: -26%) — the step is
    # VPU-throughput-bound, so the recomputed forward costs more than the
    # activation readback it saves. Default off; identical math either
    # way (pinned by test_remat_step_equivalence). Kept as the scaffold
    # for activation-heavy variants (larger ROIs/hidden) where the trade
    # can flip.
    remat: bool = False
    loss: LossWeights = dataclasses.field(default_factory=LossWeights)
    sparsity: SparsityWeights = dataclasses.field(default_factory=SparsityWeights)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Ingestion / preprocessing knobs.

    Parity: `main.py:37-45` (knn / diffusion flags), `sgcn_data.py:113-120`.
    """

    data_path: str = "./data/snps/data/preprocessing/"
    json_path: str = "./data/snps/analysis.json"
    go_connection_path: str = "./data/go_root_connection.txt"
    snps_to_gene_path: str = "./data/snps_to_gene.txt"
    knn: int = 5
    disease_id: int = 3
    clinical_score_index: int = -1
    is_ppr: bool = True
    is_topk: bool = True
    top_k: int = 3
    ppr_alpha: float = 0.05
    heat_t: float = 5.0
    num_cluster: int = 2
    is_use_tsne4similar: bool = False
    is_multimodal4similarity: bool = False
    is_multi_fusion: bool = False
    is_permut_test: bool = False
    seed4permut_test: int = 1

    @property
    def num_classes(self) -> int:
        return 2 if self.disease_id < 3 else 3
