"""IG-GCN-TPU: a TPU-native JAX/XLA framework for interpretable multimodal
graph learning (imaging + genetics), re-designed from the capability surface of
the IG-GCN reference (Interpretable Graph Convolutional Network for Alzheimer's
Disease diagnosis using multi-modal imaging genetics).

Design principles (TPU-first, not a port):
  * Brain graphs are tiny and fixed-size (90 / 270 ROIs) -> all graph convs are
    dense batched einsums over (B, N, N) normalized adjacency: pure MXU work.
  * GO-ontology topology is static per run -> attention adjacencies are dense
    masked matmuls with compile-time masks; no per-sample Python loops.
  * Whole training epochs run as one jit-compiled `lax.scan` over a
    device-resident dataset; host<->device traffic is one transfer per fold.
  * Multi-chip scaling is batch data-parallelism over a `jax.sharding.Mesh`
    (ICI collectives inserted by XLA), plus embarrassingly-parallel folds.
"""

__version__ = "0.2.0"
