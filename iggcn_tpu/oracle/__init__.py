"""Reference-semantics PyTorch oracle (CPU).

An independent re-implementation of the fused model's math using *genuine*
torch layers (BatchNorm1d / LayerNorm / MultiheadAttention / functional
dropout) so the JAX build can be validated against PyTorch semantics with
shared weights, and timed as the reference-equivalent baseline for bench.py.
Not part of the TPU execution path.
"""
