"""Persistent XLA compilation cache.

The whole-fold scan program compiles in ~2 min the first time (it inlines
E epochs x (train scan + 2 eval scans) of the dual-pass model). The fold
program is shape-stable across runs of the same experiment config, so a
persistent cache turns every later run's compile into a disk hit.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX at a persistent compilation cache (idempotent)."""
    import jax

    if path is None:
        path = os.environ.get(
            "IGGCN_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "iggcn_tpu",
                         "jax_cache"))
    # separate caches per backend: entries written while attached to the
    # remote TPU (axon) embed that host's CPU feature flags and SIGILL-risk
    # when loaded by plain local-CPU runs
    path = os.path.join(path, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program regardless of compile time / size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
