"""Persistent XLA compilation cache.

The whole-fold scan program compiles in ~2 min the first time (it inlines
E epochs x (train scan + 2 eval scans) of the dual-pass model). The fold
program is shape-stable across runs of the same experiment config, so a
persistent cache turns every later run's compile into a disk hit.
"""
from __future__ import annotations

import os


def _host_cpu_fingerprint() -> str:
    """Short stable hash of this host's CPU feature flags (see the SIGILL
    note at the call site). Falls back to a constant off-Linux."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as fh:
            flags = next(line for line in fh if line.startswith("flags"))
    except (OSError, StopIteration):
        return "nocpuinfo"
    # flag order is kernel-stable within a boot but not guaranteed across
    # kernels; sort so equal feature SETS share a cache
    return hashlib.sha1(
        " ".join(sorted(flags.split(":", 1)[1].split())).encode()
    ).hexdigest()[:10]


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
    if jax.default_backend() == "cpu":
        # ...and per HOST CPU for the cpu backend: XLA:CPU AOT entries bake
        # the compile machine's feature set (avx512*, amx*), and this VM's
        # visible features change across sessions — loading a mismatched
        # entry logs cpu_aot_loader errors and risks SIGILL (observed live:
        # entries compiled with +amx-avx512 loaded on a host without it)
        path = os.path.join(path, _host_cpu_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program regardless of compile time / size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
