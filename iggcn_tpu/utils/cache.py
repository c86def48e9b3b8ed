"""Persistent XLA compilation cache.

The whole-fold scan program compiles in ~2 min the first time (it inlines
E epochs x (train scan + 2 eval scans) of the dual-pass model). The fold
program is shape-stable across runs of the same experiment config, so a
persistent cache turns every later run's compile into a disk hit.
"""
from __future__ import annotations

import os

# fingerprint dirs whose entries haven't been touched for this long are
# pruned on the next enable — the motivating VM changes its visible CPU
# features across sessions, which would otherwise strand one multi-hundred-
# MB compile cache per feature shape, unboundedly
STALE_CACHE_DAYS = 14.0


def _host_cpu_fingerprint() -> str:
    """Short stable hash of this host's CPU feature set (see the SIGILL
    note at the call site). x86 /proc/cpuinfo lists them under 'flags',
    ARM under 'Features'; off-Linux falls back to the platform tuple (no
    feature granularity, but distinct machine kinds stay distinct)."""
    import hashlib

    feats = None
    try:
        with open("/proc/cpuinfo") as fh:
            feats = next(line for line in fh
                         if line.startswith(("flags", "Features")))
    except (OSError, StopIteration):
        import platform

        feats = f": {platform.machine()} {platform.processor()}"
    # flag order is kernel-stable within a boot but not guaranteed across
    # kernels; sort so equal feature SETS share a cache
    return hashlib.sha1(
        " ".join(sorted(feats.split(":", 1)[1].split())).encode()
    ).hexdigest()[:10]


def _prune_stale_siblings(parent: str, keep: str) -> None:
    """Remove sibling fingerprint dirs not touched in STALE_CACHE_DAYS."""
    import shutil
    import time

    cutoff = time.time() - STALE_CACHE_DAYS * 86400.0
    try:
        names = os.listdir(parent)
    except OSError:
        return
    for name in names:
        full = os.path.join(parent, name)
        if name == keep or not os.path.isdir(full):
            continue
        try:
            newest = max((e.stat().st_mtime for e in os.scandir(full)),
                         default=os.stat(full).st_mtime)
            if newest < cutoff:
                shutil.rmtree(full, ignore_errors=True)
        except OSError:
            continue


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX at a persistent compilation cache (idempotent).

    This performs the process's FIRST backend use (`jax.default_backend()`),
    which blocks forever — no exception, no output — when the remote-TPU
    (axon) tunnel is down; the watchdog turns that into a stderr diagnosis
    with the JAX_PLATFORMS=cpu escape hatch. Every CLI entry point funnels
    through here, so they all inherit the protection.
    """
    import jax

    from iggcn_tpu.utils.platform import warn_if_backend_hangs

    if path is None:
        path = os.environ.get(
            "IGGCN_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "iggcn_tpu",
                         "jax_cache"))
    watchdog = warn_if_backend_hangs()
    try:
        backend = jax.default_backend()
    finally:
        watchdog.cancel()
    # separate caches per backend: entries written while attached to the
    # remote TPU (axon) embed that host's CPU feature flags and SIGILL-risk
    # when loaded by plain local-CPU runs
    path = os.path.join(path, backend)
    if backend == "cpu":
        # ...and per HOST CPU for the cpu backend: XLA:CPU AOT entries bake
        # the compile machine's feature set (avx512*, amx*), and this VM's
        # visible features change across sessions — loading a mismatched
        # entry logs cpu_aot_loader errors and risks SIGILL (observed live:
        # entries compiled with +amx-avx512 loaded on a host without it)
        fp = _host_cpu_fingerprint()
        _prune_stale_siblings(path, keep=fp)
        path = os.path.join(path, fp)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program regardless of compile time / size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
