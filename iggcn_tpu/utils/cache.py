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
    """Short stable hash of this host's CPU identity (see the SIGILL note
    at the call site). Hashes the first /proc/cpuinfo block's feature set
    ('flags' on x86, 'Features' on ARM) PLUS its identity lines (model
    name, family/model/stepping, microcode, bugs): XLA:CPU derives LLVM
    features from more than the flag set — microcode-dependent tuning like
    the gather-slowdown (GDS) mitigation shows up in `microcode`/`bugs`,
    not `flags`. Off-Linux falls back to the platform tuple (no feature
    granularity, but distinct machine kinds stay distinct).

    Note: cpu_aot_loader warnings about `+prefer-no-scatter` /
    `+prefer-no-gather` are NOT cross-host drift — XLA embeds those LLVM
    tuning *preferences* at compile time and its loader compares them
    against the host's raw ISA list, which never contains pseudo-features,
    so the warning fires even when loading an entry compiled seconds
    earlier on the same machine (observed live). Benign log noise; the
    fingerprint guards the real ISA mismatches (e.g. amx-avx512)."""
    try:
        with open("/proc/cpuinfo") as fh:
            text = fh.read()
    except OSError:
        text = ""
    return _fingerprint_from_cpuinfo(text)


def _fingerprint_from_cpuinfo(text: str) -> str:
    import hashlib

    _IDENT = ("flags", "Features", "model name", "cpu family", "model",
              "stepping", "microcode", "bugs")
    parts = []
    for line in text.splitlines():
        if not line.strip():
            break   # first CPU block only (all cores identical)
        key, _, val = line.partition(":")
        key = key.strip()
        if key in _IDENT:
            if key in ("flags", "Features", "bugs"):
                # set order is kernel-stable within a boot but not
                # across kernels; sort so equal SETS share a cache
                val = " ".join(sorted(val.split()))
            parts.append(f"{key}:{val.strip()}")
    if not parts:
        import platform

        parts = [f"{platform.machine()} {platform.processor()}"]
    return hashlib.sha1("\n".join(sorted(parts)).encode()).hexdigest()[:10]


def _prune_stale_siblings(parent: str, keep: str) -> None:
    """Remove sibling fingerprint dirs not touched in STALE_CACHE_DAYS —
    and stale loose cache FILES sitting directly in `parent` (strays from
    before per-host keying pointed the cache at `parent` itself; they are
    never read again once the cache dir is `parent/<fingerprint>`)."""
    import shutil
    import time

    cutoff = time.time() - STALE_CACHE_DAYS * 86400.0
    try:
        names = os.listdir(parent)
    except OSError:
        return
    for name in names:
        full = os.path.join(parent, name)
        if name == keep:
            continue
        try:
            if not os.path.isdir(full):
                if os.stat(full).st_mtime < cutoff:
                    os.unlink(full)
                continue
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
