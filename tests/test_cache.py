"""Persistent-compile-cache path hygiene.

XLA:CPU AOT cache entries bake the compile machine's feature set; loading
an entry from a different host logs cpu_aot_loader errors and risks
SIGILL (observed live on this VM, whose visible CPU features change
across sessions). The cache dir is therefore keyed per backend AND, on
cpu, per host-CPU-feature fingerprint.
"""
import jax

from iggcn_tpu.utils.cache import _host_cpu_fingerprint, enable_compilation_cache


def test_fingerprint_is_stable_and_short():
    a, b = _host_cpu_fingerprint(), _host_cpu_fingerprint()
    assert a == b and 4 <= len(a) <= 16


def test_cache_path_keys_backend_and_host(tmp_path):
    before = jax.config.jax_compilation_cache_dir
    try:
        p1 = enable_compilation_cache(str(tmp_path))
        p2 = enable_compilation_cache(str(tmp_path))
        assert p1 == p2
        assert jax.default_backend() in p1
        assert _host_cpu_fingerprint() in p1      # cpu backend under pytest
        assert jax.config.jax_compilation_cache_dir == p1
    finally:
        # the suite leans on the session-wide warm cache (conftest) — put
        # it back or every test after this one compiles cold into tmp_path
        jax.config.update("jax_compilation_cache_dir", before)
