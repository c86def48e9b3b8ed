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


def test_fingerprint_separates_tuning_identity_not_just_flags():
    """Observed live: two hosts with IDENTICAL cpuinfo flags, but one's XLA
    compile embedded +prefer-no-gather (gather-slowdown microcode
    mitigation) the other host rejected. microcode/bugs lines must
    therefore enter the fingerprint; flag ORDER must not."""
    from iggcn_tpu.utils.cache import _fingerprint_from_cpuinfo

    base = ("model name\t: Intel(R) Xeon(R) Processor @ 2.70GHz\n"
            "cpu family\t: 6\nmodel\t\t: 143\nstepping\t: 8\n"
            "microcode\t: 0x2b000571\nbugs\t\t: gds spectre_v1\n"
            "flags\t\t: fpu vme avx512f amx_tile\n")
    same_set_reordered = base.replace("fpu vme avx512f amx_tile",
                                      "amx_tile avx512f vme fpu")
    other_microcode = base.replace("0x2b000571", "0x2b0005c0")
    other_bugs = base.replace("gds spectre_v1", "spectre_v1")
    second_block_differs = base + "\nmodel name\t: other\n"
    assert _fingerprint_from_cpuinfo(base) == \
        _fingerprint_from_cpuinfo(same_set_reordered)
    assert _fingerprint_from_cpuinfo(base) != \
        _fingerprint_from_cpuinfo(other_microcode)
    assert _fingerprint_from_cpuinfo(base) != \
        _fingerprint_from_cpuinfo(other_bugs)
    # only the first CPU block counts (cores are identical)
    assert _fingerprint_from_cpuinfo(base) == \
        _fingerprint_from_cpuinfo(second_block_differs)
    # off-Linux fallback still yields a usable key
    assert 4 <= len(_fingerprint_from_cpuinfo("")) <= 16


def test_prune_removes_stale_dirs_and_loose_files(tmp_path):
    """Pre-fingerprint runs wrote entries directly into cpu/ (observed:
    ~2.5k stray files); stale strays and stale sibling dirs must both be
    pruned, while the active fingerprint dir and fresh entries survive."""
    import os
    import time

    from iggcn_tpu.utils.cache import STALE_CACHE_DAYS, _prune_stale_siblings

    old = time.time() - (STALE_CACHE_DAYS + 1) * 86400.0
    keep_dir = tmp_path / "active"
    keep_dir.mkdir()
    stale_dir = tmp_path / "stale_fp"
    stale_dir.mkdir()
    (stale_dir / "entry").write_bytes(b"x")
    os.utime(stale_dir / "entry", (old, old))
    os.utime(stale_dir, (old, old))
    stray_old = tmp_path / "jit_foo-deadbeef-cache"
    stray_old.write_bytes(b"x")
    os.utime(stray_old, (old, old))
    stray_fresh = tmp_path / "jit_bar-cafe-cache"
    stray_fresh.write_bytes(b"x")

    _prune_stale_siblings(str(tmp_path), keep="active")
    assert keep_dir.exists() and stray_fresh.exists()
    assert not stale_dir.exists() and not stray_old.exists()


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
