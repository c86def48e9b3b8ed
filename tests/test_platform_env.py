"""The documented `JAX_PLATFORMS=cpu` drives must actually pin the platform.

This image's remote-TPU (axon) plugin prepends itself to the jax_platforms
config at import (`JAX_PLATFORMS=cpu` alone resolves to 'axon,cpu'), so a
user-pinned CPU run still initializes the tunnel backend — and hangs when
the tunnel is down. `honor_platform_env` (called by main.py, bench.py,
__graft_entry__, and the tool CLIs) re-asserts the env choice the way
tests/conftest.py does.
"""
import jax

from iggcn_tpu.utils.platform import honor_platform_env


def test_reasserts_env_value(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert honor_platform_env() == "cpu"
    assert jax.config.jax_platforms == "cpu"


def test_noop_when_unset(monkeypatch):
    before = jax.config.jax_platforms
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert honor_platform_env() is None
    assert jax.config.jax_platforms == before


def test_noop_when_blank(monkeypatch):
    before = jax.config.jax_platforms
    monkeypatch.setenv("JAX_PLATFORMS", "  ")
    assert honor_platform_env() is None
    assert jax.config.jax_platforms == before


def test_backend_watchdog_fires_and_cancels():
    import io
    import sys
    import time

    from iggcn_tpu.utils.platform import warn_if_backend_hangs

    cap = io.StringIO()
    real = sys.stderr
    sys.stderr = cap
    try:
        t = warn_if_backend_hangs(timeout_s=0.05)
        time.sleep(0.3)
        t.cancel()
        fired = cap.getvalue()
        # the normal path: cancelled BEFORE its timeout elapses — the sleep
        # is longer than the timeout so a broken cancel() would make this
        # leg print a second warning. 0.5 s (not 0.05) keeps the arm->cancel
        # gap comfortably inside the timeout on a loaded host.
        t2 = warn_if_backend_hangs(timeout_s=0.5)
        t2.cancel()
        time.sleep(1.0)
        quiet = cap.getvalue()
    finally:
        sys.stderr = real
    assert "JAX_PLATFORMS=cpu" in fired
    assert quiet == fired    # cancelled watchdog stays silent
