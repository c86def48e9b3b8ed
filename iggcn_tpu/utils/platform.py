"""Honor an explicit ``JAX_PLATFORMS`` env var on plugin-prepending images.

This image's remote-TPU (axon) jax plugin mutates the ``jax_platforms``
config at jax import time: ``JAX_PLATFORMS=cpu python main.py`` still
resolves to ``jax_platforms='axon,cpu'`` (measured), so the tunnel backend
initializes first anyway — and a run the user explicitly pinned to CPU
blocks forever whenever the tunnel is down. Re-asserting the env choice via
``jax.config.update`` before the first backend use restores the documented
env-var semantics (it is exactly what tests/conftest.py already does).
"""
from __future__ import annotations

import os


def honor_platform_env() -> str | None:
    """Re-assert ``JAX_PLATFORMS`` from the environment, if set.

    Must run before anything initializes a jax backend (``jax.devices()``,
    ``jax.default_backend()``, any eager op). Returns the platform list that
    was applied, or None when the env var is unset (plugin default order —
    TPU first — is kept).
    """
    want = os.environ.get("JAX_PLATFORMS", "").strip()
    if not want:
        return None
    import jax

    jax.config.update("jax_platforms", want)
    return want


def warn_if_backend_hangs(timeout_s: float = 120.0):
    """Arm a one-shot watchdog for jax backend initialization.

    The axon tunnel blocks INDEFINITELY inside backend init when it is
    down — no exception, no timeout, nothing on stderr. This cannot be
    detected in-thread (the hang is inside a C extension call), so arm a
    timer BEFORE the first backend use and cancel it after: if init is
    still stuck when the timer fires, the user gets a diagnosis and the
    escape hatch instead of a silent forever-hang. Returns the started
    `threading.Timer`; call `.cancel()` once a backend call returns.
    """
    import sys
    import threading

    def _warn():
        print(
            f"[iggcn] jax backend init has not returned after "
            f"{timeout_s:.0f}s — if this is the remote-TPU (axon) tunnel, "
            "it is likely DOWN (init blocks forever, it does not error). "
            "Ctrl-C and rerun with JAX_PLATFORMS=cpu to run on the host "
            "CPU instead.", file=sys.stderr)

    timer = threading.Timer(timeout_s, _warn)
    timer.daemon = True
    timer.start()
    return timer


def probe_backend(timeout_s: float = 180.0):
    """Return an error string when the default jax backend is unreachable.

    The axon tunnel blocks INDEFINITELY inside backend init when it is down
    (observed live: even ``jax.devices()`` never returns), which would eat
    the caller's whole time budget with zero output. Probing in a killable
    subprocess turns that hang into a bounded, loud failure. Returns None
    when the backend answers. Used by bench.py and the driver entry points
    before committing to in-process backend init.
    """
    import subprocess
    import sys

    code = (
        "import os, jax\n"
        "p = os.environ.get('JAX_PLATFORMS', '').strip()\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "print(jax.devices()[0].platform)\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return (f"jax backend init did not respond within {timeout_s:.0f}s "
                "(TPU tunnel down?)")
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-3:]
        return "jax backend init failed: " + (" | ".join(tail) or
                                              f"rc={r.returncode}")
    return None


def probe_backend_with_retries(log=None, deadline_s=None):
    """Bounded retry around `probe_backend`: the axon tunnel has been
    observed down for minutes at a time (and fully dead for hours) — if a
    round-end artifact run (bench.py, the driver's entry() compile check)
    lands in a transient outage, one failed probe would forfeit it. Retry
    on a short probe timeout for ~15 min total, then give up loudly.
    Returns None when reachable, else the last error string.
    `deadline_s` hard-caps the TOTAL probe window (first probe included) —
    a caller with its own wall-clock budget (bench.py) must not let the
    retry ladder alone consume it.
    Knobs: IGGCN_BENCH_PROBE_RETRIES (0 disables retrying),
    IGGCN_BENCH_PROBE_RETRY_SLEEP_S."""
    import sys
    import time

    if log is None:
        log = lambda msg: print(msg, file=sys.stderr)  # noqa: E731
    t0 = time.monotonic()
    remaining = (lambda: float("inf")) if deadline_s is None else (
        lambda: deadline_s - (time.monotonic() - t0))
    err = probe_backend(timeout_s=min(180.0, max(10.0, remaining() * 0.5)))
    if err is None:
        return None
    retries = int(os.environ.get("IGGCN_BENCH_PROBE_RETRIES", "6"))
    sleep_s = float(os.environ.get("IGGCN_BENCH_PROBE_RETRY_SLEEP_S", "60"))
    for attempt in range(1, retries + 1):
        if remaining() < sleep_s + 15.0:
            log(f"[iggcn] backend unreachable ({err}); probe deadline "
                f"{deadline_s:.0f}s reached, giving up")
            return err
        log(f"[iggcn] backend unreachable ({err}); retry "
            f"{attempt}/{retries} in {sleep_s:.0f}s")
        time.sleep(sleep_s)
        err = probe_backend(timeout_s=min(60.0, max(10.0, remaining())))
        if err is None:
            return None
    return err
