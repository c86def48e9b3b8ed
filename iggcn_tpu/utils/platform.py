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
