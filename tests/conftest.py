"""Test environment: force CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY §4)."""
import os

# force CPU: the image presets JAX_PLATFORMS=axon (remote TPU tunnel), which
# would run tests over the wire with TPU default matmul precision (bf16-ish).
# Plugins may import jax before this conftest, so set the config too — env
# alone is ignored once jax has read it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: the suite is compile-bound (~17 min cold);
# repeat runs hit the disk cache instead
from iggcn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# test-sensitivity audit hook: when IGGCN_MUTATION names a known plausible
# misimplementation, apply it BEFORE any test module imports framework
# symbols — scripts/mutation_audit.py then asserts the pinned test FAILS
_mutation = os.environ.get("IGGCN_MUTATION")
if _mutation:
    from tests.mutations import apply_mutation  # noqa: E402

    apply_mutation(_mutation)

from iggcn_tpu.data.adni import synthetic_cohort  # noqa: E402
from iggcn_tpu.data.go_graph import synthetic_topology  # noqa: E402


def device_batch(cohort, n=8):
    """First-n-subject device batch dict in the train-step schema, built from
    the canonical `data.batching.cohort_batch_arrays` (one source of truth
    for the batch keys instead of per-test hand-built dicts)."""
    import jax.numpy as jnp

    from iggcn_tpu.data.batching import cohort_batch_arrays

    arrays = cohort_batch_arrays(cohort)
    arrays.pop("sbj_id")                    # not consumed by train steps
    out = {k: jnp.asarray(v[:n]) for k, v in arrays.items()}
    out["w"] = jnp.ones((n,), jnp.float32)
    return out


@pytest.fixture(scope="session")
def topo():
    return synthetic_topology(np.random.default_rng(0))


@pytest.fixture(scope="session")
def cohort():
    return synthetic_cohort(np.random.default_rng(1), num_subjects=48)
