"""Parity tests for the native C++ GDC kernel (iggcn_tpu/native).

The native path must be numerically interchangeable with the NumPy
implementation of `preprocess_diffusion` (itself parity-tested against the
reference semantics of /root/reference/util_gdc.py:7-31,71-101).
"""
import numpy as np
import pytest

from iggcn_tpu.data import diffusion

gdc_native = pytest.importorskip(
    "iggcn_tpu.native.gdc_native",
    reason="native kernel unavailable (no compiler?)")


def _numpy_ref(adjs, alpha, k):
    out = np.empty_like(adjs, dtype=np.float64)
    for i in range(adjs.shape[0]):
        out[i] = diffusion.get_top_k_matrix(
            diffusion.get_ppr_matrix(adjs[i].astype(np.float64), alpha), k)
    return out


def test_native_matches_numpy():
    rng = np.random.default_rng(0)
    adjs = np.abs(rng.normal(size=(16, 90, 90))) + 0.1
    nat = gdc_native.ppr_topk_batch(adjs, 0.05, 3)
    ref = _numpy_ref(adjs, 0.05, 3)
    np.testing.assert_allclose(nat, ref, atol=1e-12)
    assert ((nat > 0) == (ref > 0)).all(), "sparsity patterns must match"


def test_native_column_structure():
    rng = np.random.default_rng(1)
    adjs = np.abs(rng.normal(size=(4, 30, 30))) + 0.1
    k = 5
    nat = gdc_native.ppr_topk_batch(adjs, 0.05, k)
    nnz = (nat > 0).sum(axis=1)            # per column
    assert (nnz == k).all()
    np.testing.assert_allclose(nat.sum(axis=1), 1.0, atol=1e-12)


def test_native_small_sizes_and_k_clamp():
    rng = np.random.default_rng(2)
    adjs = np.abs(rng.normal(size=(2, 5, 5))) + 0.1
    nat = gdc_native.ppr_topk_batch(adjs, 0.05, 99)   # k > n clamps to n
    ref = _numpy_ref(adjs, 0.05, 5)
    np.testing.assert_allclose(nat, ref, atol=1e-12)


def test_preprocess_diffusion_prefers_native():
    """`preprocess_diffusion` routes PPR+topk through the native kernel when
    present, and the result equals the forced-NumPy fallback."""
    rng = np.random.default_rng(3)
    adjs = np.abs(rng.normal(size=(6, 40, 40))) + 0.1
    via_dispatch = diffusion.preprocess_diffusion(adjs, top_k=3)
    saved = diffusion.gdc_native
    try:
        diffusion.gdc_native = None
        via_numpy = diffusion.preprocess_diffusion(adjs, top_k=3)
    finally:
        diffusion.gdc_native = saved
    np.testing.assert_allclose(via_dispatch, via_numpy, atol=1e-12)


def test_device_backend_matches_numpy():
    """backend='device' (one batched on-device solve) matches the host paths
    up to fp32 round-off on tie-free inputs, with the same per-column
    structure; non-PPR modes and bogus backends are rejected."""
    rng = np.random.default_rng(4)
    adjs = np.abs(rng.normal(size=(4, 30, 30))) + 0.1
    dev = diffusion.preprocess_diffusion(adjs, top_k=3, backend="device")
    ref = _numpy_ref(adjs, 0.05, 3)
    np.testing.assert_allclose(dev, ref, atol=2e-5)
    assert ((dev > 0) == (ref > 0)).all()
    np.testing.assert_allclose(dev.sum(axis=1), 1.0, atol=1e-5)
    with pytest.raises(ValueError):
        diffusion.preprocess_diffusion(adjs, is_topk=False, backend="device")
    with pytest.raises(ValueError):
        diffusion.preprocess_diffusion(adjs, backend="gpu")
