"""ctypes binding for the native batched PPR+top-k kernel.

Importing this module loads (building on first use if a compiler is present)
``libgdc_native.so`` next to this file and exposes ``ppr_topk_batch``.  Any
failure raises ImportError so `data.diffusion` falls back to NumPy.  Set
``IGGCN_NO_NATIVE=1`` to force the fallback.

pybind11 is not available in this image, hence a plain ``extern "C"`` shared
library + ctypes rather than a CPython extension module.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gdc_native.cpp")
_LIB = os.path.join(_DIR, "libgdc_native.so")

if os.environ.get("IGGCN_NO_NATIVE"):
    raise ImportError("native path disabled via IGGCN_NO_NATIVE")


def _build() -> None:
    # pid-unique temp output: concurrent first importers (parallel test
    # workers / jobs) each compile privately; only the install is shared
    # and os.replace makes that atomic
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


try:
    _stale = (not os.path.exists(_LIB)
              or (os.path.exists(_SRC)
                  and os.path.getmtime(_LIB) < os.path.getmtime(_SRC)))
except OSError as exc:  # racing deletes etc. -> NumPy fallback
    raise ImportError(f"could not stat gdc_native artifacts: {exc}") from exc
if _stale:
    if not os.path.exists(_SRC):
        raise ImportError(f"gdc_native source missing: {_SRC}")
    try:
        _build()
    except Exception as exc:  # no compiler / failed build -> NumPy fallback
        raise ImportError(f"could not build gdc_native: {exc}") from exc

_lib = ctypes.CDLL(_LIB)
_lib.ppr_topk_batch.restype = ctypes.c_int
_lib.ppr_topk_batch.argtypes = [
    ctypes.POINTER(ctypes.c_double), ctypes.c_longlong, ctypes.c_longlong,
    ctypes.c_double, ctypes.c_longlong, ctypes.POINTER(ctypes.c_double),
]


def ppr_topk_batch(adjs: np.ndarray, alpha: float, top_k: int) -> np.ndarray:
    """PPR + column top-k + column-normalize over a (B, N, N) float64 stack.

    Bit-comparable to the NumPy path in `data.diffusion` (same inverse up to
    LU round-off, identical stable-argsort tie handling).
    """
    adjs = np.ascontiguousarray(adjs, dtype=np.float64)
    if adjs.ndim != 3 or adjs.shape[-1] != adjs.shape[-2]:
        raise ValueError(f"expected (B, N, N), got {adjs.shape}")
    b, n = adjs.shape[0], adjs.shape[1]
    out = np.empty_like(adjs)
    rc = _lib.ppr_topk_batch(
        adjs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), b, n,
        float(alpha), int(top_k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError(f"gdc_native.ppr_topk_batch failed (rc={rc})")
    return out
