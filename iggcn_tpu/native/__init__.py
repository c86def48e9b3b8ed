"""Native (C++) runtime components.

Currently: `gdc_native` — batched PPR + top-k graph-diffusion preprocessing
(ctypes binding over libgdc_native.so, auto-built from gdc_native.cpp on
first import when g++ is available). Consumers import it defensively and
fall back to NumPy, so a missing compiler never breaks the framework.
"""
