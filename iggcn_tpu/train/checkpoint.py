"""Checkpoint save/load (flax msgpack serialization).

The reference saves best-val `state_dict` per fold
(`kernel/train_eval_sgcn_img_snps.py:176-185`) but ships no load path; here
both directions exist so post-hoc explainability tooling can restore models
(SURVEY §5 checkpoint note).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
from flax import serialization


def save_checkpoint(path: str, params: Any, batch_stats: Any) -> None:
    payload = {"params": jax.device_get(params),
               "batch_stats": jax.device_get(batch_stats)}
    data = serialization.to_bytes(payload)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(data)


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure of `template` ({'params':..., 'batch_stats':...})."""
    with open(path, "rb") as fh:
        return serialization.from_bytes(template, fh.read())
