"""Explainability export: read a trained fold checkpoint, dump importances.

The reference saves per-fold `state_dict` checkpoints but has NO load path
anywhere (SURVEY §5 checkpoint row) — its downstream interpretability
analysis re-reads the separately dumped npys. This tool closes that gap: it
restores a `gcn_state_dict_*_fold_k.msgpack` (written by
`train/checkpoint.py:save_checkpoint`) template-free and exports the learned
importance probabilities in the reference's analysis units:

  * node importance  sigmoid-free raw `prob` (90, 3)  — as `util/output.py:24`
  * SNP importance   raw `snps_prob` (1, 54)          — as `:27`
  * edge scorer      raw `prob_bias` (2*D, 1)         — as `:30`
  * optionally, per-subject edge probabilities on provided data (the
    `cal_probability` edge scores, `kernel/sgcn_img_snp.py:139-145`)

Usage:
  python -m iggcn_tpu.tools.explain CKPT.msgpack --out DIR [--npz cohort.npz]
"""
from __future__ import annotations

import argparse
import os
from typing import Any, Dict, Optional

import numpy as np


def load_params(path: str) -> Dict[str, Any]:
    """Template-free restore of a checkpoint written by save_checkpoint."""
    from flax import serialization

    with open(path, "rb") as fh:
        payload = serialization.msgpack_restore(fh.read())
    return payload["params"]


def export_importances(params: Dict[str, Any], out_dir: str,
                       prefix: str = "ckpt") -> Dict[str, np.ndarray]:
    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for key, fname in (("prob", "node_importance"),
                       ("snps_prob", "snps_importance"),
                       ("prob_bias", "edge_prob_bias")):
        if key in params:
            arr = np.asarray(params[key])
            out[key] = arr
            np.save(os.path.join(out_dir, f"{fname}_{prefix}.npy"), arr)
    return out


def export_edge_probabilities(params: Dict[str, Any], x: np.ndarray,
                              out_dir: str, prefix: str = "ckpt"
                              ) -> np.ndarray:
    """Per-subject dense edge scores sigmoid([x_i||x_j] @ prob_bias)
    (parity `kernel/sgcn_img_snp.py:139-145`)."""
    import jax.numpy as jnp

    from iggcn_tpu.ops.masking import edge_probability_dense

    xm = jnp.asarray(x) * jnp.asarray(params["prob"])
    ep = np.asarray(edge_probability_dense(xm, jnp.asarray(params["prob_bias"])))
    np.save(os.path.join(out_dir, f"edge_probability_{prefix}.npy"), ep)
    return ep


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint")
    p.add_argument("--out", default="./explain_out")
    p.add_argument("--prefix", default="ckpt")
    p.add_argument("--x_npy", default=None,
                   help="optional (S, N, D) features npy for per-subject "
                        "edge probabilities")
    args = p.parse_args(argv)
    params = load_params(args.checkpoint)
    out = export_importances(params, args.out, args.prefix)
    print(f"exported {sorted(out)} to {args.out}")
    if args.x_npy is not None:
        ep = export_edge_probabilities(params, np.load(args.x_npy),
                                       args.out, args.prefix)
        print(f"edge probabilities {ep.shape} exported")


if __name__ == "__main__":
    main()
