"""Sweep helper: the real-data deployment loop, end to end.

Fabricates a reference-layout .mat dir (90 ROIs, matching the bundle the
sweep's `fused_bundle` route trained on synthetic 90-ROI data), exports it
with `iggcn-export-cohort`, and scores it against that bundle with
`iggcn-serve`. Run by `scripts/cli_breadth_sweep.sh` AFTER the bundle
route.
"""
import glob
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.test_real_loaders import _write_mat_cohort  # noqa: E402

base = "/tmp/sweep_realdata/"
os.makedirs(base, exist_ok=True)
_write_mat_cohort(base, np.random.default_rng(0), s=12, n=90, d=3)
rc = subprocess.run([sys.executable, "-m", "iggcn_tpu.tools.export_cohort",
                     "--data_path", base, "--disease_id", "0",
                     "--out", "/tmp/sweep_cohort.npz"]).returncode
assert rc == 0, "export failed"
bundles = sorted(glob.glob(
    "results/ADNI_sw_bundle/serving_bundle_*_fold_0.npz"))
assert bundles, "no bundle from the fused_bundle route"
rc = subprocess.run([sys.executable, "-m", "iggcn_tpu.tools.serve",
                     bundles[0], "--npz", "/tmp/sweep_cohort.npz",
                     "--out", "/tmp/sweep_preds.npz",
                     "--batch", "8"]).returncode
assert rc == 0, "serve failed"
with np.load("/tmp/sweep_preds.npz") as zf:
    assert zf["pred"].shape[0] == 12
print("export->serve loop ok")
