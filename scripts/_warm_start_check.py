"""Sweep helper: the `--init_from_torch` warm-start loop, end to end.

Takes the serving bundle the sweep's `fused_bundle` route trained,
exports it as a reference-layout torch state_dict (the artifact a real
reference user actually holds, `kernel/train_eval_sgcn_img_snps.py:
184-185`), then drives `main.py --init_from_torch` with a MATCHING
configuration and asserts the run logged the warm start. Run by
`scripts/cli_breadth_sweep.sh` AFTER the bundle route (which trains with
the sweep's default --layers 2 --hiddens 5 on --disease_id 0).
"""
import glob
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

bundles = sorted(glob.glob(
    "results/ADNI_sw_bundle/serving_bundle_*_fold_0.npz"))
assert bundles, "no bundle from the fused_bundle route"

scratch = tempfile.mkdtemp(prefix="iggcn_warmstart_")
ref_sd = os.path.join(scratch, "gcn_state_dict_sweep.pt")
rc = subprocess.run([sys.executable, "-m", "iggcn_tpu.tools.import_torch",
                     "--reverse", "--ckpt", bundles[0], "--out",
                     ref_sd]).returncode
assert rc == 0, "reverse export failed"

rc = subprocess.run(
    [sys.executable, "main.py", "--synthetic", "--synthetic_subjects", "48",
     "--epochs", "2", "--fold", "3", "--batch_size", "8", "--no-search",
     "--disease_id", "0", "--init_from_torch", ref_sd,
     "--save_appendix", "_sw_ws"]).returncode
assert rc == 0, "warm-start experiment failed"

log = open("results/ADNI_sw_ws/log.txt").read()
assert "warm-starting every fold" in log, "warm start not logged"
print("warm-start loop ok (reference state_dict -> --init_from_torch run)")
