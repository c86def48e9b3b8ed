"""Sweep helper: the checkpoint-interop loop, end to end.

Takes the serving bundle the sweep's `fused_bundle` route trained
(synthetic cohort, default --seed 1000), exports it as a reference-layout
torch state_dict (`iggcn-import-torch --reverse`), imports that state_dict
back into a fresh bundle (topology rebuilt from the SAME seed — a genuine
cross-check that the sparse value orderings line up with a reconstructed
topology, not the bundle's own), and asserts the two bundles score an
input identically. Run by `scripts/cli_breadth_sweep.sh` AFTER the bundle
route.
"""
import glob
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

bundles = sorted(glob.glob(
    "results/ADNI_sw_bundle/serving_bundle_*_fold_0.npz"))
assert bundles, "no bundle from the fused_bundle route"


def run(*argv):
    rc = subprocess.run([sys.executable, "-m", "iggcn_tpu.tools.import_torch",
                         *argv]).returncode
    assert rc == 0, f"import_torch {argv[0]} failed"


# a private scratch dir: fixed predictable /tmp names collide between
# concurrent sweep runs and are symlink-attackable in shared /tmp
scratch = tempfile.mkdtemp(prefix="iggcn_interop_")
ref_sd = os.path.join(scratch, "sweep_ref_sd.pt")
imported = os.path.join(scratch, "sweep_imported.npz")
run("--reverse", "--ckpt", bundles[0], "--out", ref_sd)
run("--ckpt", ref_sd, "--out", imported, "--synthetic_topo_seed", "1000")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))
import jax.numpy as jnp  # noqa: E402

from iggcn_tpu.tools.serve import load_bundle  # noqa: E402

m_a, p_a, s_a = load_bundle(bundles[0])
m_b, p_b, s_b = load_bundle(imported)
assert m_a.cfg == m_b.cfg, (m_a.cfg, m_b.cfg)
rng = np.random.default_rng(5)
x = jnp.asarray(rng.normal(size=(4, m_a.cfg.rois, m_a.cfg.feat_dim)),
                jnp.float32)
adj = jnp.asarray(np.abs(rng.normal(size=(4, m_a.cfg.rois, m_a.cfg.rois))),
                  jnp.float32)
snps = jnp.asarray(rng.normal(size=(4, m_a.cfg.num_snps)), jnp.float32)
out_a = m_a.apply({"params": p_a, "batch_stats": s_a}, x, adj, snps)
out_b = m_b.apply({"params": p_b, "batch_stats": s_b}, x, adj, snps)
np.testing.assert_array_equal(np.asarray(out_a[0]), np.asarray(out_b[0]))
print("checkpoint-interop loop ok (trained bundle == reverse->import bundle)")
