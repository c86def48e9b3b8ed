"""Interpretability RECOVERY: the learned importances find planted signal.

The framework's headline capability is interpretable importance
probabilities — per-ROI `prob`, per-SNP `snps_prob`
(`kernel/sgcn_img_snp.py:88-97`), exported for downstream analysis
(`util/output.py:20-32`). Shape/export tests can't tell a working
interpreter from a random one, so this test trains the flagship on a
synthetic cohort where ONLY k known ROIs and k known SNPs carry the class
signal (`adni.synthetic_cohort(planted_rois=..., planted_snps=...)`) and
asserts the trained importances rank exactly those features on top — and
that `tools/explain.py` exports them from a saved checkpoint.

Planted SNPs are chosen as the GO-best-connected ones: a SNP with few
GO-term incidences has no signal path through the hierarchical encoder
(`go_network` gene lift), so its importance is structurally unreachable —
that is a property of the GO topology, not of the interpreter.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
from iggcn_tpu.data.adni import synthetic_cohort
from iggcn_tpu.data.batching import cohort_batch_arrays
from iggcn_tpu.models.fused_sgcn import FusedSGCN
from iggcn_tpu.train.steps import TrainState, make_optimizer, make_train_step

PLANTED_ROIS = [3, 11, 19, 26]
ROIS = 30
SUBJECTS = 64
STEPS = 700


@pytest.fixture(scope="module")
def trained(topo):
    """Train the flagship full-batch on the planted cohort; returns
    (params, planted_snps)."""
    conn = (topo.go_snps != 0).sum(axis=0)
    planted_snps = [int(i) for i in np.argsort(-conn)[:3]]

    cohort = synthetic_cohort(
        np.random.default_rng(7), num_subjects=SUBJECTS, rois=ROIS,
        planted_rois=PLANTED_ROIS, planted_snps=planted_snps,
        planted_strength=1.5)
    arrays = cohort_batch_arrays(cohort)
    arrays.pop("sbj_id")
    batch = {k: jnp.asarray(v) for k, v in arrays.items()}
    batch["w"] = jnp.ones((SUBJECTS,), jnp.float32)

    # classification + sparsity only: the terms that drive the importances
    # (lamda_ce * CE(plain) + lamda_mi * CE(masked) + loss_probability)
    lw = LossWeights(disease=1.0, regr=0.0, prob=0.5, reco=1.5e-6,
                     simi=0.0, orth=0.0)
    mcfg = ModelConfig(num_layers=2, hidden=8, rois=ROIS, hidden_linear=32,
                       dropout_lin=0.0, dropout_regr=0.0, dropout_go=0.0,
                       dropout_readout=0.0)
    tcfg = TrainConfig(epochs=STEPS, batch_size=SUBJECTS, lr=5e-3,
                       lr_decay_step_size=0, loss=lw)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), batch["x"],
                                    batch["adj"], batch["snps"])
    optimizer = make_optimizer(tcfg)
    step_fn = make_train_step(model, mcfg, tcfg, optimizer)

    @jax.jit
    def run(state, batch, rng):
        def body(carry, _):
            st, r = carry
            r, er = jax.random.split(r)
            st, loss_sum = step_fn(st, batch, er)
            return (st, r), loss_sum

        (state, _), losses = jax.lax.scan(body, (state, rng), None,
                                          length=STEPS)
        return state, losses

    state = TrainState.create(variables, optimizer, steps_per_epoch=1)
    state, losses = run(state, batch, jax.random.PRNGKey(2))
    # the model must actually have learned the classification task
    assert float(losses[-1]) / SUBJECTS < 0.3 * float(losses[0]) / SUBJECTS
    return jax.device_get(state.params), planted_snps


def test_roi_importance_recovers_planted_signal(trained):
    params, _ = trained
    imp = np.asarray(jax.nn.sigmoid(params["prob"])).mean(axis=1)
    top = set(np.argsort(-imp)[:len(PLANTED_ROIS)].tolist())
    assert top == set(PLANTED_ROIS), (
        f"top-{len(PLANTED_ROIS)} ROIs {sorted(top)} != planted "
        f"{PLANTED_ROIS}; importances {np.round(imp, 3)}")
    bg = np.delete(imp, PLANTED_ROIS)
    assert imp[PLANTED_ROIS].min() > 3 * np.median(bg), (
        "planted ROI importance does not separate from background")


def test_snp_importance_recovers_planted_signal(trained):
    params, planted_snps = trained
    imp = np.asarray(jax.nn.sigmoid(params["snps_prob"])).reshape(-1)
    top = set(np.argsort(-imp)[:len(planted_snps)].tolist())
    assert top == set(planted_snps), (
        f"top-{len(planted_snps)} SNPs {sorted(top)} != planted "
        f"{sorted(planted_snps)}; importances {np.round(imp, 3)}")
    bg = np.delete(imp, planted_snps)
    assert imp[planted_snps].min() > 3 * np.median(bg), (
        "planted SNP importance does not separate from background")


def test_explain_tool_exports_recovered_importances(trained, tmp_path):
    """The shipped explain CLI round-trips the trained importances: save a
    checkpoint, restore it template-free, export the npys, and confirm the
    exported ranking is the recovered one."""
    from iggcn_tpu.tools import explain
    from iggcn_tpu.train.checkpoint import save_checkpoint

    params, _ = trained
    ckpt = tmp_path / "gcn_state_dict_planted_fold_0.msgpack"
    save_checkpoint(str(ckpt), params, {})
    out_dir = tmp_path / "out"
    explain.main([str(ckpt), "--out", str(out_dir), "--prefix", "planted"])

    node = np.load(out_dir / "node_importance_planted.npy")
    assert node.shape == (ROIS, 3)
    imp = (1.0 / (1.0 + np.exp(-node))).mean(axis=1)
    assert set(np.argsort(-imp)[:len(PLANTED_ROIS)].tolist()) == \
        set(PLANTED_ROIS)
    snps = np.load(out_dir / "snps_importance_planted.npy")
    assert snps.shape == (1, 54)
    np.testing.assert_array_equal(snps, np.asarray(params["snps_prob"]))
