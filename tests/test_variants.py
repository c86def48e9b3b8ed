"""Variant models: GUIDE, cluster-label, GAT-fused, image-only SGCN —
forward shapes + one objective/grad step each."""
import jax
import jax.numpy as jnp
import numpy as np

from iggcn_tpu.config import ModelConfig, TrainConfig
from iggcn_tpu.models.clusterlabel import ClusterLabelSGCN
from iggcn_tpu.models.fused_sgcn import FusedSGCN
from iggcn_tpu.models.guide import GuideImgSnp
from iggcn_tpu.models.sgcn_image import SGCNImage, SGCNOri
from iggcn_tpu.train.steps import (clusterlabel_objective, guide_objective,
                                   gcn_fusion_objective)


from tests.conftest import device_batch as _batch  # shared batch schema


def _grad_check(model, objective, batch, mcfg, tcfg, rngs=("dropout",)):
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["x"], batch["adj"], batch["snps"])

    def loss_fn(p):
        loss, aux = objective(model, p, variables["batch_stats"], batch,
                              mcfg, tcfg, train=True,
                              rng=jax.random.PRNGKey(1))
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    return variables


def test_guide_model(topo, cohort):
    mcfg = ModelConfig(num_layers=2, hidden=16)
    tcfg = TrainConfig()
    model = GuideImgSnp(cfg=mcfg, topo=topo)
    batch = _batch(cohort)
    variables = _grad_check(model, guide_objective, batch, mcfg, tcfg)
    out = jax.jit(model.apply)(variables, batch["x"], batch["adj"],
                               batch["snps"])
    assert out.log_probs.shape == (8, 2)
    assert out.surrogate_img.shape == out.surrogate_recon.shape == (8, 270)
    assert out.imp_prob.shape == (270,)
    assert float(out.imp_prob.min()) >= 0 and float(out.imp_prob.max()) <= 1


def test_clusterlabel_model(topo, cohort):
    mcfg = ModelConfig(num_layers=2, hidden=16, num_cluster=2)
    tcfg = TrainConfig()
    model = ClusterLabelSGCN(cfg=mcfg, topo=topo)
    batch = _batch(cohort)
    variables = _grad_check(model, clusterlabel_objective, batch, mcfg, tcfg)
    out = jax.jit(model.apply)(variables, batch["x"], batch["adj"],
                               batch["snps"])
    assert out.log_probs.shape == (8, 2)
    assert out.log_probs_cluster.shape == (8, 2)


def test_gat_fused_model(topo, cohort):
    mcfg = ModelConfig(num_layers=2, hidden=8, use_gat=True)
    tcfg = TrainConfig()
    model = FusedSGCN(cfg=mcfg, topo=topo)
    batch = _batch(cohort, n=4)
    _grad_check(model, gcn_fusion_objective, batch, mcfg, tcfg)


def test_model4eachregr(topo, cohort):
    mcfg = ModelConfig(num_layers=2, hidden=8, model4eachregr=True,
                       num_regr=3)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    batch = _batch(cohort, n=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["x"],
                                    batch["adj"], batch["snps"])
    out = jax.jit(model.apply)(variables, batch["x"], batch["adj"],
                               batch["snps"])
    assert out.our_reg.shape == (4, 3)


def test_sgcn_image_models(cohort):
    x = jnp.asarray(cohort.x[:4])
    adj = jnp.asarray(cohort.adj[:4])
    for model in [SGCNImage(num_layers=2, hidden=8),
                  SGCNImage(num_layers=2, hidden=8, use_gat=True),
                  SGCNOri(h0=3, h1=16, h3=5)]:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, adj)
        apply = jax.jit(model.apply, static_argnames=("is_explain",))
        out = apply(variables, x, adj)
        assert out.shape == (4, 2)
        out_m = apply(variables, x, adj, is_explain=True)
        assert np.isfinite(np.asarray(out_m)).all()


def test_no_cross_attention_path(cohort, topo):
    """isCrossAtten=False is broken upstream (shape mismatch at
    `sgcn_img_snp.py:243,287` and unreachable from its CLI); rebuilt as
    concat fusion — must run and produce finite outputs."""
    cfg = ModelConfig(num_layers=2, hidden=8, hidden_linear=16, l_dim=8,
                      is_cross_atten=False)
    model = FusedSGCN(cfg=cfg, topo=topo)
    x = jnp.asarray(cohort.x[:4])
    adj = jnp.asarray(cohort.adj[:4])
    snps = jnp.asarray(cohort.snps[:4])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, adj, snps)
    out = model.apply(variables, x, adj, snps)
    assert out.log_probs.shape == (4, 2)
    assert np.isfinite(np.asarray(out.log_probs)).all()
    out_m = model.apply(variables, x, adj, snps, is_explain=True)
    assert np.isfinite(np.asarray(out_m.log_probs)).all()


def test_guide_and_clusterlabel_cv(topo, tmp_path):
    """End-to-end cross_validation for the guide and cluster-label model
    kinds (CLI-path integration; the fused kind is covered by
    test_cv_fold_scan). The guide run also pins its per-fold
    interpretability export: mask_importance_*_fold_k.npy (d, 2) Gumbel
    mask logits — the reference's version is dead code — and that
    `iggcn-report --importance` aggregates them in keep-prob units."""
    import glob
    import os

    import numpy as np

    from iggcn_tpu.data.adni import synthetic_cohort
    from iggcn_tpu.tools.report import importance_stability
    from iggcn_tpu.train.cv import cross_validation

    cohort = synthetic_cohort(np.random.default_rng(11), num_subjects=24)
    mcfg = ModelConfig(num_layers=2, hidden=4, hidden_linear=8, l_dim=8)
    tcfg = TrainConfig(epochs=1, batch_size=8, folds=3, seed=2)
    for kind in ("guide_imgsnp", "clusterlabel"):
        res_dir = str(tmp_path / kind)
        res = cross_validation(cohort, topo, mcfg, tcfg, res_dir=res_dir,
                               model_kind=kind, verbose=False)
        assert np.isfinite(res.mean_test_loss), kind
        assert res.score_result.shape == (3, 1, 5)

    masks = sorted(glob.glob(os.path.join(
        str(tmp_path / "guide_imgsnp"), "mask_importance_*_fold_*.npy")))
    assert len(masks) == 3, masks
    logits = np.load(masks[0])
    assert logits.ndim == 2 and logits.shape[1] == 2
    rows = importance_stability([str(tmp_path / "guide_imgsnp")], top_k=4)
    mask_rows = [r for r in rows if r["kind"] == "mask"]
    assert len(mask_rows) == 4
    assert all(r["unit"] == "fold" and r["n_units"] == 3 for r in mask_rows)
    assert all(0.0 < r["mean_importance"] < 1.0 for r in mask_rows)
    assert mask_rows[0]["feature"].startswith("feature ")
    # cluster-label is SGCN-based: it exports node/snps importances and
    # must NOT pick up the guide-only mask export
    cl = str(tmp_path / "clusterlabel")
    assert glob.glob(os.path.join(cl, "node_importance_*"))
    assert not glob.glob(os.path.join(cl, "mask_importance_*"))
