"""Serving-path tests: checkpoint -> batched_forward, padding, bf16.

The reference has no inference path (checkpoints are saved, never loaded —
SURVEY §5); these pin the deploy story the TPU framework adds on top.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def served():
    from iggcn_tpu.config import ModelConfig
    from iggcn_tpu.data.adni import synthetic_cohort
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.fused_sgcn import FusedSGCN

    rng = np.random.default_rng(0)
    topo = synthetic_topology(rng)
    cohort = synthetic_cohort(rng, num_subjects=22)
    mcfg = ModelConfig(num_layers=2, hidden=8)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((4, mcfg.rois, mcfg.feat_dim)),
        jnp.zeros((4, mcfg.rois, mcfg.rois)),
        jnp.zeros((4, mcfg.num_snps)))
    return model, variables, cohort


def test_batched_forward_matches_direct_eval_and_trims_padding(served,
                                                               tmp_path):
    from iggcn_tpu.predict import batched_forward
    from iggcn_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    model, variables, cohort = served
    # round-trip through the on-disk serving artifact
    path = str(tmp_path / "fold.msgpack")
    save_checkpoint(path, variables["params"], variables["batch_stats"])
    restored = load_checkpoint(path, {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables["batch_stats"])})

    # 22 subjects, batch 8 -> 3 batches with 2 padding rows to trim
    out = batched_forward(model, restored["params"], restored["batch_stats"],
                          cohort.x.astype(np.float32),
                          cohort.adj.astype(np.float32),
                          cohort.snps.astype(np.float32), batch_size=8)
    assert out["log_probs"].shape[0] == 22
    assert out["pred"].shape == (22,)

    direct = model.apply(variables, jnp.asarray(cohort.x, jnp.float32),
                         jnp.asarray(cohort.adj, jnp.float32),
                         jnp.asarray(cohort.snps, jnp.float32), train=False)
    np.testing.assert_allclose(out["log_probs"],
                               np.asarray(direct.log_probs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out["our_reg"], np.asarray(direct.our_reg),
                               rtol=1e-5, atol=1e-5)


def test_bf16_serving_agrees_with_fp32(served):
    from iggcn_tpu.predict import batched_forward, make_forward_scan

    model, variables, cohort = served
    args = (model, variables["params"], variables["batch_stats"],
            cohort.x.astype(np.float32), cohort.adj.astype(np.float32),
            cohort.snps.astype(np.float32))
    fp32 = batched_forward(*args, batch_size=8)
    scan = make_forward_scan(model)   # reuse across calls, no retrace
    bf16 = batched_forward(*args, batch_size=8, dtype=jnp.bfloat16,
                           forward_scan=scan)
    # outputs come back as fp32 host arrays regardless of compute dtype
    assert bf16["log_probs"].dtype == np.float32
    # prediction agreement and loose logit tolerance (bf16 has ~3 decimal
    # digits; the untrained head's logits are O(1))
    agree = np.mean(bf16["pred"] == fp32["pred"])
    assert agree >= 0.9, f"bf16/fp32 prediction agreement {agree}"
    np.testing.assert_allclose(bf16["log_probs"], fp32["log_probs"],
                               atol=0.15)


def test_cast_floating_leaves_ints_alone():
    from iggcn_tpu.predict import cast_floating

    tree = {"w": jnp.ones((2, 2)), "step": jnp.asarray(3, jnp.int32)}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["step"].dtype == jnp.int32


def test_mesh_data_parallel_serving_matches_single_device(served):
    from iggcn_tpu.predict import batched_forward
    from jax.sharding import Mesh

    model, variables, cohort = served
    args = (model, variables["params"], variables["batch_stats"],
            cohort.x.astype(np.float32), cohort.adj.astype(np.float32),
            cohort.snps.astype(np.float32))
    single = batched_forward(*args, batch_size=8)
    mesh = Mesh(np.array(jax.devices()[:4]), ("serve",))
    dp = batched_forward(*args, batch_size=8, mesh=mesh)
    np.testing.assert_allclose(dp["log_probs"], single["log_probs"],
                               rtol=1e-5, atol=1e-5)
    # batch 6 does not divide the 4-device axis: rounded up internally
    dp6 = batched_forward(*args, batch_size=6, mesh=mesh)
    np.testing.assert_allclose(dp6["log_probs"], single["log_probs"],
                               rtol=1e-5, atol=1e-5)


def test_bundle_roundtrip_and_cli(served, tmp_path):
    from iggcn_tpu.predict import batched_forward
    from iggcn_tpu.tools.serve import load_bundle, main, save_bundle

    model, variables, cohort = served
    bundle = str(tmp_path / "deploy.npz")
    save_bundle(bundle, model, variables["params"], variables["batch_stats"])

    model2, params2, stats2 = load_bundle(bundle)
    assert model2.cfg == model.cfg
    assert model2.topo.n == model.topo.n

    want = batched_forward(model, variables["params"],
                           variables["batch_stats"],
                           cohort.x.astype(np.float32),
                           cohort.adj.astype(np.float32),
                           cohort.snps.astype(np.float32), batch_size=8)
    got = batched_forward(model2, params2, stats2,
                          cohort.x.astype(np.float32),
                          cohort.adj.astype(np.float32),
                          cohort.snps.astype(np.float32), batch_size=8)
    np.testing.assert_allclose(got["log_probs"], want["log_probs"],
                               rtol=1e-6, atol=1e-6)

    # CLI end-to-end on the bundle
    cohort_npz = str(tmp_path / "cohort.npz")
    np.savez(cohort_npz, x=cohort.x, adj=cohort.adj, snps=cohort.snps)
    preds_npz = str(tmp_path / "preds.npz")
    main([bundle, "--npz", cohort_npz, "--out", preds_npz, "--batch", "8"])
    with np.load(preds_npz) as zf:
        np.testing.assert_allclose(zf["log_probs"], want["log_probs"],
                                   rtol=1e-5, atol=1e-5)
        assert zf["pred"].shape == (22,)


def test_explain_tool_reads_serving_bundles(served, tmp_path):
    """Interpretability on a deployment host: the explain CLI accepts a
    serving bundle in place of a training checkpoint and exports the same
    importance npys."""
    from iggcn_tpu.tools import explain
    from iggcn_tpu.tools.serve import save_bundle

    model, variables, _ = served
    bundle = str(tmp_path / "b.npz")
    save_bundle(bundle, model, variables["params"], variables["batch_stats"])
    out_dir = tmp_path / "ex"
    explain.main([bundle, "--out", str(out_dir), "--prefix", "f0"])
    got = np.load(out_dir / "node_importance_f0.npy")
    np.testing.assert_array_equal(
        got, np.asarray(jax.device_get(variables["params"]["prob"])))
    assert (out_dir / "snps_importance_f0.npy").exists()
    assert (out_dir / "edge_prob_bias_f0.npy").exists()


def test_batched_forward_rejects_mismatched_cohort(served):
    """r3 review fix: a cohort whose per-subject shapes disagree with the
    model config (e.g. a standard (S, 90, 3) cohort against a multi-fusion
    bundle) fails fast with the expected shapes, not a ScopeParamShapeError
    from deep inside flax."""
    from iggcn_tpu.predict import batched_forward

    model, variables, cohort = served
    with pytest.raises(ValueError, match="does not match the model"):
        batched_forward(model, variables["params"], variables["batch_stats"],
                        cohort.x[:, :, :1].astype(np.float32),
                        cohort.adj.astype(np.float32),
                        cohort.snps.astype(np.float32), batch_size=8)


def test_explain_robust_dispatch_and_loud_failures(served, tmp_path):
    """r3 review fixes: bundle dispatch is by content (ZIP magic), not
    filename, so renamed bundles still load; a non-bundle npz in the bundle
    position gets a clear error instead of a bare KeyError; a checkpoint
    with nothing to explain exits non-zero instead of silently succeeding."""
    import os

    from iggcn_tpu.tools import explain
    from iggcn_tpu.tools.serve import load_bundle, save_bundle
    from iggcn_tpu.train.checkpoint import save_checkpoint

    model, variables, cohort = served

    # 1. renamed bundle (no .npz suffix): content sniff routes to load_bundle
    src = str(tmp_path / "b.npz")
    save_bundle(src, model, variables["params"], variables["batch_stats"])
    renamed = str(tmp_path / "bundle.ckpt")
    os.rename(src, renamed)
    payload = explain.load_payload(renamed)
    assert "prob" in payload["params"]

    # 2. cohort npz in the bundle position: actionable error, not KeyError
    cohort_npz = str(tmp_path / "cohort.npz")
    np.savez(cohort_npz, x=cohort.x, adj=cohort.adj, snps=cohort.snps)
    with pytest.raises(ValueError, match="not a serving bundle"):
        load_bundle(cohort_npz)

    # 3. no importance leaves and no grad-CAM inputs -> exit code 2
    ckpt = str(tmp_path / "noimp.msgpack")
    save_checkpoint(ckpt, {"dense": {"kernel": np.zeros((4, 2), np.float32)}},
                    {})
    with pytest.raises(SystemExit) as ei:
        explain.main([ckpt, "--out", str(tmp_path / "ex_empty")])
    assert ei.value.code == 2


@pytest.mark.parametrize("family", ["guide", "clusterlabel"])
def test_bundle_roundtrip_covers_every_exportable_family(served, tmp_path,
                                                         family):
    """Every model cv.py's `--export_bundle` guard lets through (topo-
    presence) must load back on the deployment host — a bundle that only
    fails at serve time is a broken artifact."""
    from iggcn_tpu.config import ModelConfig
    from iggcn_tpu.models.clusterlabel import ClusterLabelSGCN
    from iggcn_tpu.models.guide import GuideImgSnp
    from iggcn_tpu.predict import batched_forward
    from iggcn_tpu.tools.serve import load_bundle, save_bundle

    _, _, cohort = served
    from iggcn_tpu.data.go_graph import synthetic_topology
    topo = synthetic_topology(np.random.default_rng(0))
    mcfg = ModelConfig(num_layers=2, hidden=8)
    cls = {"guide": GuideImgSnp, "clusterlabel": ClusterLabelSGCN}[family]
    model = cls(cfg=mcfg, topo=topo)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        jnp.zeros((4, mcfg.rois, mcfg.feat_dim)),
        jnp.zeros((4, mcfg.rois, mcfg.rois)),
        jnp.zeros((4, mcfg.num_snps)))
    bundle = str(tmp_path / f"{family}.npz")
    save_bundle(bundle, model, variables["params"], variables["batch_stats"])

    model2, params2, stats2 = load_bundle(bundle)
    assert type(model2) is cls
    args = (cohort.x.astype(np.float32), cohort.adj.astype(np.float32),
            cohort.snps.astype(np.float32))
    want = batched_forward(model, variables["params"],
                           variables["batch_stats"], *args, batch_size=8)
    got = batched_forward(model2, params2, stats2, *args, batch_size=8)
    np.testing.assert_allclose(got["log_probs"], want["log_probs"],
                               rtol=1e-6, atol=1e-6)


def test_bundle_ctor_meta_survives_version_skew(tmp_path):
    """Ctor-built bundles must tolerate producer/consumer version skew:
    dropout knobs (eval-irrelevant) stay OUT of the exported meta so old
    hosts can load new bundles, and the loader DROPS unknown ctor keys so
    new hosts load bundles from an even-newer producer."""
    import json

    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.go_network import GeneOntologyNetwork
    from iggcn_tpu.tools.serve import load_bundle, save_bundle

    topo = synthetic_topology(np.random.default_rng(0))
    model = GeneOntologyNetwork(topo=topo)

    def _init_all(mod, x):
        latent, _, _ = mod(x)
        return mod.classify(latent, x)

    variables = jax.jit(lambda r, x: model.init(r, x, method=_init_all))(
        jax.random.PRNGKey(0),
        jnp.zeros((4, topo.go_snps.shape[1]), jnp.float32))
    bundle = str(tmp_path / "go.npz")
    save_bundle(bundle, model, variables["params"],
                variables.get("batch_stats", {}))

    with np.load(bundle, allow_pickle=False) as zf:
        flat = {k: zf[k] for k in zf.files}
    meta = json.loads(str(flat["__meta__"]))
    assert not any(k.startswith("dropout") for k in meta["ctor"]), \
        "dropout knobs leaked into the bundle meta (breaks older hosts)"

    # a bundle from a FUTURE producer carries a ctor knob we don't know
    meta["ctor"]["knob_from_the_future"] = 7
    flat["__meta__"] = np.asarray(json.dumps(meta))
    skewed = str(tmp_path / "go_future.npz")
    np.savez(skewed, **flat)
    model2, params2, _ = load_bundle(skewed)
    assert type(model2) is GeneOntologyNetwork
    # and the loaded model still serves: same ctor-relevant structure
    assert model2.n_l == model.n_l and model2.l_dim == model.l_dim


def test_batched_forward_snps_shape_fail_fast(topo):
    """Wrong-width / wrong-rank SNP matrices fail with a clear message
    instead of a flax ScopeParamShapeError (the SNP-only analogue of
    validate_cohort_shapes)."""
    import pytest as _pytest

    from iggcn_tpu.predict import batched_forward_snps

    with _pytest.raises(ValueError, match="expects 54"):
        batched_forward_snps(None, {}, {}, np.zeros((4, 7), np.float32),
                             expected_width=54)
    with _pytest.raises(ValueError, match="must be 2-D"):
        batched_forward_snps(None, {}, {}, np.zeros((4,), np.float32),
                             expected_width=54)


def test_infer_input_width_is_structural():
    """The input layer is found structurally (fan-in not any layer's output
    width), not by name order: a chain whose input layer sorts LAST must
    still resolve to the true input width."""
    from iggcn_tpu.tools.serve import _infer_input_width

    k = lambda i, o: {"kernel": np.zeros((i, o), np.float32)}
    params = {"a_head": k(16, 1), "b_mid": k(32, 16), "z_input": k(54, 32)}
    assert _infer_input_width(params) == 54
