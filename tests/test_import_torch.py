"""Reference-checkpoint importer (`tools/import_torch.py`).

The reference's only checkpoint artifact is the fused family's
``torch.save(model.state_dict(), 'gcn_state_dict_..._fold_k.pt')``
(`kernel/train_eval_sgcn_img_snps.py:184-185`). These tests pin the importer
three ways:

* the sparse gene-coding value ORDER is pinned against torch itself
  (``to_sparse().coalesce()`` — the exact call the reference makes), not
  against the importer's own ``np.nonzero`` assumption;
* a reference-layout state_dict built from a real FusedSGCN tree by an
  independent inverse mapping round-trips to the identical parameter tree,
  batch_stats included, and to the identical eval forward — off-mask
  gene-coding entries differ by construction, proving every consumer masks;
* wrong checkpoints fail loudly: missing keys, unknown keys, shape drift,
  and a topology whose nonzero count disagrees with the value vectors.
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from iggcn_tpu.config import ModelConfig
from iggcn_tpu.models.fused_sgcn import FusedSGCN
from iggcn_tpu.tools.import_torch import (ImportError_,
                                          convert_fused_state_dict,
                                          infer_model_config)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _coalesce_order(mask01: np.ndarray) -> tuple:
    """Index order torch's coalesce() yields for this incidence matrix —
    the authoritative reference semantics (go_model.py:77-88)."""
    idx = (torch.from_numpy(mask01.astype(np.float32))
           .to_sparse().coalesce().indices().numpy())
    return idx[0], idx[1]


def test_nonzero_matches_torch_coalesce_order():
    """The importer scatters values at np.nonzero positions; torch coalesce
    must agree — including on a ragged, non-symmetric mask."""
    rng = np.random.default_rng(3)
    mask = (rng.random((13, 29)) < 0.3).astype(np.float64)
    tr, tc = _coalesce_order(mask)
    nr, nc = np.nonzero(mask)
    np.testing.assert_array_equal(tr, nr)
    np.testing.assert_array_equal(tc, nc)
    # and for the transposed (decoder, A_g.t().coalesce()) matrix
    tr2, tc2 = _coalesce_order(mask.T)
    nr2, nc2 = np.nonzero(mask.T)
    np.testing.assert_array_equal(tr2, nr2)
    np.testing.assert_array_equal(tc2, nc2)


def _reference_layout_sd(params, batch_stats, topo, cfg):
    """Inverse mapping: our tree -> the reference SGCN_GCN_IMGSNP
    state_dict layout, written independently of the importer (sparse
    orderings via torch coalesce, not np.nonzero)."""
    sd = {}
    go = params["go_network"]
    sgo = batch_stats["go_network"]

    def put(key, arr):
        sd[key] = torch.from_numpy(np.asarray(arr).copy())

    dims = [cfg.feat_dim] + [cfg.hidden] * cfg.num_layers
    for i in range(cfg.num_layers):
        base = "conv1" if i == 0 else f"convs.{i - 1}"
        put(f"{base}.lin.weight", np.asarray(params[f"conv_w_{i}"]).T)
        put(f"{base}.bias", params[f"conv_b_{i}"])
        assert np.asarray(params[f"conv_w_{i}"]).shape == (dims[i],
                                                           dims[i + 1])
    for name in ("prob", "prob_bias", "snps_prob"):
        put(name, params[name])
    put("multihead_attn.in_proj_weight", params["mha_in_proj_weight"])
    put("multihead_attn.in_proj_bias", params["mha_in_proj_bias"])
    put("multihead_attn.out_proj.weight", params["mha_out_proj_weight"])
    put("multihead_attn.out_proj.bias", params["mha_out_proj_bias"])
    for name in ("lin1", "lin2", "lin1_regr", "lin2_regr"):
        put(f"{name}.weight", np.asarray(params[name]["kernel"]).T)
        put(f"{name}.bias", params[name]["bias"])

    mask = np.asarray(topo.go_snps) != 0
    er, ec = _coalesce_order(mask)
    for c in range(cfg.go_in_f_dim):
        put(f"go_network.t.{c}", np.asarray(go[f"gene_enc_{c}"])[er, ec])
    dr, dc = _coalesce_order(mask.T)          # A_g.t().coalesce()
    put("go_network.t_D.0", np.asarray(go["gene_dec"]).T[dr, dc])

    n_l = cfg.go_n_l
    for i in range(n_l):
        for ref, ours in (("w_inc", "w_inc"), ("w_s_loop", "w_s_loop"),
                          ("w_att_s", "w_att_s"), ("w_out", "w_out"),
                          ("w_s_loop_out", "w_s_loop_out")):
            put(f"go_network.{ref}.{i}.weight",
                np.asarray(go[f"{ours}_{i}"]["kernel"]).T)
        put(f"go_network.w_att_in.{i}.weight",
            np.asarray(go[f"w_att_in_{i}"]).T)
        put(f"go_network.G_B.{i}.weight", go[f"g_b_{i}"]["scale"])
        put(f"go_network.G_B.{i}.bias", go[f"g_b_{i}"]["bias"])
        put(f"go_network.G_B_D.{i}.weight", go[f"g_b_d_{i}"]["scale"])
        put(f"go_network.G_B_D.{i}.bias", go[f"g_b_d_{i}"]["bias"])

    def put_bn(ref_base, target):
        put(f"{ref_base}.weight", go[target]["scale"])
        put(f"{ref_base}.bias", go[target]["bias"])
        put(f"{ref_base}.running_mean", sgo[target]["mean"])
        put(f"{ref_base}.running_var", sgo[target]["var"])
        sd[f"{ref_base}.num_batches_tracked"] = torch.tensor(7)

    put("go_network.conc_for_attention.0.weight",
        np.asarray(go["conc_for_attention"]["kernel"]).T)
    put_bn("go_network.conc_for_attention.1", "bn_atten")
    put("go_network.conc.weight", np.asarray(go["conc"]["kernel"]).T)
    put_bn("go_network.B.0", "bn_b")
    put("go_network.conc_D.weight", np.asarray(go["conc_d"]["kernel"]).T)
    put_bn("go_network.B_D.0", "bn_b_d")
    put("go_network.latent.0.weight", np.asarray(go["latent1"]["kernel"]).T)
    put_bn("go_network.latent.1", "bn_latent1")
    put("go_network.latent.4.weight", np.asarray(go["latent2"]["kernel"]).T)
    put_bn("go_network.latent.5", "bn_latent2")

    # parameters the reference registers but its fused forward never reads
    rng = np.random.default_rng(11)
    put("edge_prob", rng.normal(size=(cfg.rois, cfg.rois)))
    for base, width in (("batch_norm", cfg.num_layers * cfg.hidden),
                        ("batch_norm_1d",
                         cfg.rois * cfg.num_layers * cfg.hidden + cfg.l_dim)):
        put(f"{base}.weight", np.ones(width))
        put(f"{base}.bias", np.zeros(width))
        put(f"{base}.running_mean", np.zeros(width))
        put(f"{base}.running_var", np.ones(width))
        sd[f"{base}.num_batches_tracked"] = torch.tensor(0)
    cw = cfg.l_dim + cfg.num_snps
    put("go_network.classification.0.weight", np.ones(cw))
    put("go_network.classification.0.bias", np.zeros(cw))
    put("go_network.classification.0.running_mean", np.zeros(cw))
    put("go_network.classification.0.running_var", np.ones(cw))
    sd["go_network.classification.0.num_batches_tracked"] = torch.tensor(0)
    put("go_network.classification.3.weight", rng.normal(size=(16, cw)))
    put("go_network.classification.6.weight", rng.normal(size=(1, 16)))
    put("go_network.classification.6.bias", np.zeros(1))
    return sd


@pytest.fixture(scope="module")
def fused_setup(topo):
    cfg = ModelConfig(num_layers=2, hidden=16)
    model = FusedSGCN(cfg=cfg, topo=topo)
    x = np.random.default_rng(5).normal(
        size=(4, cfg.rois, cfg.feat_dim)).astype(np.float32)
    adj = np.abs(np.random.default_rng(6).normal(
        size=(4, cfg.rois, cfg.rois))).astype(np.float32)
    adj = (adj + adj.transpose(0, 2, 1)) / 2
    snps = np.random.default_rng(7).normal(
        size=(4, topo.go_snps.shape[1])).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(7), jnp.asarray(x),
                           jnp.asarray(adj), jnp.asarray(snps))
    params = jax.device_get(variables["params"])
    # perturb the running stats away from init (mean 0 / var 1) so the
    # batch_stats import is actually exercised
    stats = jax.tree_util.tree_map(
        lambda a: a + np.random.default_rng(8).normal(
            scale=0.1, size=a.shape).astype(a.dtype) + 0.5,
        jax.device_get(variables["batch_stats"]))
    return cfg, model, params, stats, (x, adj, snps)


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k in tree:
            yield from _tree_paths(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


def test_round_trip_exact(fused_setup, topo, capsys):
    cfg, model, params, stats, (x, adj, snps) = fused_setup
    sd = _reference_layout_sd(params, stats, topo, cfg)
    icfg = infer_model_config(sd, topo)
    assert icfg == cfg
    got_p, got_s = convert_fused_state_dict(sd, topo, icfg)

    mask = np.asarray(topo.go_snps) != 0
    want = dict(_tree_paths(params))
    got = dict(_tree_paths(got_p))
    assert set(want) == set(got)
    for path in want:
        if "/gene_" in path:
            # off-mask entries are masked by every consumer; only the
            # on-mask values survive the sparse round trip
            np.testing.assert_allclose(got[path][mask], want[path][mask],
                                       rtol=0, atol=0, err_msg=path)
        else:
            np.testing.assert_array_equal(got[path], want[path],
                                          err_msg=path)
    for path, arr in _tree_paths(stats):
        np.testing.assert_array_equal(dict(_tree_paths(got_s))[path], arr,
                                      err_msg=path)

    # identical eval forward despite the differing off-mask values
    apply = jax.jit(model.apply)
    out_a = apply({"params": params, "batch_stats": stats},
                  jnp.asarray(x), jnp.asarray(adj), jnp.asarray(snps))
    out_b = apply({"params": got_p, "batch_stats": got_s},
                  jnp.asarray(x), jnp.asarray(adj), jnp.asarray(snps))
    for a, b in zip(jax.tree_util.tree_leaves(out_a),
                    jax.tree_util.tree_leaves(out_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "never reads" in capsys.readouterr().err


def test_old_pyg_conv_layout(fused_setup, topo):
    """PyG < 2.0 stored GCNConv weight directly as (in, out) `weight`."""
    cfg, _, params, stats, _ = fused_setup
    sd = _reference_layout_sd(params, stats, topo, cfg)
    for i in range(cfg.num_layers):
        base = "conv1" if i == 0 else f"convs.{i - 1}"
        w = sd.pop(f"{base}.lin.weight")
        sd[f"{base}.weight"] = w.T.contiguous()
    got_p, _ = convert_fused_state_dict(sd, topo, cfg)
    for i in range(cfg.num_layers):
        np.testing.assert_array_equal(got_p[f"conv_w_{i}"],
                                      np.asarray(params[f"conv_w_{i}"]))


def test_error_paths(fused_setup, topo):
    cfg, _, params, stats, _ = fused_setup
    base_sd = _reference_layout_sd(params, stats, topo, cfg)

    sd = dict(base_sd)
    del sd["go_network.conc.weight"]
    with pytest.raises(ImportError_, match="missing expected key"):
        convert_fused_state_dict(sd, topo, cfg)

    sd = dict(base_sd)
    sd["go_network.some_new_block.weight"] = torch.zeros(3, 3)
    with pytest.raises(ImportError_, match="unrecognized"):
        convert_fused_state_dict(sd, topo, cfg)

    sd = dict(base_sd)
    sd["lin2.bias"] = torch.zeros(5)
    with pytest.raises(ImportError_, match="shape mismatch"):
        convert_fused_state_dict(sd, topo, cfg)

    # topology whose nonzero count disagrees with the value vectors
    sd = dict(base_sd)
    sd["go_network.t.0"] = torch.zeros(3)
    with pytest.raises(ImportError_, match="DIFFERENT GO topology"):
        convert_fused_state_dict(sd, topo, cfg)


def test_export_matches_independent_layout(fused_setup, topo):
    """The tool's reverse exporter must produce the same layout as this
    file's independently-written reference sd builder: identical key set,
    identical values on every key the reference forward reads (the
    synthesized unused parameters may differ in value, never in shape)."""
    from iggcn_tpu.tools.import_torch import export_reference_state_dict

    cfg, _, params, stats, _ = fused_setup
    want = _reference_layout_sd(params, stats, topo, cfg)
    got = export_reference_state_dict(params, stats, topo, cfg)
    assert set(got) == set(want)
    unused = {k for k in want
              if k == "edge_prob" or k.startswith(("batch_norm",
                                                   "go_network.classification"))
              or k.endswith("num_batches_tracked")}
    for k in want:
        assert tuple(np.asarray(got[k]).shape) == tuple(want[k].shape), k
        if k not in unused:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          want[k].numpy(), err_msg=k)


def test_reverse_cli_round_trip(fused_setup, topo, tmp_path):
    """bundle --reverse-> reference .pt -> importer -> identical tree."""
    from iggcn_tpu.tools.import_torch import convert_fused_state_dict as conv
    from iggcn_tpu.tools.serve import save_bundle

    cfg, model, params, stats, _ = fused_setup
    bundle = tmp_path / "ours.npz"
    save_bundle(str(bundle), model, params, stats)
    out_pt = tmp_path / "reference_layout.pt"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "iggcn_tpu.tools.import_torch", "--reverse",
         "--ckpt", str(bundle), "--out", str(out_pt)],
        capture_output=True, text=True, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr
    sd = torch.load(out_pt, map_location="cpu", weights_only=True)
    got_p, got_s = conv(sd, topo, cfg)
    mask = np.asarray(topo.go_snps) != 0
    for path, arr in _tree_paths(params):
        g = dict(_tree_paths(got_p))[path]
        if "/gene_" in path:
            np.testing.assert_array_equal(g[mask], arr[mask], err_msg=path)
        else:
            np.testing.assert_array_equal(g, arr, err_msg=path)
    for path, arr in _tree_paths(stats):
        np.testing.assert_array_equal(dict(_tree_paths(got_s))[path], arr,
                                      err_msg=path)


def test_reverse_refuses_non_reference_knobs(topo, tmp_path):
    """A fused bundle trained under non-reference architecture knobs
    (here: is_cross_atten=False — no MHA params in the tree) has no
    reference-layout representation; --reverse must refuse with the
    tool's clean FAILED message, not die on a raw KeyError (r3 ADVICE)."""
    from iggcn_tpu.tools.serve import save_bundle

    cfg = ModelConfig(num_layers=2, hidden=4, is_cross_atten=False)
    model = FusedSGCN(cfg=cfg, topo=topo)
    v = jax.jit(model.init)(jax.random.PRNGKey(0),
                            jnp.zeros((2, cfg.rois, cfg.feat_dim)),
                            jnp.zeros((2, cfg.rois, cfg.rois)),
                            jnp.zeros((2, cfg.num_snps)))
    bundle = tmp_path / "nonref.npz"
    save_bundle(str(bundle), model, jax.device_get(v["params"]),
                jax.device_get(v["batch_stats"]))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "iggcn_tpu.tools.import_torch", "--reverse",
         "--ckpt", str(bundle), "--out", str(tmp_path / "sd.pt")],
        capture_output=True, text=True, cwd=REPO, env=env)
    assert r.returncode == 1
    assert "FAILED" in r.stderr and "is_cross_atten" in r.stderr
    assert "KeyError" not in r.stderr


def test_reverse_refuses_dim_changing_knobs(topo, tmp_path):
    """is_use_prob4regr=False (and is_image_only/is_snps_only) keep every
    param-tree KEY — the branches are built unconditionally — but change
    the out_lin/feat4regr DIMS, so export used to 'succeed' into
    lin1_regr weights the reference's strict load_state_dict rejects with
    a raw shape error. The guard must refuse these too (r4 ADVICE)."""
    from iggcn_tpu.tools.serve import save_bundle

    cfg = ModelConfig(num_layers=2, hidden=4, is_use_prob4regr=False)
    model = FusedSGCN(cfg=cfg, topo=topo)
    v = jax.jit(model.init)(jax.random.PRNGKey(0),
                            jnp.zeros((2, cfg.rois, cfg.feat_dim)),
                            jnp.zeros((2, cfg.rois, cfg.rois)),
                            jnp.zeros((2, cfg.num_snps)))
    bundle = tmp_path / "nonref2.npz"
    save_bundle(str(bundle), model, jax.device_get(v["params"]),
                jax.device_get(v["batch_stats"]))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "iggcn_tpu.tools.import_torch", "--reverse",
         "--ckpt", str(bundle), "--out", str(tmp_path / "sd2.pt")],
        capture_output=True, text=True, cwd=REPO, env=env)
    assert r.returncode == 1
    assert "FAILED" in r.stderr and "is_use_prob4regr" in r.stderr
    assert "shape" not in r.stderr.lower()


def test_cli_end_to_end(fused_setup, topo, tmp_path):
    """torch.save -> iggcn-import-torch CLI -> load_bundle -> same logits.

    Uses the synthetic-topology route with the conftest topo's seed (0)."""
    from iggcn_tpu.tools.serve import load_bundle

    cfg, model, params, stats, (x, adj, snps) = fused_setup
    sd = _reference_layout_sd(params, stats, topo, cfg)
    ckpt = tmp_path / "gcn_state_dict_demo_fold_0.pt"
    torch.save(sd, ckpt)
    out = tmp_path / "imported_bundle.npz"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "iggcn_tpu.tools.import_torch",
         "--ckpt", str(ckpt), "--out", str(out),
         "--synthetic_topo_seed", "0"],
        capture_output=True, text=True, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr
    assert "parameters" in r.stdout

    bmodel, bparams, bstats = load_bundle(str(out))
    assert bmodel.cfg == cfg
    out_a = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), jnp.asarray(adj), jnp.asarray(snps))
    out_b = bmodel.apply({"params": bparams, "batch_stats": bstats},
                         jnp.asarray(x), jnp.asarray(adj),
                         jnp.asarray(snps))
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_a[0]),
                               rtol=0, atol=0)

    # missing topology source -> loud failure, nonzero exit
    r2 = subprocess.run(
        [sys.executable, "-m", "iggcn_tpu.tools.import_torch",
         "--ckpt", str(ckpt), "--out", str(tmp_path / "x.npz")],
        capture_output=True, text=True, cwd=REPO, env=env)
    assert r2.returncode != 0
    assert "GO topology" in (r2.stderr + r2.stdout)
