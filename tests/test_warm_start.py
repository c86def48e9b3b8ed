"""Warm-starting CV folds from external weights (`--init_from_torch`).

The reference writes fused-family checkpoints it never loads back
(`kernel/train_eval_sgcn_img_snps.py:184-185`); here they can seed a new
experiment: `cv.cross_validation(warm_start=(params, batch_stats, tag))`
replaces every fold's fresh init (optimizer state and splits stay fresh),
and `main.py --init_from_torch ckpt.pt` wires a converted reference
checkpoint through it. Pins: the warm trees enter the hot loop bit-exactly
(lr=0 training returns them unchanged from the per-fold checkpoint), the
structure/shape guards fail loudly, the resume fingerprint separates warm
from fresh runs, and the CLI refuses unsupported routes.
"""
import os

import jax
import numpy as np
import pytest

import main as cli
from iggcn_tpu.config import ModelConfig, TrainConfig
from iggcn_tpu.models.sgcn_image import SGCNImage
from iggcn_tpu.train.checkpoint import load_checkpoint
from iggcn_tpu.train.cv import (_apply_warm_start, _init_fold_state,
                                cross_validation)
from iggcn_tpu.train.steps import make_optimizer


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k in tree:
            yield from _tree_paths(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


@pytest.fixture(scope="module")
def small_setup():
    mcfg = ModelConfig(num_layers=2, hidden=4, rois=12, hidden_linear=8)
    tcfg = TrainConfig(epochs=1, batch_size=6, folds=3, lr=0.0, seed=3)
    model = SGCNImage(num_layers=mcfg.num_layers, hidden=mcfg.hidden,
                      rois=mcfg.rois, hidden_linear=mcfg.hidden_linear,
                      dropout_lin=0.0)
    optimizer = make_optimizer(tcfg)
    return mcfg, tcfg, model, optimizer


def test_init_fold_state_applies_warm_trees(small_setup):
    mcfg, tcfg, model, optimizer = small_setup
    fresh, _ = _init_fold_state(model, optimizer, False, mcfg,
                                tcfg.batch_size, tcfg.seed, 0, 1)
    warm_p = jax.tree_util.tree_map(
        lambda a: np.full_like(np.asarray(a), 0.25),
        jax.device_get(fresh.params))
    state, _ = _init_fold_state(model, optimizer, False, mcfg,
                                tcfg.batch_size, tcfg.seed, 0, 1,
                                warm=(warm_p, None))
    for path, arr in _tree_paths(jax.device_get(state.params)):
        np.testing.assert_array_equal(arr, 0.25, err_msg=path)


def test_apply_warm_start_guards(small_setup):
    mcfg, tcfg, model, optimizer = small_setup
    fresh, _ = _init_fold_state(model, optimizer, False, mcfg,
                                tcfg.batch_size, tcfg.seed, 0, 1)
    variables = {"params": jax.device_get(fresh.params)}
    good = jax.device_get(fresh.params)

    bad_struct = dict(good)
    bad_struct["not_a_param"] = np.zeros(3)
    with pytest.raises(ValueError, match="does not match the model"):
        _apply_warm_start(variables, (bad_struct, None))

    bad_shape = jax.tree_util.tree_map(np.asarray, good)
    leaf_path = next(iter(_tree_paths(bad_shape)))[0].strip("/").split("/")
    node = bad_shape
    for k in leaf_path[:-1]:
        node = node[k]
    node[leaf_path[-1]] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="leaf shape"):
        _apply_warm_start(variables, (bad_shape, None))

    with pytest.raises(ValueError, match="no such collection"):
        _apply_warm_start(variables, (good, {"bn": {"mean": np.zeros(3)}}))


def test_warm_params_enter_training_bit_exactly(small_setup, tmp_path):
    """lr=0 training from a constant-valued warm start must write per-fold
    checkpoints holding exactly those constants — proof the warm trees
    (not the fresh init) went through the real fold programs."""
    from iggcn_tpu.data.adni import synthetic_cohort

    mcfg, tcfg, model, optimizer = small_setup
    cohort = synthetic_cohort(np.random.default_rng(0), num_subjects=18,
                              rois=mcfg.rois)
    fresh, _ = _init_fold_state(model, optimizer, False, mcfg,
                                tcfg.batch_size, tcfg.seed, 0, 1)
    warm_p = jax.tree_util.tree_map(
        lambda a: np.full_like(np.asarray(a), 0.125),
        jax.device_get(fresh.params))
    res_dir = str(tmp_path / "out")
    cross_validation(cohort, None, mcfg, tcfg, res_dir=res_dir,
                     result_file_name="warmtest", model_kind="sgcn_image",
                     verbose=False, warm_start=(warm_p, None, "unit:deadbeef"))
    ckpt = os.path.join(res_dir, "gcn_state_dict_warmtest_fold_0.msgpack")
    assert os.path.exists(ckpt)
    loaded = load_checkpoint(ckpt, {"params": warm_p, "batch_stats": {}})
    for path, arr in _tree_paths(loaded["params"]):
        np.testing.assert_array_equal(arr, 0.125, err_msg=path)

    # warm and fresh runs carry different resume fingerprints (records
    # guard: a fresh-run resume must not absorb warm-run folds)
    rec = np.load(os.path.join(res_dir,
                               "fold_result_warmtest_fold_0.npz"))
    meta_warm = rec["meta"][-1]
    res_dir2 = str(tmp_path / "out_fresh")
    cross_validation(cohort, None, mcfg, tcfg, res_dir=res_dir2,
                     result_file_name="warmtest", model_kind="sgcn_image",
                     verbose=False)
    rec2 = np.load(os.path.join(res_dir2,
                                "fold_result_warmtest_fold_0.npz"))
    assert meta_warm != rec2["meta"][-1]


def test_cli_refuses_unsupported_routes(tmp_path, capsys):
    ck = tmp_path / "sd.pt"
    ck.write_bytes(b"not really a checkpoint")
    with pytest.raises(SystemExit):
        cli.main(["--model", "GIN", "--init_from_torch", str(ck)])
    assert "SGCN_GCN_IMGSNP only" in capsys.readouterr().err

    with pytest.raises(SystemExit):
        cli.main(["--model", "SGCN_GCN_IMGSNP", "--init_from_torch",
                  str(ck), "--cv_seeds", "1:2"])
    assert "SPMD batch" in capsys.readouterr().err

    with pytest.raises(SystemExit):
        cli.main(["--model", "SGCN_GCN_IMGSNP", "--init_from_torch",
                  str(ck), "--isTestAdnitype"])
    assert "isTestAdnitype" in capsys.readouterr().err

    with pytest.raises(SystemExit):
        cli.main(["--model", "SGCN_GCN_IMGSNP", "--init_from_torch",
                  str(tmp_path / "missing.pt")])
    assert "does not exist" in capsys.readouterr().err


def test_build_warm_start_arch_mismatch(topo, tmp_path, capsys):
    """A checkpoint whose architecture disagrees with the run's config must
    abort listing the mismatched fields, and a multi-combo grid must refuse
    up front."""
    import torch

    from iggcn_tpu.models.fused_sgcn import FusedSGCN
    from iggcn_tpu.tools.import_torch import export_reference_state_dict

    # num_classes must match the run side: the CLI's default --disease_id 3
    # selects a 3-class cohort, and _fused_cfgs resolves --num_regr None to
    # the 3-head default — so a default-flag run expects (3 classes, 3 regr)
    cfg = ModelConfig(num_layers=2, hidden=4, num_classes=3)
    model = FusedSGCN(cfg=cfg, topo=topo)
    import jax.numpy as jnp
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((2, cfg.rois, cfg.feat_dim)),
                   jnp.zeros((2, cfg.rois, cfg.rois)),
                   jnp.zeros((2, cfg.num_snps)))
    sd = export_reference_state_dict(jax.device_get(v["params"]),
                                     jax.device_get(v["batch_stats"]),
                                     topo, cfg)
    ck = tmp_path / "sd.pt"
    torch.save({k: torch.from_numpy(np.asarray(a)) for k, a in sd.items()},
               ck)

    parser = cli.build_parser()
    args = parser.parse_args(["--model", "SGCN_GCN_IMGSNP",
                              "--init_from_torch", str(ck), "--no-search",
                              "--layers", "2", "--hiddens", "16"])
    dcfg = cli._build_dcfg(args)
    with pytest.raises(SystemExit):
        cli._build_warm_start(args, dcfg, topo, [(2, 16, 2)], lambda m: None)
    assert "hidden: checkpoint 4 vs run 16" in capsys.readouterr().err

    with pytest.raises(SystemExit):
        cli._build_warm_start(args, dcfg, topo, [(2, 16, 2), (3, 16, 3)],
                              lambda m: None)
    assert "grid search" in capsys.readouterr().err

    # matching config converts cleanly and tags with the content hash
    args2 = parser.parse_args(["--model", "SGCN_GCN_IMGSNP",
                               "--init_from_torch", str(ck), "--no-search",
                               "--layers", "2", "--hiddens", "4"])
    dcfg2 = cli._build_dcfg(args2)
    params, stats, tag = cli._build_warm_start(args2, dcfg2, topo,
                                               [(2, 4, 2)], lambda m: None)
    assert tag.startswith("sd.pt:")
    assert "conv_w_0" in params and "go_network" in stats


def test_cli_warm_start_happy_path(tmp_path, monkeypatch):
    """Full-CLI drive: `main.py --init_from_torch <matching.pt>` trains, and
    with lr=0 fold 0's saved params are bit-equal to the checkpoint — the
    imported reference weights (not a fresh init) entered every fold."""
    import torch

    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.fused_sgcn import FusedSGCN
    from iggcn_tpu.tools.import_torch import (_load_state_dict,
                                              convert_fused_state_dict,
                                              export_reference_state_dict,
                                              infer_model_config)

    seed = 1000
    # the CLI's synthetic route draws topo from default_rng(--seed) before
    # the cohort (main._load_cohort); reproduce it so the checkpoint's GO
    # dims match the run's
    topo = synthetic_topology(np.random.default_rng(seed))
    cfg = ModelConfig(num_layers=2, hidden=4, num_classes=3)
    model = FusedSGCN(cfg=cfg, topo=topo)
    import jax.numpy as jnp
    v = model.init(jax.random.PRNGKey(7),
                   jnp.zeros((2, cfg.rois, cfg.feat_dim)),
                   jnp.zeros((2, cfg.rois, cfg.rois)),
                   jnp.zeros((2, cfg.num_snps)))
    sd = export_reference_state_dict(jax.device_get(v["params"]),
                                     jax.device_get(v["batch_stats"]),
                                     topo, cfg)
    ck = tmp_path / "gcn_state_dict_ref.pt"
    torch.save({k: torch.from_numpy(np.asarray(a)) for k, a in sd.items()},
               ck)

    monkeypatch.chdir(tmp_path)
    cli.main(["--model", "SGCN_GCN_IMGSNP", "--synthetic",
              "--synthetic_subjects", "24", "--epochs", "1", "--fold", "3",
              "--lr", "0", "--seed", str(seed), "--no-search", "--layers",
              "2", "--hiddens", "4", "--init_from_torch", str(ck),
              "--save_appendix", "_warmcli"])

    sd_back = _load_state_dict(str(ck))
    icfg = infer_model_config(sd_back, topo)
    want_params, _ = convert_fused_state_dict(sd_back, topo, icfg)
    ckpt = (tmp_path / "results" / "ADNI_warmcli" /
            "gcn_state_dict_result_sgcn_img_snp_layers2_hidden4_h2_fold_0"
            ".msgpack")
    assert ckpt.exists()
    loaded = load_checkpoint(str(ckpt), {"params": want_params,
                                         "batch_stats": {}})
    flat_want = dict(_tree_paths(want_params))
    for path, arr in _tree_paths(loaded["params"]):
        np.testing.assert_array_equal(arr, flat_want[path], err_msg=path)
    log = (tmp_path / "results" / "ADNI_warmcli" / "log.txt").read_text()
    assert "warm-starting every fold" in log
