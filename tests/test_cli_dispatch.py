"""CLI model-zoo dispatch (parity surface of reference `main.py:160`
`eval(args.model)`, rebuilt as explicit routing with loud failure)."""
import os

import numpy as np
import pytest

import main as cli

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_unknown_model_fails_loudly(capsys):
    with pytest.raises(SystemExit):
        cli.main(["--model", "GINN"])  # typo must not train the flagship
    assert "unknown --model" in capsys.readouterr().err


def test_reference_readme_flags_parse_as_noops(capsys):
    """The reference README's exact command line (`--cuda 0`, plus --cpu
    and the dead --clean/--keep_old/--reprocess flags) must PARSE here —
    drop-in compatibility — with the device flags as announced no-ops."""
    args = cli.build_parser().parse_args(
        ["--epochs", "200", "--lr", "0.001", "--search", "--cuda", "0",
         "--cpu", "--clean", "--keep_old", "--reprocess"])
    assert args.cuda == 0 and args.cpu and args.epochs == 200
    # the notice prints before any data/model work (unknown-model error
    # path exits right after it, keeping this test instant)
    with pytest.raises(SystemExit):
        cli.main(["--cuda", "1", "--model", "NOPE"])
    err = capsys.readouterr().err
    assert "reference-compat no-ops" not in err  # parser.error exits earlier

    class _Exit(Exception):
        pass

    # drive past parsing with a valid model but abort at the cohort load
    import iggcn_tpu.utils.cache as cache_mod
    orig = cache_mod.enable_compilation_cache
    try:
        def boom(*a, **k):
            raise _Exit()
        cache_mod.enable_compilation_cache = boom
        with pytest.raises(_Exit):
            cli.main(["--cuda", "1", "--synthetic", "--no-search"])
    finally:
        cache_mod.enable_compilation_cache = orig
    assert "reference-compat no-ops" in capsys.readouterr().err


def test_every_reference_model_name_is_routed():
    for name in ("GCN", "GAT", "GIN", "GIN0", "GraphSAGE", "TopK",
                 "DiffPool", "SortPool", "Set2Set", "GlobalAttention",
                 "Graclus", "CNN_Model", "NestedGCN", "NestedGAT",
                 "NestedGIN", "NestedGIN0", "NestedGraphSAGE"):
        assert name in cli.ZOO_MODELS
    for name in ("SGCN_GCN_IMGSNP", "GCN_IMGSNP", "GUIDE_IMGSNP",
                 "SGCN_GCN_CLUSTERLABEL", "SGCN_GCN", "SGCN_GAT",
                 "SGCN_Ori"):
        assert name in cli.FUSION_MODELS
    for name in ("MLP_Model", "Gene_ontology_network"):
        assert name in cli.SNP_MODELS


def test_export_bundle_refused_for_unsupported_routes(capsys):
    """r3 review fix: cv.py's topo guard used to silently skip the bundle
    write for image-only/zoo models and permutation runs — the CLI now
    refuses up front instead of training and exporting nothing."""
    for argv in (["--model", "GIN", "--export_bundle"],
                 ["--model", "SGCN_GCN", "--export_bundle"],
                 ["--model", "SGCN_Ori", "--export_bundle"],
                 ["--model", "SGCN_GCN_IMGSNP", "--export_bundle",
                  "--isPermutTest"]):
        with pytest.raises(SystemExit):
            cli.main(argv)
        assert "--export_bundle" in capsys.readouterr().err


def test_zoo_model_factory_covers_all_names():
    from iggcn_tpu.data.nested import create_nested_dataset
    from iggcn_tpu.data.tu import synthetic_tu_dataset
    ds = synthetic_tu_dataset(np.random.default_rng(0), num_graphs=12)
    nested = create_nested_dataset(ds, h=1)
    for name in cli.ZOO_MODELS:
        d = nested if name.startswith("Nested") else ds
        model, kw = cli._build_zoo_model(name, 2, 8, d)
        assert model is not None
        assert set(kw) <= {"needs_mask", "needs_assign", "adj_only",
                           "aux_loss", "takes_weight"}


def test_cli_zoo_tu_end_to_end(tmp_path, monkeypatch):
    """`--model GIN --data TUTEST` trains from the raw fixture files; the
    zoo route honors --profile_dir (it used to be fused-family-only)."""
    monkeypatch.chdir(tmp_path)
    prof = tmp_path / "trace"
    cli.main(["--model", "GIN", "--data", "TUTEST", "--no-search",
              "--tu_root", FIXTURES, "--epochs", "1", "--fold", "3",
              "--batch_size", "4", "--save_appendix", "_t",
              "--profile_dir", str(prof)])
    log = (tmp_path / "results" / "ADNI_t" / "log.txt").read_text()
    assert "Result -" in log
    traces = list(prof.rglob("*.xplane.pb"))
    assert traces, f"no profiler trace written under {prof}"


def test_cli_snp_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cli.main(["--model", "MLP_Model", "--synthetic",
              "--synthetic_subjects", "32", "--disease_id", "0",
              "--epochs", "1", "--fold", "3", "--batch_size", "8",
              "--save_appendix", "_s"])
    log = (tmp_path / "results" / "ADNI_s" / "log.txt").read_text()
    assert "SNP-only" in log


def test_snp_trainer_requires_binary(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit):
        cli.main(["--model", "MLP_Model", "--synthetic", "--disease_id",
                  "3", "--epochs", "1", "--save_appendix", "_b"])
    assert "binary" in capsys.readouterr().err


def test_cli_diffpool_tu_end_to_end(tmp_path, monkeypatch):
    """Regression: DiffPool always returns (logp, link, ent); the CLI route
    passes aux_loss=False (the reference discards the aux terms), which used
    to feed the whole tuple into nll_loss and crash."""
    monkeypatch.chdir(tmp_path)
    cli.main(["--model", "DiffPool", "--data", "TUTEST", "--no-search",
              "--tu_root", FIXTURES, "--epochs", "1", "--fold", "3",
              "--batch_size", "4", "--save_appendix", "_dp"])
    log = (tmp_path / "results" / "ADNI_dp" / "log.txt").read_text()
    assert "Result -" in log


def test_cli_snp_synthetic_wins_over_csv(tmp_path, monkeypatch, capsys):
    """Regression: an explicit --synthetic must not be overridden by real
    csv cohorts on disk (the csv probe used to run unconditionally)."""
    base = tmp_path / "data_AH"
    base.mkdir()
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 3, size=(12, 54)).astype(float)
    (base / "snp.csv").write_text(
        ",".join(f"rs{i}" for i in range(54)) + "\n"
        + "\n".join(",".join(map(str, r)) for r in raw) + "\n")
    (base / "dia.csv").write_text(
        "dia\n" + "\n".join(str(v % 2) for v in range(12)) + "\n")
    monkeypatch.chdir(tmp_path)
    cli.main(["--model", "MLP_Model", "--synthetic",
              "--synthetic_subjects", "32", "--disease_id", "0",
              "--epochs", "1", "--fold", "3", "--batch_size", "8",
              "--snps_csv_root", str(tmp_path), "--save_appendix", "_sny"])
    out = capsys.readouterr().out
    assert "synthetic ADNI-shaped cohort" in out
    assert "SNP csv cohort" not in out


def test_cli_snp_csv_first_skips_imaging_load(tmp_path, monkeypatch, capsys):
    """Without --synthetic, an on-disk csv cohort is used directly and the
    imaging .mat load / synthetic fallback never runs."""
    base = tmp_path / "data_AH"
    base.mkdir()
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 3, size=(16, 54)).astype(float)
    (base / "snp.csv").write_text(
        ",".join(f"rs{i}" for i in range(54)) + "\n"
        + "\n".join(",".join(map(str, r)) for r in raw) + "\n")
    (base / "dia.csv").write_text(
        "dia\n" + "\n".join(str(v % 2) for v in range(16)) + "\n")
    monkeypatch.chdir(tmp_path)
    cli.main(["--model", "MLP_Model", "--disease_id", "0", "--epochs", "1",
              "--fold", "3", "--batch_size", "8",
              "--snps_csv_root", str(tmp_path), "--save_appendix", "_scv"])
    out = capsys.readouterr().out
    assert "SNP csv cohort: 16 subjects" in out
    assert "synthetic ADNI-shaped cohort" not in out


def test_cli_ori_search_runs_single_combo(tmp_path, monkeypatch, capsys):
    """--search with the fixed-architecture SGCN_Ori short-circuits to one
    configuration instead of training 5 identical models."""
    import iggcn_tpu.train.cv as cvmod

    calls = []
    real_result = cvmod.CVResult(
        mean_test_loss=1.0, best_acc=0.5, best_acc_std=0.0,
        score_result=np.zeros((3, 1, 5)), durations=[0.0],
        throughput_graphs_per_sec=1.0, regression_summary={})

    def fake_cv(cohort, topo, mcfg, tcfg, **kw):
        calls.append((mcfg.num_layers, mcfg.hidden))
        return real_result

    monkeypatch.setattr(cvmod, "cross_validation", fake_cv)
    monkeypatch.chdir(tmp_path)
    cli.main(["--model", "SGCN_Ori", "--synthetic",
              "--synthetic_subjects", "24", "--epochs", "1", "--fold", "3",
              "--search", "--save_appendix", "_oris"])
    assert len(calls) == 1
    assert "[search] SGCN_Ori has a fixed architecture" in \
        capsys.readouterr().out


def test_search_sweeps_reference_triples(tmp_path, monkeypatch):
    """--search (the DEFAULT, as in reference main.py:103) sweeps the
    reference's exact (layers, hiddens, h) triples (main.py:146-155), with
    h threaded into the result filenames; --isMultiFusion switches to the
    multi-fusion triple set."""
    import iggcn_tpu.train.cv as cvmod

    result = cvmod.CVResult(
        mean_test_loss=1.0, best_acc=0.5, best_acc_std=0.0,
        score_result=np.zeros((3, 1, 5)), durations=[0.0],
        throughput_graphs_per_sec=1.0, regression_summary={})
    calls = []

    def fake_cv(cohort, topo, mcfg, tcfg, **kw):
        calls.append((mcfg.num_layers, mcfg.hidden, kw["result_file_name"]))
        return result

    monkeypatch.setattr(cvmod, "cross_validation", fake_cv)
    monkeypatch.chdir(tmp_path)
    # bare command line (no --search flag): the sweep must run, as upstream
    cli.main(["--synthetic", "--synthetic_subjects", "24", "--epochs", "1",
              "--fold", "3", "--save_appendix", "_grid"])
    assert [(l, hd) for l, hd, _ in calls] == \
        [(2, 16), (3, 16), (2, 10), (3, 10), (4, 5)]
    assert [fn.split("_h")[-1] for _, _, fn in calls] == \
        ["2", "3", "4", "4", "2"]

    calls.clear()
    cli.main(["--synthetic", "--synthetic_subjects", "24", "--epochs", "1",
              "--fold", "3", "--isMultiFusion", "--save_appendix", "_gridm"])
    assert [(l, hd) for l, hd, _ in calls] == \
        [(3, 2), (2, 3), (4, 3), (2, 5), (3, 10)]
    assert [fn.split("_h")[-1] for _, _, fn in calls] == \
        ["3", "2", "4", "2", "4"]

    calls.clear()
    cli.main(["--synthetic", "--synthetic_subjects", "24", "--epochs", "1",
              "--fold", "3", "--no-search", "--layers", "7", "--hiddens",
              "9", "--h", "5", "--save_appendix", "_single"])
    assert calls == [(7, 9, "result_sgcn_img_snp_layers7_hidden9_h5")]


def test_permut_seeds_parse_errors(capsys):
    """--permut_seeds input validation fails loudly before any training."""
    for spec, frag in (("", "named no seeds"),
                       ("5:3", "empty"),
                       ("1,2,1", "repeats a seed"),
                       ("a,b", "expected a comma list"),
                       ("-2,-1", "non-negative"),
                       ("1:2:3", "expected a comma list")):
        with pytest.raises(SystemExit):
            # '=' form: argparse would otherwise eat a leading '-' value
            cli.main([f"--permut_seeds={spec}", "--synthetic",
                      "--save_appendix", "_pe"])
        assert frag in capsys.readouterr().err, spec


def test_permut_seeds_batch_dispatch(tmp_path, monkeypatch, capsys):
    """--permut_seeds N:M runs one null experiment per seed in ONE process:
    is_permut_test implied, per-seed results dirs, per-seed shuffles."""
    import iggcn_tpu.train.cv as cvmod

    result = cvmod.CVResult(
        mean_test_loss=1.0, best_acc=0.5, best_acc_std=0.0,
        score_result=np.zeros((3, 1, 5)), durations=[0.0],
        throughput_graphs_per_sec=1.0, regression_summary={})
    calls = []

    def fake_cv(cohort, topo, mcfg, tcfg, **kw):
        calls.append((tcfg.is_permut_test, kw["res_dir"],
                      np.array(cohort.clini_score)))
        return result

    monkeypatch.setattr(cvmod, "cross_validation", fake_cv)
    monkeypatch.chdir(tmp_path)
    cli.main(["--synthetic", "--synthetic_subjects", "24", "--no-search",
              "--epochs", "1", "--fold", "3", "--permut_seeds", "7,9",
              "--save_appendix", "_pb", "--cohort_cache_dir", ""])
    assert len(calls) == 2
    assert all(permut for permut, _, _ in calls)
    assert calls[0][1].endswith(os.path.join("results_permuttest",
                                             "ADNI_pb_permut7"))
    assert calls[1][1].endswith(os.path.join("results_permuttest",
                                             "ADNI_pb_permut9"))
    # different seeds shuffle the subject->score pairing differently
    assert not np.array_equal(calls[0][2], calls[1][2])
    out = capsys.readouterr().out
    assert "[permut] null run 1/2 (Seed4PermutTest=7)" in out
    assert "--permut_null" in out        # points at the report aggregation


def test_permut_seeds_batch_matches_standalone_runs(tmp_path, monkeypatch):
    """The null-batch mode is an AMORTIZATION, not a semantic change: each
    in-process run's fold records are bit-identical to a standalone
    `--isPermutTest --Seed4PermutTest <s>` process (fresh host rng per
    run; the warm jit/cohort caches must not leak state across seeds)."""
    import glob

    monkeypatch.chdir(tmp_path)
    common = ["--synthetic", "--synthetic_subjects", "24", "--no-search",
              "--epochs", "1", "--fold", "3", "--batch_size", "8",
              "--cohort_cache_dir", "./cc"]
    cli.main(common + ["--permut_seeds", "1:2", "--save_appendix", "_batch"])
    cli.main(common + ["--isPermutTest", "--Seed4PermutTest", "1",
                       "--save_appendix", "_single1"])
    root = tmp_path / "results_permuttest"
    batch1 = sorted(glob.glob(str(root / "ADNI_batch_permut1"
                                  / "fold_result_*.npz")))
    single1 = sorted(glob.glob(str(root / "ADNI_single1"
                                   / "fold_result_*.npz")))
    assert len(batch1) == len(single1) == 3
    for pb, ps in zip(batch1, single1):
        with np.load(pb) as zb, np.load(ps) as zs:
            assert set(zb.files) == set(zs.files)
            for k in zb.files:
                assert np.array_equal(zb[k], zs[k]), (pb, k)
    batch2 = sorted(glob.glob(str(root / "ADNI_batch_permut2"
                                  / "fold_result_*.npz")))
    assert len(batch2) == 3
    # distinct seeds hold distinct shuffled score pairings in their records
    with np.load(batch1[0]) as z1, np.load(batch2[0]) as z2:
        assert not np.array_equal(z1["true_scores"], z2["true_scores"])


def test_cmd_input_preserves_shell_quoting(tmp_path, monkeypatch):
    """cmd_input.txt must record a RE-RUNNABLE line: an argument containing
    a space is re-quoted via shlex (review finding: a plain ' '.join
    recorded `--save_appendix _a b`, which argparse rejects on replay)."""
    import argparse
    import shlex

    monkeypatch.chdir(tmp_path)
    ns = argparse.Namespace(isPermutTest=False, save_appendix="_q")
    ns._argv = ["--synthetic", "--save_appendix", "_a b"]
    cli._setup_run_dir(ns)
    cmd = (tmp_path / "results" / "ADNI_q" / "cmd_input.txt").read_text()
    rec = cmd.strip().split()
    assert rec[:2] == ["python", "main.py"]
    assert shlex.split(cmd.strip())[2:] == ns._argv


def test_improves_is_nan_aware():
    """Grid selection must not let a NaN (diverged) combo freeze the
    placeholder: NaN never beats a real loss, a real loss always beats a
    NaN best, and NaN fills only the initial inf placeholder (so an
    all-diverged sweep still reports measured accuracies, not 0.000)."""
    inf, nan = float("inf"), float("nan")
    assert cli._improves(1.0, inf)
    assert cli._improves(nan, inf)          # fills the placeholder
    assert cli._improves(1.0, nan)          # real beats NaN
    assert not cli._improves(nan, 1.0)      # NaN never beats real
    assert not cli._improves(nan, nan)      # keep the first diverged combo
    assert cli._improves(0.5, 1.0) and not cli._improves(2.0, 1.0)


def test_go_attention_impl_flag_threads_to_model_config():
    """`--go_attention_impl` reaches ModelConfig (the GO branch reads it);
    the default stays 'auto' and bogus values die at the parser."""
    import pytest as _pytest

    parser = cli.build_parser()
    for val in ("auto", "dense", "edge"):
        args = parser.parse_args(["--go_attention_impl", val])
        mcfg, _ = cli._fused_cfgs(args, cli._build_dcfg(args), 2, 16)
        assert mcfg.go_attention_impl == val
    args = parser.parse_args([])
    mcfg, _ = cli._fused_cfgs(args, cli._build_dcfg(args), 2, 16)
    assert mcfg.go_attention_impl == "auto"
    with _pytest.raises(SystemExit):
        parser.parse_args(["--go_attention_impl", "sparse"])
