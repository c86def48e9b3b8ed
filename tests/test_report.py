"""Results aggregator (`tools/report.py`): summary rows from fold records
and legacy score npys, and the permutation p-value the reference never
computes for its own --isPermutTest mode."""
import os

import numpy as np
import pytest

from iggcn_tpu.tools import report


def _write_records(d, tag, score, kind="fused", corr_noise=None, seed=0):
    """score: (folds, E, 5). Writes one fold_result npz per fold.
    `corr_noise`: when set, fused records also carry true/pred score
    arrays with pred = true + N(0, corr_noise) (controls the pooled
    correlation)."""
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    for f in range(score.shape[0]):
        path = os.path.join(d, f"fold_result_{tag}_fold_{f}.npz")
        if kind == "generic":
            np.savez(path, accs=score[f, :, 0],
                     val_losses=np.zeros(score.shape[1]),
                     losses=np.zeros(score.shape[1]),
                     meta=np.zeros(5, np.int64))
        else:
            extra = {}
            if corr_noise is not None:
                ts = rng.normal(size=(10, 2))
                extra = dict(
                    true_scores=ts,
                    pred_scores=ts + rng.normal(0, corr_noise, ts.shape),
                    score_names=np.asarray(["tau", "mmse"]))
            np.savez(path, score_result_epoch=score[f],
                     losses=np.zeros(score.shape[1]),
                     meta=np.zeros(4, np.int64), **extra)


def _score(folds=3, epochs=4, best_epoch=2, best=0.9, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.uniform(0.4, 0.6, (folds, epochs, 5))
    s[:, best_epoch, 0] = best         # unambiguous argmax of fold-mean acc
    return s


def test_collect_fused_records(tmp_path):
    d = str(tmp_path / "run")
    score = _score()
    _write_records(d, "result_x_layers2", score)
    rows = report.collect_dir(d)
    assert len(rows) == 1
    r = rows[0]
    assert r["tag"] == "result_x_layers2"
    # best_epoch is 1-BASED (matches the trainer's `epoch:{e+1}` log lines):
    # the planted argmax at index 2 reports as epoch 3
    assert (r["folds"], r["epochs"], r["best_epoch"]) == (3, 4, 3)
    np.testing.assert_allclose(r["acc"], 0.9)
    np.testing.assert_allclose(r["auc"], score[:, 2, 1].mean())


def test_collect_generic_records_and_legacy_npy(tmp_path):
    d = str(tmp_path / "run")
    _write_records(d, "generic_GIN_layers2_hidden8_h2", _score(best=0.8),
                   kind="generic")
    # legacy aggregated npy for a DIFFERENT config
    legacy = _score(best=0.7, seed=1)
    os.makedirs(d, exist_ok=True)
    np.save(os.path.join(d, "result_old_cfg.npy"), legacy)
    rows = report.collect_dir(d)
    tags = {r["tag"] for r in rows}
    assert tags == {"generic_GIN_layers2_hidden8_h2", "result_old_cfg"}
    gen = next(r for r in rows if r["tag"].startswith("generic"))
    np.testing.assert_allclose(gen["acc"], 0.8)
    assert np.isnan(gen["auc"])        # generic records carry acc only


def test_legacy_npy_skipped_when_records_exist(tmp_path):
    d = str(tmp_path / "run")
    score = _score(best=0.9)
    _write_records(d, "result_x", score)
    # a stale aggregate of the same config must not double-report
    np.save(os.path.join(d, "result_x.npy"), _score(best=0.1, seed=2))
    rows = report.collect_dir(d)
    assert len(rows) == 1 and rows[0]["acc"] == pytest.approx(0.9)


def test_permutation_pvalue(tmp_path):
    obs_dir = str(tmp_path / "obs")
    _write_records(obs_dir, "result_x", _score(best=0.9))
    null_dirs = []
    # 4 null runs: best accs 0.95, 0.5, 0.5, 0.5 -> one >= observed
    for i, best in enumerate((0.95, 0.5, 0.5, 0.5)):
        nd = str(tmp_path / f"null{i}")
        _write_records(nd, "result_x", _score(best=best, seed=10 + i))
        null_dirs.append(nd)
    obs_rows = report.collect_dir(obs_dir)
    pv = report.permutation_pvalue(obs_rows, null_dirs)
    assert len(pv) == 1
    assert pv[0]["null_n"] == 4
    assert pv[0]["p_value"] == pytest.approx((1 + 1) / (1 + 4))


def test_collect_regression_and_pvalue(tmp_path):
    obs = str(tmp_path / "obs")
    # near-perfect predictions -> corr ~ 1
    _write_records(obs, "result_x", _score(), corr_noise=0.01)
    reg = report.collect_regression(obs)
    assert [r["score"] for r in reg] == ["tau", "mmse"]
    assert all(r["corr"] > 0.95 for r in reg)
    # null runs: pure-noise predictions -> corr ~ 0
    null_dirs = []
    for i in range(4):
        nd = str(tmp_path / f"null{i}")
        _write_records(nd, "result_x", _score(seed=20 + i), corr_noise=50.0,
                       seed=30 + i)
        null_dirs.append(nd)
    pv = report.permutation_pvalue_regression(reg, null_dirs)
    assert len(pv) == 2
    for r in pv:
        assert r["null_n"] == 4
        assert r["p_value"] == pytest.approx(1 / 5)   # no null beats corr~1


def test_replication_rows_across_seed_dirs(tmp_path, capsys):
    """When the same tag appears in >= 2 dirs (the per-seed layout of
    --cv_seeds), the report recomputes the CLI's 'Replication over N
    seeds' statistic from the records alone and prints it as a table."""
    dirs, bests = [], (0.9, 0.8, 0.7)
    for s, best in enumerate(bests):
        d = str(tmp_path / f"run_seed{s}")
        _write_records(d, "result_x", _score(best=best, seed=60 + s))
        dirs.append(d)
    # a tag present in only ONE dir must not produce a replication row
    _write_records(dirs[0], "result_solo", _score(best=0.5, seed=70))
    rows = []
    for d in dirs:
        rows.extend(report.collect_dir(d))
    rep = report.replication_rows(rows)
    assert [r["tag"] for r in rep] == ["result_x"]
    r = rep[0]
    assert r["runs"] == 3
    assert r["acc_mean"] == pytest.approx(np.mean(bests))
    assert r["acc_std"] == pytest.approx(np.std(bests, ddof=1))
    assert (r["acc_min"], r["acc_max"]) == pytest.approx((0.7, 0.9))
    # and the CLI prints it
    assert report.main(dirs) == 0
    out = capsys.readouterr().out
    assert "acc_mean" in out and f"{np.mean(bests):.4f}" in out


def test_cli_table_and_csv(tmp_path, capsys):
    d = str(tmp_path / "run")
    _write_records(d, "result_x", _score())
    csv_path = str(tmp_path / "out.csv")
    rc = report.main([d, "--csv", csv_path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "result_x" in out and "0.9000" in out
    with open(csv_path) as fh:
        header = fh.readline().strip().split(",")
    assert header == list(report.COLUMNS)


def test_cli_empty_dir_fails(tmp_path):
    assert report.main([str(tmp_path)]) == 1


def test_cli_plot_writes_figures(tmp_path, capsys):
    """--plot renders training curves per tag and, with --permut_null,
    null histograms for both statistics next to the observed records."""
    pytest.importorskip("matplotlib")
    obs = str(tmp_path / "obs")
    _write_records(obs, "result_x", _score(best=0.9), corr_noise=0.01)
    null_dirs = []
    for i in range(3):
        nd = str(tmp_path / f"null{i}")
        _write_records(nd, "result_x", _score(best=0.5, seed=40 + i),
                       corr_noise=50.0, seed=50 + i)
        null_dirs.append(nd)
    rc = report.main([obs, "--permut_null", *null_dirs, "--plot"])
    assert rc == 0
    for fname in ("report_curves_result_x.png", "report_null_result_x.png",
                  "report_null_result_x_tau.png",
                  "report_null_result_x_mmse.png"):
        path = os.path.join(obs, fname)
        assert os.path.getsize(path) > 2000, fname
        with open(path, "rb") as fh:
            assert fh.read(8) == b"\x89PNG\r\n\x1a\n", fname
    # the extra plotting keys must not leak into the printed tables
    out = capsys.readouterr().out
    assert "nulls" not in out


def test_cli_end_to_end_experiment_records(tmp_path):
    """The records a REAL CLI experiment writes are readable by the report
    tool (integration with the resume records of test_resume.py's paths)."""
    from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
    from iggcn_tpu.data.adni import synthetic_cohort
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.train.cv import cross_validation

    rng = np.random.default_rng(5)
    cohort = synthetic_cohort(rng, num_subjects=36)
    topo = synthetic_topology(np.random.default_rng(5))
    d = str(tmp_path / "res")
    os.makedirs(d)
    cross_validation(
        cohort, topo,
        ModelConfig(num_layers=1, hidden=4, hidden_linear=8, l_dim=8),
        TrainConfig(epochs=2, batch_size=8, folds=3, seed=3,
                    loss=LossWeights(disease=1.0)),
        res_dir=d, result_file_name="result_e2e", verbose=False)
    rows = report.collect_dir(d)
    assert len(rows) == 1
    assert rows[0]["tag"] == "result_e2e"
    assert rows[0]["folds"] == 3 and rows[0]["epochs"] == 2
    assert 0.0 <= rows[0]["acc"] <= 1.0
    # the real records also carry the pooled-regression surface
    reg = report.collect_regression(d)
    assert [r["score"] for r in reg] == ["tau", "adas13", "mmse"]
    assert all(np.isfinite(r["rmse"]) for r in reg)
    # ...and the REAL importance npys feed the stability aggregation
    imp = report.importance_stability([d], top_k=5)
    kinds = {r["kind"] for r in imp}
    assert kinds == {"node", "snps"}
    assert all(r["unit"] == "fold" and r["n_units"] == 3 for r in imp)
    assert all(0.0 < r["mean_importance"] < 1.0 for r in imp)
    # (a mean-top feature can in principle miss every per-fold top-k, so
    # only the range is asserted here; the math is pinned by the unit tests)
    assert all(0.0 <= r["stability"] <= 1.0 for r in imp)


def _logit(p):
    p = np.asarray(p, np.float64)
    return np.log(p / (1.0 - p))


def _write_importance(d, tag, fold, roi_probs, snp_probs=None):
    """Trainer-format importance npys: raw logits, node as (rois, feat),
    snps as the (1, n_snps) logit ROW the flagship's `snps_prob` has."""
    os.makedirs(d, exist_ok=True)
    roi = np.stack([_logit(roi_probs)] * 3, axis=1)      # (rois, feat=3)
    np.save(os.path.join(d, f"node_importance_{tag}_fold_{fold}.npy"), roi)
    if snp_probs is not None:
        np.save(os.path.join(d, f"snps_importance_{tag}_fold_{fold}.npy"),
                _logit(snp_probs)[None, :])


def test_importance_stability_across_runs(tmp_path):
    """Two per-seed dirs -> run-unit stability: a feature in both runs'
    top-k scores 1.0, one run's only 0.5; means are in sigmoid units."""
    base = np.full(8, 0.2)
    a, b = base.copy(), base.copy()
    a[[1, 4]] = [0.9, 0.8]          # run A tops: 1, 4
    b[[1, 6]] = [0.85, 0.7]         # run B tops: 1, 6
    _write_importance(str(tmp_path / "s1"), "result_x", 0, a)
    _write_importance(str(tmp_path / "s2"), "result_x", 0, b)
    rows = report.importance_stability(
        [str(tmp_path / "s1"), str(tmp_path / "s2")], top_k=2)
    assert [r["unit"] for r in rows] == ["run", "run"]
    assert all(r["n_units"] == 2 for r in rows)
    by_feat = {r["feature"]: r for r in rows}
    assert set(by_feat) == {"ROI 1", "ROI 4"}   # top-2 of the mean vector
    assert by_feat["ROI 1"]["stability"] == 1.0
    assert by_feat["ROI 4"]["stability"] == 0.5
    assert by_feat["ROI 1"]["mean_importance"] == pytest.approx(
        (0.9 + 0.85) / 2, abs=1e-9)


def test_importance_stability_single_run_fold_unit(tmp_path):
    """One dir -> fold-unit stability, with SNP importances alongside."""
    d = str(tmp_path / "run")
    for fold, tops in enumerate(([0, 2], [0, 3])):
        roi = np.full(6, 0.3)
        roi[tops] = 0.9
        snp = np.full(5, 0.1)
        snp[1] = 0.95
        _write_importance(d, "result_x", fold, roi, snp)
    rows = report.importance_stability([d], top_k=2)
    nodes = [r for r in rows if r["kind"] == "node"]
    snps = [r for r in rows if r["kind"] == "snps"]
    assert all(r["unit"] == "fold" and r["n_units"] == 2 for r in rows)
    node_by_feat = {r["feature"]: r["stability"] for r in nodes}
    assert node_by_feat["ROI 0"] == 1.0          # top in both folds
    assert snps[0]["feature"] == "SNP 1" and snps[0]["stability"] == 1.0


def test_importance_mask_units(tmp_path):
    """Guide-family mask logits aggregate in softmax KEEP-PROBABILITY
    units (column 1), not sigmoid: logits (d, 2) with rows [0, L] have
    keep-prob sigmoid(L), pinning both the axis and the normalization."""
    d = str(tmp_path / "run")
    os.makedirs(d)
    keep = np.array([0.9, 0.2, 0.6, 0.4])
    logits = np.stack([np.zeros(4), _logit(keep)], axis=1)     # (4, 2)
    np.save(os.path.join(d, "mask_importance_result_g_fold_0.npy"), logits)
    np.save(os.path.join(d, "mask_importance_result_g_fold_1.npy"), logits)
    rows = report.importance_stability([d], top_k=2)
    assert [r["kind"] for r in rows] == ["mask", "mask"]
    assert rows[0]["feature"] == "feature 0"
    assert rows[0]["mean_importance"] == pytest.approx(0.9, abs=1e-9)
    assert rows[1]["feature"] == "feature 2"
    assert all(r["stability"] == 1.0 and r["n_units"] == 2 for r in rows)


def test_cli_importance_table_and_plot(tmp_path, capsys):
    """--importance prints the stability table (no plot-only keys leak);
    --plot adds one mean-importance bar png per (kind, tag)."""
    pytest.importorskip("matplotlib")
    d = str(tmp_path / "run")
    _write_records(d, "result_x", _score())
    roi = np.full(6, 0.2)
    roi[3] = 0.9
    _write_importance(d, "result_x", 0, roi, np.full(4, 0.5))
    rc = report.main([d, "--importance", "--importance_top_k", "3",
                      "--plot"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ROI 3" in out and "stability" in out
    assert "mean_vector" not in out
    for kind in ("node", "snps"):
        path = os.path.join(d, f"report_importance_{kind}_result_x.png")
        assert os.path.getsize(path) > 2000, path
        with open(path, "rb") as fh:
            assert fh.read(8) == b"\x89PNG\r\n\x1a\n", path


def test_cli_importance_csv(tmp_path):
    """--csv with --importance writes the sibling _importance.csv."""
    d = str(tmp_path / "run")
    _write_records(d, "result_x", _score())
    roi = np.full(6, 0.2)
    roi[3] = 0.9
    _write_importance(d, "result_x", 0, roi)
    csv_path = str(tmp_path / "out.csv")
    rc = report.main([d, "--importance", "--csv", csv_path])
    assert rc == 0
    body = open(str(tmp_path / "out_importance.csv")).read()
    assert body.splitlines()[0].startswith("tag,kind,feature,")
    assert "ROI 3" in body
    assert os.path.exists(csv_path)          # the summary csv still writes
    # bad top_k fails before any table is printed
    assert report.main([d, "--importance", "--importance_top_k", "0"]) == 1


def test_cli_importance_none_found(tmp_path, capsys):
    d = str(tmp_path / "run")
    _write_records(d, "result_x", _score())
    rc = report.main([d, "--importance"])
    assert rc == 0
    assert "no importance npys" in capsys.readouterr().err


def test_duplicate_results_dirs_are_ignored(tmp_path, capsys):
    """The same dir given twice (e.g. an overlapping shell glob) must not
    double-count tags or fabricate a self-'replication' table (review
    finding)."""
    d = str(tmp_path / "run")
    _write_records(d, "result_x_layers2", _score())
    rc = report.main([d, d + os.sep])        # second spelling, same realpath
    assert rc == 0
    out, err = capsys.readouterr()
    assert "ignoring duplicate results dir" in err
    assert out.count("result_x_layers2") == 1      # one summary row
    assert "acc_mean" not in out                   # no replication table


def test_importance_width_mismatch_across_dirs_is_skipped(tmp_path, capsys):
    """A 90-wide and a 270-wide (multifusion) run sharing a tag must be
    skipped with a warning, not crash np.stack (review finding)."""
    _write_importance(str(tmp_path / "a"), "result_x", 0,
                      np.random.default_rng(0).random((90, 3)))
    _write_importance(str(tmp_path / "b"), "result_x", 0,
                      np.random.default_rng(1).random((270, 3)))
    rows = report.importance_stability(
        [str(tmp_path / "a"), str(tmp_path / "b")])
    assert rows == []
    assert "widths" in capsys.readouterr().err
