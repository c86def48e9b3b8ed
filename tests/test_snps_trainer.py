"""SNP-only GO-network classifier trainer (intended semantics of the broken
reference `kernel/train_eval_snps.py`, SURVEY §2a): learning, the full
5-metric surface (acc/auc/f1/sen/spe score matrix, parity `:210,242-246`),
the per-epoch imbalance-weighted resampling, and the csv-cohort CLI route
(`--model Gene_ontology_network --snps_csv_root ...`)."""
import numpy as np
import pytest

import iggcn_tpu.train.snps_trainer as st
from iggcn_tpu.train.snps_trainer import cross_validation_snps


def _separable_snps(topo, s=60, noise=0.05, p_class1=0.5, seed=0):
    rng = np.random.default_rng(seed)
    y = (rng.random(s) < p_class1).astype(np.int64)
    mu = rng.random((2, topo.num_snps))
    snps = np.clip(mu[y] + rng.normal(0, noise, (s, topo.num_snps)), 0, 1
                   ).astype(np.float32)
    return snps, y


def test_snps_cv_learns_separable_labels(topo, tmp_path):
    snps, y = _separable_snps(topo)
    result_path = tmp_path / "score.npy"
    res = cross_validation_snps(snps, y, topo, folds=3, epochs=8,
                                batch_size=10, lr=3e-3,
                                result_path=str(result_path))
    assert res.accs.shape == (3, 8)
    assert np.isfinite(res.mean_loss)
    # separable data: best epoch should beat chance comfortably
    assert res.best_acc > 0.65
    assert res.best_acc_std >= 0.0
    # full 5-metric surface, persisted like the reference's score_result npy
    assert res.score_result.shape == (3, 8, 5)
    saved = np.load(result_path)
    np.testing.assert_array_equal(saved, res.score_result)
    acc, auc, f1, sen, spe = res.score_result[..., 0], *[
        res.score_result[..., i] for i in range(1, 5)]
    for m, name in [(acc, "acc"), (auc, "auc"), (f1, "f1"), (sen, "sen"),
                    (spe, "spe")]:
        assert np.all((m >= 0.0) & (m <= 1.0)), name
    # AUC on near-separable data must end up strong, and the metrics must
    # not be copies of each other (a broken column mapping would show here)
    assert auc.max() > 0.8
    assert not np.array_equal(acc, auc)
    # accs column == score_result acc column (one source of truth)
    np.testing.assert_array_equal(res.accs, acc)


def test_snps_cv_resamples_imbalanced_train_split(topo, monkeypatch):
    """The trainer draws a fresh imbalance-weighted resample of each fold's
    TRAIN split every epoch (intended `train_eval_snps.py:159` with the
    missing `imbalanced_snps` sampler) — the spy proves the sampler output
    actually drives the batches, and the drawn class mix is rebalanced."""
    snps, y = _separable_snps(topo, s=60, p_class1=0.15, seed=3)
    calls = []
    real = st.imbalanced_sample_indices

    def spy(labels, rng, num_samples=None):
        idx = real(labels, rng, num_samples)
        calls.append((np.asarray(labels), np.asarray(idx)))
        return idx

    monkeypatch.setattr(st, "imbalanced_sample_indices", spy)
    folds, epochs = 3, 4
    cross_validation_snps(snps, y, topo, folds=folds, epochs=epochs,
                          batch_size=10, lr=3e-3)
    assert len(calls) == folds * epochs
    for labels, idx in calls:
        # drawn WITH replacement from the train split, rebalanced to ~50/50
        # (1/class-count weights, parity imbalanced.py:33-56)
        assert len(idx) == len(labels)
        frac1 = labels[idx].mean()
        assert 0.25 < frac1 < 0.75, (
            f"epoch draw kept the 15/85 imbalance (class-1 frac {frac1:.2f})")


def test_snps_mlp_baseline_runs(topo):
    snps, y = _separable_snps(topo, s=40, seed=5)
    res = cross_validation_snps(snps, y, topo, folds=3, epochs=4,
                                batch_size=8, lr=3e-3, model_kind="mlp")
    assert res.score_result.shape == (3, 4, 5)
    assert np.isfinite(res.mean_loss)


@pytest.fixture()
def csv_cohort_root(tmp_path):
    """Reference-layout standalone SNP csv cohort
    (<root>/data_AH/{snp,dia}.csv, snps_graph.py:295-331)."""
    base = tmp_path / "data_AH"
    base.mkdir()
    rng = np.random.default_rng(11)
    s = 36
    y = rng.integers(0, 2, s)
    mu = rng.random((2, 54))
    raw = np.clip(mu[y] + rng.normal(0, 0.05, (s, 54)), 0, 1)
    (base / "snp.csv").write_text(
        ",".join(f"rs{i}" for i in range(54)) + "\n"
        + "\n".join(",".join(f"{v:.4f}" for v in r) for r in raw) + "\n")
    (base / "dia.csv").write_text("dia\n" + "\n".join(map(str, y)) + "\n")
    return tmp_path


def test_cli_go_network_csv_end_to_end(csv_cohort_root, tmp_path,
                                       monkeypatch, capsys):
    """`--model Gene_ontology_network --snps_csv_root ...` trains the bare
    GO network on the csv cohort (GO source files absent -> synthetic
    topology fallback) and writes the score npy + result log."""
    import main as cli

    workdir = tmp_path / "work"
    workdir.mkdir()
    monkeypatch.chdir(workdir)
    cli.main(["--model", "Gene_ontology_network", "--disease_id", "0",
              "--epochs", "2", "--fold", "3", "--batch_size", "8",
              "--snps_csv_root", str(csv_cohort_root),
              "--save_appendix", "_gocsv"])
    out = capsys.readouterr().out
    assert "SNP csv cohort: 36 subjects" in out
    res_dir = workdir / "results" / "ADNI_gocsv"
    log = (res_dir / "log.txt").read_text()
    assert "SNP-only, Gene_ontology_network" in log
    scores = np.load(res_dir / "result_snps_go.npy")
    assert scores.shape == (3, 2, 5)
    assert np.all((scores >= 0.0) & (scores <= 1.0))


@pytest.mark.parametrize("kind", ["go", "mlp"])
def test_bundle_export_roundtrips_to_serving(topo, tmp_path, kind):
    """`bundle_dir` writes one loadable serving bundle per fold; the rebuilt
    model serves the training cohort with well-formed probabilities that
    reproduce the trainer's best fold accuracy surface."""
    from iggcn_tpu.predict import batched_forward_snps
    from iggcn_tpu.tools.serve import load_bundle

    snps, y = _separable_snps(topo)
    cross_validation_snps(snps, y, topo, folds=3, epochs=4, batch_size=10,
                          lr=3e-3, model_kind=kind,
                          bundle_dir=str(tmp_path))
    bundles = sorted(tmp_path.glob(f"serving_bundle_snps_{kind}_fold_*.npz"))
    assert len(bundles) == 3
    model, params, stats = load_bundle(str(bundles[0]))
    assert type(model).__name__ == ("GeneOntologyNetwork" if kind == "go"
                                    else "MLPModel")
    out = batched_forward_snps(model, params, stats, snps, batch_size=16)
    assert out["prob"].shape == (len(y),)
    assert np.all((out["prob"] >= 0) & (out["prob"] <= 1))
    np.testing.assert_array_equal(out["pred"], (out["prob"] > 0.5))
    # the exported params carry the learned signal, not init noise
    assert np.mean(out["pred"] == y) > 0.6


def test_snps_serving_bf16_really_serves_bf16(topo):
    """`dtype=bfloat16` must reach the compiled program's inputs (a silent
    fp32 fallback once shipped: the pad helper force-cast to float32)."""
    import jax
    import jax.numpy as jnp

    from iggcn_tpu.models.baselines import MLPModel
    from iggcn_tpu.predict import (batched_forward_snps,
                                   make_snps_forward_scan)

    model = MLPModel()
    snps, _ = _separable_snps(topo, s=9)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((4, topo.num_snps)))["params"]
    scan = make_snps_forward_scan(model)
    seen = []

    def spy(params, batch_stats, sb):
        seen.append((sb.dtype, jax.tree_util.tree_leaves(params)[0].dtype))
        return scan(params, batch_stats, sb)

    fp32 = batched_forward_snps(model, params, {}, snps, batch_size=8,
                                forward_scan=spy)
    bf16 = batched_forward_snps(model, params, {}, snps, batch_size=8,
                                dtype=jnp.bfloat16, forward_scan=spy)
    assert seen[0] == (jnp.float32, jnp.float32)
    assert seen[1] == (jnp.bfloat16, jnp.bfloat16)
    assert bf16["prob"].dtype == np.float32          # host outputs stay fp32
    np.testing.assert_allclose(bf16["prob"], fp32["prob"], atol=0.05)
