"""Direct unit tests for host-side data plumbing and the importance-masking
math — modules previously covered only through CV integration tests:
`data/sampler.py` (parity imbalanced.py:9-56), `data/impute.py` (parity
util/tool.py:22-111), `data/batching.py` (replaces batch.py/dataloader.py),
`ops/masking.py` (parity kernel/sgcn_img_snp.py:133-151), and
`utils/visualize.py` (parity util/GraphVisualization.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from iggcn_tpu.data.batching import (cohort_batch_arrays, pad_to_batches,
                                     reshape_to_batches)
from iggcn_tpu.data.sampler import imbalanced_sample_indices, pad_epoch_indices


def test_imbalanced_sampler_rebalances_classes():
    """Weight = 1/class-count with replacement: a 90/10 class split draws
    roughly 50/50 (parity imbalanced.py:33-56)."""
    y = np.array([0] * 90 + [1] * 10)
    idx = imbalanced_sample_indices(y, np.random.default_rng(0),
                                    num_samples=20_000)
    assert idx.shape == (20_000,)
    assert idx.min() >= 0 and idx.max() < 100
    frac1 = (y[idx] == 1).mean()
    assert 0.47 < frac1 < 0.53, frac1
    # default num_samples = len(y), reproducible under the same rng
    a = imbalanced_sample_indices(y, np.random.default_rng(7))
    b = imbalanced_sample_indices(y, np.random.default_rng(7))
    assert a.shape == (100,)
    np.testing.assert_array_equal(a, b)


def test_pad_epoch_indices():
    idx = np.arange(10, dtype=np.int64)
    padded, w = pad_epoch_indices(idx, 4)
    assert padded.shape == (12,) and w.shape == (12,)
    np.testing.assert_array_equal(padded[:10], idx)
    np.testing.assert_array_equal(padded[10:], [idx[0], idx[0]])
    np.testing.assert_array_equal(w, [1.0] * 10 + [0.0] * 2)
    # exact multiple: unchanged, all-ones weights
    padded, w = pad_epoch_indices(idx[:8], 4)
    assert padded.shape == (8,)
    assert (w == 1.0).all()


def test_knn_impute_is_leakage_safe():
    """The imputer is FIT on the train split only; a val NaN is filled from
    train neighbors, so changing OTHER val rows must not change the
    imputation (parity util/tool.py:22-73)."""
    from iggcn_tpu.data.adni import MinMaxScaler
    from iggcn_tpu.data.impute import knn_impute_scores

    rng = np.random.default_rng(0)
    train = rng.random((30, 9)).astype(np.float64)
    val = rng.random((8, 9)).astype(np.float64)
    val[0, 5] = np.nan
    scaler = MinMaxScaler().fit(train)

    out1 = knn_impute_scores([train, val.copy()], scaler)
    # adversarial perturbation (the weak random version let the
    # fit-on-all-splits leakage mutation SURVIVE — mutation audit): make the
    # other val rows zero-distance neighbors of the NaN row with a wildly
    # different value in the missing column, so a leaky imputer MUST move
    val2 = val.copy()
    val2[3:] = val[0]
    val2[3:, 5] = 123.0
    out2 = knn_impute_scores([train, val2], scaler)
    assert out1[0].shape == (30, 3) and out1[1].shape == (8, 3)
    assert np.isfinite(out1[1]).all()
    np.testing.assert_allclose(out1[1][0], out2[1][0], rtol=1e-12)

    # single-score mode selects exactly that column
    single = knn_impute_scores([train, val.copy()], scaler,
                               clinical_score_index=7)
    assert single[0].shape == (30, 1)
    np.testing.assert_allclose(single[0][:, 0], out1[0][:, 1], rtol=1e-6)


def test_pad_to_batches_and_reshape(cohort):
    arrays = cohort_batch_arrays(cohort)
    n = arrays["y"].shape[0]
    padded = pad_to_batches(arrays, 16)
    total = -(-n // 16) * 16
    assert padded["y"].shape[0] == total
    np.testing.assert_array_equal(padded["w"],
                                  [1.0] * n + [0.0] * (total - n))
    np.testing.assert_array_equal(padded["x"][:n], arrays["x"])
    assert (padded["x"][n:] == 0).all()
    batched = reshape_to_batches(padded, 16)
    assert batched["x"].shape == (total // 16, 16) + arrays["x"].shape[1:]
    np.testing.assert_array_equal(batched["x"].reshape(total, *arrays["x"].shape[1:]),
                                  padded["x"])
    # explicit pad_to_count must be honored (fold-parallel equalization)
    wider = pad_to_batches(arrays, 16, pad_to_count=total + 16)
    assert wider["y"].shape[0] == total + 16
    with pytest.raises(AssertionError):
        pad_to_batches(arrays, 16, pad_to_count=n - 1)


def test_edge_probability_matches_reference_loop():
    """Dense rank-1 edge scorer == the reference's explicit per-edge
    sigmoid([x_r || x_c] @ prob_bias) loop (kernel/sgcn_img_snp.py:139-145)."""
    from iggcn_tpu.ops.masking import edge_probability_dense, importance_masks

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 3)).astype(np.float32)
    bias = rng.normal(size=(6, 1)).astype(np.float32)
    ep = np.asarray(edge_probability_dense(jnp.asarray(x), jnp.asarray(bias)))
    for b in range(2):
        for r in range(5):
            for c in range(5):
                cat = np.concatenate([x[b, r], x[b, c]])
                want = 1.0 / (1.0 + np.exp(-(cat @ bias[:, 0])))
                np.testing.assert_allclose(ep[b, r, c], want, rtol=1e-5)

    # importance_masks composition: raw prob on x, sigmoid on snps
    adj = np.abs(rng.normal(size=(2, 5, 5))).astype(np.float32)
    prob = rng.normal(size=(5, 3)).astype(np.float32)
    snps = rng.random((2, 7)).astype(np.float32)
    snps_prob = rng.normal(size=(1, 7)).astype(np.float32)
    m = importance_masks(jnp.asarray(x), jnp.asarray(adj), jnp.asarray(prob),
                         jnp.asarray(bias), jnp.asarray(snps),
                         jnp.asarray(snps_prob))
    np.testing.assert_allclose(np.asarray(m.x_masked), x * prob, rtol=1e-6)
    ep2 = np.asarray(edge_probability_dense(jnp.asarray(x * prob),
                                            jnp.asarray(bias)))
    np.testing.assert_allclose(np.asarray(m.adj_masked), adj * ep2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.snps_masked),
                               snps / (1.0 + np.exp(-snps_prob)), rtol=1e-5)


def test_graph_visualization(tmp_path):
    from iggcn_tpu.utils.visualize import GraphVisualization

    gv = GraphVisualization()
    gv.addEdge(0, 1)
    gv.add_edges([(1, 2), (1, 3)])
    gv.set_labels({0: "root"})
    pytest.importorskip("networkx")
    pytest.importorskip("matplotlib")
    out = tmp_path / "dag.png"
    gv.visualize(str(out))
    assert out.exists() and out.stat().st_size > 0


def test_permute_regression_targets():
    """Permutation-test null on a cohort: subject->score pairing shuffles
    deterministically (parity sgcn_data.py:205-208), everything else is
    untouched — this must also cover the synthetic CLI path."""
    from iggcn_tpu.data.adni import permute_regression_targets, synthetic_cohort

    cohort = synthetic_cohort(np.random.default_rng(0), num_subjects=32)
    p1 = permute_regression_targets(cohort, seed=3)
    p2 = permute_regression_targets(cohort, seed=3)
    np.testing.assert_array_equal(p1.clini_score, p2.clini_score)
    assert not np.array_equal(p1.clini_score, cohort.clini_score)
    np.testing.assert_array_equal(np.sort(p1.clini_score, axis=0),
                                  np.sort(cohort.clini_score, axis=0))
    np.testing.assert_array_equal(p1.x, cohort.x)
    np.testing.assert_array_equal(p1.y, cohort.y)
    # demographics rows are permuted too (they feed the imputation path),
    # drawn from the same RandomState sequence as the reference
    assert not np.array_equal(p1.demographics, cohort.demographics,
                              equal_nan=True)


def test_mse_loss_rejects_shape_mismatch():
    from iggcn_tpu.train.losses import mse_loss

    ok = mse_loss(jnp.ones((4, 3)), jnp.zeros((4, 3)))
    assert float(ok) == 1.0
    with pytest.raises(ValueError, match="shape mismatch"):
        mse_loss(jnp.ones((4, 3)), jnp.zeros((4, 1)))


def test_cli_single_score_coerces_num_regr(capsys, monkeypatch, tmp_path):
    """--clinical_score_index with an explicit conflicting head width is a
    parser error; with the default it coerces the model to a single head."""
    import main as cli

    with pytest.raises(SystemExit):
        cli.main(["--clinical_score_index", "5", "--num_regr", "2",
                  "--synthetic"])
    assert "num_regr" in capsys.readouterr().err

    # the coercion itself: capture the ModelConfig the CLI hands the trainer
    import iggcn_tpu.train.cv as cvmod
    captured = {}

    def fake_cv(cohort, topo, mcfg, tcfg, **kw):
        captured["num_regr"] = mcfg.num_regr
        raise SystemExit(0)

    monkeypatch.setattr(cvmod, "cross_validation", fake_cv)
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit):
        cli.main(["--clinical_score_index", "5", "--synthetic",
                  "--synthetic_subjects", "24", "--epochs", "1",
                  "--fold", "3", "--save_appendix", "_coerce"])
    assert captured["num_regr"] == 1


def test_metrics_match_sklearn():
    """Hand-rolled metrics (midrank AUC, weighted F1, sens/spec, Pearson/R2/
    RMSE) == sklearn/scipy on random data incl. ties (parity
    kernel/train_eval_sgcn_img_snps.py:602-670's sklearn calls)."""
    from sklearn.metrics import f1_score, r2_score as sk_r2, roc_auc_score

    from iggcn_tpu.train import metrics as M

    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, size=200)
    scores = np.round(rng.random(200), 2)   # rounding forces tied scores
    np.testing.assert_allclose(M.roc_auc_binary(y, scores),
                               roc_auc_score(y, scores), rtol=1e-12)

    pred = rng.integers(0, 2, size=200)
    np.testing.assert_allclose(M.f1_weighted(y, pred),
                               f1_score(y, pred, average="weighted"),
                               rtol=1e-12)
    sen, spe = M.sensitivity_specificity(y, pred)
    tp = ((y == 1) & (pred == 1)).sum()
    fn = ((y == 1) & (pred == 0)).sum()
    tn = ((y == 0) & (pred == 0)).sum()
    fp = ((y == 0) & (pred == 1)).sum()
    np.testing.assert_allclose(sen, tp / (tp + fn))
    np.testing.assert_allclose(spe, tn / (tn + fp))

    a = rng.normal(size=50)
    b = 0.6 * a + rng.normal(size=50)
    np.testing.assert_allclose(M.pearson_r(a, b), np.corrcoef(a, b)[0, 1],
                               rtol=1e-10)
    np.testing.assert_allclose(M.r2_score(a, b), sk_r2(a, b), rtol=1e-10)
    np.testing.assert_allclose(M.rmse(a, b), np.sqrt(((a - b) ** 2).mean()),
                               rtol=1e-12)


def test_pad_epoch_indices_empty_split_errors():
    from iggcn_tpu.data.sampler import pad_epoch_indices
    with pytest.raises(ValueError, match="empty training split"):
        pad_epoch_indices(np.array([], np.int64), 8)


def test_synthetic_cohort_rejects_wide_num_regr():
    from iggcn_tpu.data.adni import synthetic_cohort
    with pytest.raises(ValueError, match="at most 3"):
        synthetic_cohort(np.random.default_rng(0), num_subjects=4, num_regr=4)
