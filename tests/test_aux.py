"""Auxiliary parity components: statistics, classify report, checkpoint
round-trip, SNP MLP baseline."""
import jax
import jax.numpy as jnp
import numpy as np

from iggcn_tpu.data.statistics import dataset_statistics
from iggcn_tpu.data.tu import synthetic_tu_dataset
from iggcn_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from iggcn_tpu.train.metrics import classify_report
from iggcn_tpu.train.snps_trainer import cross_validation_snps


def test_dataset_statistics():
    ds = synthetic_tu_dataset(np.random.default_rng(0), num_graphs=20,
                              n_min=5, n_max=9)
    s = dataset_statistics(ds, "synthetic")
    assert s["graphs"] == 20
    assert 5 <= s["nodes"] <= 9
    assert s["classes"] == 2
    assert s["edges"] > 0


def test_classify_report_against_sklearn():
    from sklearn.metrics import precision_recall_fscore_support

    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 3, 60)
    y_pred = rng.integers(0, 3, 60)
    acc, p, r, f1, per_class = classify_report(y_true, y_pred)
    sp, sr, sf, _ = precision_recall_fscore_support(
        y_true, y_pred, average="weighted", zero_division=0)
    np.testing.assert_allclose(acc, np.mean(y_true == y_pred))
    np.testing.assert_allclose(p, sp, atol=1e-9)
    np.testing.assert_allclose(r, sr, atol=1e-9)
    np.testing.assert_allclose(f1, sf, atol=1e-9)
    assert len(per_class) == 3


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    stats = {"bn": {"mean": jnp.zeros((3,)) + 0.5}}
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, params, stats)
    template = {"params": jax.tree_util.tree_map(jnp.zeros_like, params),
                "batch_stats": jax.tree_util.tree_map(jnp.zeros_like, stats)}
    restored = load_checkpoint(path, template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(params["w"]))
    np.testing.assert_array_equal(
        np.asarray(restored["batch_stats"]["bn"]["mean"]), 0.5)


def test_snps_mlp_baseline(topo):
    rng = np.random.default_rng(1)
    s = 48
    y = rng.integers(0, 2, s)
    mu = rng.random((2, topo.num_snps))
    snps = np.clip(mu[y] + rng.normal(0, 0.05, (s, topo.num_snps)), 0, 1
                   ).astype(np.float32)
    res = cross_validation_snps(snps, y, topo, folds=3, epochs=6,
                                batch_size=8, lr=3e-3, model_kind="mlp")
    assert res.accs.shape == (3, 6)
    assert res.best_acc > 0.6


def test_go_scraper_offline(tmp_path):
    """Scraper with injected fetcher writes the go_root_connection format
    the GO graph builder consumes."""
    from iggcn_tpu.data.go_scraper import (fetch_go_root_connections,
                                           read_go_ids)

    ids = tmp_path / "go_ids.txt"
    ids.write_text("GO:0008150\nGO:0048518\n")
    urls = read_go_ids(str(ids))
    assert urls[0].endswith("0008150") and "ctdbase" in urls[0]

    def fake_fetch(url):
        acc = url[-7:]
        return [f":0008150.:{acc}"]

    out = tmp_path / "go_root_connection.txt"
    got = fetch_go_root_connections(str(ids), str(out), fetch=fake_fetch,
                                    delay_s=0)
    lines = out.read_text().strip().split("\n")
    assert lines == got == [":0008150.:0008150", ":0008150.:0048518"]


def test_explain_tool_roundtrip(tmp_path):
    """Checkpoint -> template-free load -> importance + edge-prob export."""
    import jax.numpy as jnp

    from iggcn_tpu.tools.explain import (export_edge_probabilities,
                                         export_importances, load_params)

    params = {"prob": jnp.full((90, 3), 0.2),
              "snps_prob": jnp.full((1, 54), -0.3),
              "prob_bias": jnp.full((6, 1), 0.1),
              "other": {"w": jnp.ones((2, 2))}}
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, params, {})
    loaded = load_params(path)
    out = export_importances(loaded, str(tmp_path), "f0")
    assert set(out) == {"prob", "snps_prob", "prob_bias"}
    np.testing.assert_allclose(
        np.load(tmp_path / "node_importance_f0.npy"), 0.2)
    x = np.random.default_rng(0).normal(size=(3, 90, 3)).astype(np.float32)
    ep = export_edge_probabilities(loaded, x, str(tmp_path), "f0")
    assert ep.shape == (3, 90, 90)
    assert (ep > 0).all() and (ep < 1).all()
