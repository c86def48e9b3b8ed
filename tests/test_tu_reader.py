"""Raw TU-benchmark file ingestion (parity `kernel/tu_dataset.py:11-154` +
`kernel/datasets.py:27-91`), driven end-to-end through the generic CV
trainer and a nested variant on the committed TUTEST fixture."""
import os

import numpy as np
import pytest

from iggcn_tpu.data.nested import create_nested_dataset
from iggcn_tpu.data.tu import degree_features, read_tu_dir

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def tutest():
    return read_tu_dir(FIXTURES, "TUTEST")


def test_read_tu_dir_shapes_and_labels(tutest):
    ds = tutest
    assert len(ds) == 10
    assert ds.num_classes == 2
    # graph labels file holds {-1, 1}; sorted-unique remap -> {0, 1}
    assert set(ds.y.tolist()) == {0, 1}
    assert ds.y.tolist() == [0, 1] * 5
    # node labels in {0,1,2} -> 3-dim one-hot features (no attributes file)
    assert ds.num_features == 3
    n_per_graph = ds.mask.sum(axis=1)
    assert n_per_graph.min() >= 5 and n_per_graph.max() <= 8
    assert ds.x.shape[1] == ds.adj.shape[1] == int(n_per_graph.max())
    for g in range(len(ds)):
        n = int(n_per_graph[g])
        a = ds.adj[g, :n, :n]
        assert (a == a.T).all(), "undirected edges must be symmetric"
        assert np.diagonal(a).sum() == 0, "self loops must be dropped"
        assert (ds.x[g, :n].sum(axis=1) == 1).all(), "one-hot rows"
        assert ds.x[g, n:].sum() == 0
        assert a.sum() > 0


def test_read_tu_dir_counts_match_raw_files(tutest):
    ind = np.loadtxt(os.path.join(FIXTURES, "TUTEST",
                                  "TUTEST_graph_indicator.txt"), dtype=int)
    assert tutest.mask.sum() == ind.shape[0]
    edges = np.loadtxt(os.path.join(FIXTURES, "TUTEST", "TUTEST_A.txt"),
                       delimiter=",", dtype=int)
    # duplicates in the raw file collapse in the dense adjacency
    assert tutest.adj.sum() == np.unique(edges, axis=0).shape[0]


def test_degree_fallback(tmp_path):
    """Without node label/attribute files, features fall back to one-hot
    degree (global max degree) per `kernel/datasets.py:55-61`."""
    src = os.path.join(FIXTURES, "TUTEST")
    dst = tmp_path / "DEGTEST"
    dst.mkdir()
    for suffix in ("A", "graph_indicator", "graph_labels"):
        data = open(os.path.join(src, f"TUTEST_{suffix}.txt")).read()
        (dst / f"DEGTEST_{suffix}.txt").write_text(data)
    ds = read_tu_dir(str(tmp_path), "DEGTEST")
    max_deg = 0
    for g in range(len(ds)):
        n = int(ds.mask[g].sum())
        max_deg = max(max_deg, int(ds.adj[g, :n, :n].sum(axis=1).max()))
    assert ds.num_features == max_deg + 1
    n0 = int(ds.mask[0].sum())
    expected = degree_features([ds.adj[0, :n0, :n0]], max_degree=max_deg)[0]
    np.testing.assert_array_equal(ds.x[0, :n0], expected)


def test_raw_subdir_layout(tmp_path):
    """Files under <root>/<name>/raw/ (the vendored TUDataset layout) load
    identically."""
    src = os.path.join(FIXTURES, "TUTEST")
    raw = tmp_path / "TUTEST" / "raw"
    raw.mkdir(parents=True)
    for fn in os.listdir(src):
        (raw / fn).write_text(open(os.path.join(src, fn)).read())
    ds = read_tu_dir(str(tmp_path), "TUTEST")
    ref = read_tu_dir(FIXTURES, "TUTEST")
    np.testing.assert_array_equal(ds.x, ref.x)
    np.testing.assert_array_equal(ds.adj, ref.adj)
    np.testing.assert_array_equal(ds.y, ref.y)


def test_tu_through_generic_cv(tutest):
    """Real-file path end-to-end: plain GCN baseline + nested variant."""
    from iggcn_tpu.models.baselines import GIN
    from iggcn_tpu.models.nested import NestedGCN
    from iggcn_tpu.train.generic_cv import cross_validation_generic

    model = GIN(hidden=8, num_layers=2,
                num_classes=tutest.num_classes)
    res = cross_validation_generic(tutest, model, folds=3, epochs=2,
                                   batch_size=4, needs_mask=True)
    assert res.accs.shape == (3, 2)
    assert np.isfinite(res.mean_loss)

    nested = create_nested_dataset(tutest, h=1)
    nmodel = NestedGCN(hidden=8, num_layers=2,
                       num_classes=nested.num_classes)
    nres = cross_validation_generic(nested, nmodel, folds=3, epochs=1,
                                    batch_size=4, needs_mask=True,
                                    needs_assign=True)
    assert np.isfinite(nres.mean_loss)


def test_multicolumn_node_labels(tmp_path):
    """Multi-column node_labels files one-hot each column separately and
    concatenate (PyG read_tu_data parity); used to crash with an IndexError."""
    src = os.path.join(FIXTURES, "TUTEST")
    dst = tmp_path / "MCTEST"
    dst.mkdir()
    for suffix in ("A", "graph_indicator", "graph_labels"):
        data = open(os.path.join(src, f"TUTEST_{suffix}.txt")).read()
        (dst / f"MCTEST_{suffix}.txt").write_text(data)
    col0 = np.loadtxt(os.path.join(src, "TUTEST_node_labels.txt"),
                      dtype=np.int64).reshape(-1)
    rng = np.random.default_rng(0)
    col1 = rng.integers(0, 3, size=col0.shape[0])
    (dst / "MCTEST_node_labels.txt").write_text(
        "\n".join(f"{a}, {b}" for a, b in zip(col0, col1)) + "\n")
    ds = read_tu_dir(str(tmp_path), "MCTEST")
    w0 = int(col0.max() - col0.min()) + 1
    w1 = int(col1.max() - col1.min()) + 1
    assert ds.num_features == w0 + w1
    # each node's row is the concat of the two per-column one-hots
    node = 0
    for g in range(len(ds)):
        n = int(ds.mask[g].sum())
        for i in range(n):
            row = ds.x[g, i]
            assert row[:w0].argmax() == col0[node] - col0.min()
            assert row[w0:].argmax() == col1[node] - col1.min()
            assert row.sum() == 2.0
            node += 1
    assert node == col0.shape[0]
