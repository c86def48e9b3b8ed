"""Offline clustering pipeline (t-SNE + KMeans) and artifact layout."""

import numpy as np

from iggcn_tpu.data.cluster import (calculate_wss, prepare_cluster_artifacts,
                                    run_image_clustering,
                                    similarity_features)


def _img(rng, s=40):
    # two separated groups so clustering is trivially recoverable
    base = rng.normal(0, 0.1, (s, 90, 3)).astype(np.float32)
    base[s // 2:] += 3.0
    return base


def test_similarity_features_modes():
    img = np.arange(2 * 90 * 3, dtype=np.float32).reshape(2, 90, 3)
    mm = similarity_features(img, "multimodal")
    pet = similarity_features(img, "pet")
    assert mm.shape == (2, 270)
    assert pet.shape == (2, 90)
    np.testing.assert_array_equal(pet, img[:, :, 2])


def test_clustering_recovers_groups():
    rng = np.random.default_rng(0)
    img = _img(rng)
    feats = similarity_features(img, "multimodal")
    tsne, labels = run_image_clustering(feats, k=2, seed=1000)
    assert tsne.shape == (40, 2)
    assert labels.shape == (40,)
    # each true group lands (almost) entirely in one cluster
    a, b = labels[:20], labels[20:]
    assert (a == a[0]).mean() > 0.9 and (b == b[0]).mean() > 0.9
    assert a[0] != b[0]


def test_artifact_files(tmp_path):
    rng = np.random.default_rng(1)
    img = _img(rng, s=24)
    diag = np.random.default_rng(9).integers(0, 5, size=24)
    labels = prepare_cluster_artifacts(img, str(tmp_path), k=2,
                                       mode="multimodal", plots=True,
                                       diagnosis_labels=diag)
    assert (tmp_path / "multimodal_for_similarity.npy").exists()
    assert (tmp_path / "tsne_results.npy").exists()
    assert (tmp_path / "center_2" / "clusters_pred_label.npy").exists()
    saved = np.load(tmp_path / "center_2" / "clusters_pred_label.npy")
    np.testing.assert_array_equal(saved, labels)
    wss = calculate_wss(np.load(tmp_path / "tsne_results.npy"), kmax=3)
    assert len(wss) == 3 and wss[0] >= wss[1] >= wss[2]
    assert (tmp_path / "tsne_clusters.png").exists()
    assert (tmp_path / "tsne_diagnosis.png").exists()


def test_tsne_cache_invalidates_on_new_features(tmp_path):
    """The t-SNE cache is keyed to the feature matrix: rerunning with
    DIFFERENT features must recompute instead of silently clustering the
    stale embedding (path-only caching did exactly that)."""
    rng = np.random.default_rng(2)
    cache = str(tmp_path / "tsne_results.npy")
    f1 = rng.normal(size=(20, 6)).astype(np.float64)
    t1, _ = run_image_clustering(f1, k=2, seed=1000, tsne_cache=cache)
    # same features -> cache hit, identical embedding
    t1b, _ = run_image_clustering(f1, k=2, seed=1000, tsne_cache=cache)
    np.testing.assert_array_equal(t1, t1b)
    # new features -> recompute (embedding changes, cache file updated)
    f2 = rng.normal(size=(20, 6)).astype(np.float64) + 5.0
    t2, _ = run_image_clustering(f2, k=2, seed=1000, tsne_cache=cache)
    assert not np.allclose(t1, t2)
    np.testing.assert_array_equal(np.load(cache), t2)


def test_plot_tsne(tmp_path):
    import pytest

    pytest.importorskip("matplotlib")
    from iggcn_tpu.data.cluster import DIAGNOSIS_NAMES, plot_tsne

    rng = np.random.default_rng(3)
    tsne = rng.normal(size=(30, 2))
    labels = rng.integers(0, 5, size=30)
    out = tmp_path / "tsne.png"
    plot_tsne(tsne, labels, str(out), label_names=DIAGNOSIS_NAMES,
              title="diagnosis")
    assert out.exists() and out.stat().st_size > 0
    clusters = rng.integers(0, 2, size=30)
    out2 = tmp_path / "clusters.png"
    plot_tsne(tsne, clusters, str(out2))
    assert out2.exists()


def test_plot_tsne_rejects_out_of_range_labels(tmp_path):
    import pytest

    pytest.importorskip("matplotlib")
    from iggcn_tpu.data.cluster import DIAGNOSIS_NAMES, plot_tsne

    tsne = np.zeros((4, 2))
    with pytest.raises(ValueError, match="label_names"):
        plot_tsne(tsne, np.array([0, 1, 2, 7]), str(tmp_path / "x.png"),
                  label_names=DIAGNOSIS_NAMES)
    with pytest.raises(ValueError, match="label_names"):
        plot_tsne(tsne, np.array([-1, 0, 1, 2]), str(tmp_path / "y.png"),
                  label_names=DIAGNOSIS_NAMES)
