"""Processed-cohort disk cache (`data/cohort_cache.py`).

Parity target: the reference's `ADNIDataset(InMemoryDataset)` caches the
post-`pre_transform` tensors under `./<root>/processed/` and reloads them on
later runs (`sgcn_data.py:307,332-338`) — including the expensive per-subject
PPR diffusion. The TPU build caches the dense `AdniCohort` as one npz keyed
by loader params + source fingerprint + format version.
"""
import os

import numpy as np
import pytest

from iggcn_tpu.data import cohort_cache
from iggcn_tpu.data.adni import synthetic_cohort


@pytest.fixture()
def small_cohort():
    return synthetic_cohort(np.random.default_rng(7), num_subjects=12)


def test_npz_round_trip_is_exact(tmp_path, small_cohort):
    path = str(tmp_path / "c.npz")
    cohort_cache.save_cohort(small_cohort, path)
    loaded = cohort_cache.load_cohort(path)
    assert cohort_cache.equal_cohorts(small_cohort, loaded)
    # dtypes survive (float32 arrays must not come back float64)
    assert loaded.x.dtype == small_cohort.x.dtype
    assert loaded.y.dtype == small_cohort.y.dtype
    # NaN demographics holes survive (the imputation path depends on them)
    assert np.isnan(loaded.demographics).any()
    # the fitted scaler reproduces transforms exactly
    probe = np.linspace(0, 1, 9 * 3).reshape(3, 9)
    np.testing.assert_array_equal(small_cohort.scaler4score.transform(probe),
                                  loaded.scaler4score.transform(probe))


def test_optional_fields_round_trip_none(tmp_path, small_cohort):
    import dataclasses
    bare = dataclasses.replace(small_cohort, raw_y=None, adni_type=None)
    path = str(tmp_path / "c.npz")
    cohort_cache.save_cohort(bare, path)
    loaded = cohort_cache.load_cohort(path)
    assert loaded.raw_y is None and loaded.adni_type is None
    assert cohort_cache.equal_cohorts(bare, loaded)


def test_load_or_build_miss_then_hit(tmp_path, small_cohort):
    calls = []

    def builder():
        calls.append(1)
        return small_cohort

    key = cohort_cache.cohort_key("synthetic", seed=1, num_subjects=12)
    c1, hit1 = cohort_cache.load_or_build(str(tmp_path), key, builder)
    c2, hit2 = cohort_cache.load_or_build(str(tmp_path), key, builder)
    assert (hit1, hit2) == (False, True)
    assert len(calls) == 1          # the second call never ran the builder
    assert cohort_cache.equal_cohorts(c1, c2)
    # empty cache_dir disables caching entirely
    c3, hit3 = cohort_cache.load_or_build("", key, builder)
    assert not hit3 and len(calls) == 2
    assert cohort_cache.equal_cohorts(c1, c3)


def test_corrupt_entry_rebuilds(tmp_path, small_cohort):
    key = cohort_cache.cohort_key("synthetic", seed=2)
    path = tmp_path / f"{key}.npz"
    path.write_bytes(b"not an npz")
    cohort, hit = cohort_cache.load_or_build(str(tmp_path), key,
                                             lambda: small_cohort)
    assert not hit
    # the corrupt entry was replaced by a loadable one
    assert cohort_cache.equal_cohorts(
        cohort_cache.load_cohort(str(path)), small_cohort)


def test_key_depends_on_params_and_version(monkeypatch):
    k1 = cohort_cache.cohort_key("synthetic", seed=1, top_k=3)
    k2 = cohort_cache.cohort_key("synthetic", seed=2, top_k=3)
    k3 = cohort_cache.cohort_key("synthetic", seed=1, top_k=4)
    k4 = cohort_cache.cohort_key("adni874", seed=1, top_k=3)
    assert len({k1, k2, k3, k4}) == 4
    # kwarg order must not matter
    assert k1 == cohort_cache.cohort_key("synthetic", top_k=3, seed=1)
    # a format bump invalidates every key
    monkeypatch.setattr(cohort_cache, "FORMAT_VERSION",
                        cohort_cache.FORMAT_VERSION + 1)
    assert cohort_cache.cohort_key("synthetic", seed=1, top_k=3) != k1


def test_dir_fingerprint_tracks_source_files(tmp_path):
    (tmp_path / "a.mat").write_bytes(b"xx")
    f1 = cohort_cache.dir_fingerprint(str(tmp_path))
    (tmp_path / "a.mat").write_bytes(b"xxyy")   # size change
    f2 = cohort_cache.dir_fingerprint(str(tmp_path))
    (tmp_path / "b.csv").write_bytes(b"z")      # new file
    f3 = cohort_cache.dir_fingerprint(str(tmp_path))
    assert f1 != f2 and f2 != f3
    # RECURSIVE: load_adni874 reads from subdirectories (knn/<k>/*.mat,
    # center_<c>/...), so nested source changes must change the key too
    sub = tmp_path / "knn" / "10"
    sub.mkdir(parents=True)
    (sub / "corr_data.mat").write_bytes(b"m1")
    f4 = cohort_cache.dir_fingerprint(str(tmp_path))
    (sub / "corr_data.mat").write_bytes(b"m2longer")
    f5 = cohort_cache.dir_fingerprint(str(tmp_path))
    assert f3 != f4 and f4 != f5


def test_cache_write_failure_degrades_to_uncached(tmp_path, small_cohort,
                                                  capsys):
    """An unwritable cache dir must not kill a run whose cohort is already
    built (caching is default-on)."""
    # a FILE where the cache dir's parent should be -> makedirs raises
    # NotADirectoryError (permission bits don't stop a root test runner)
    blocker = tmp_path / "blocker"
    blocker.write_bytes(b"")
    cohort, hit = cohort_cache.load_or_build(
        str(blocker / "cache"), cohort_cache.cohort_key("synthetic", seed=3),
        lambda: small_cohort)
    assert not hit
    assert cohort_cache.equal_cohorts(cohort, small_cohort)
    assert "continuing uncached" in capsys.readouterr().out


def test_cli_second_run_hits_cache(tmp_path, monkeypatch, capsys):
    """End-to-end: two identical tiny CLI runs — the second loads the cohort
    from the cache and reaches identical fold accuracies (log.txt parity)."""
    import main as cli
    monkeypatch.chdir(tmp_path)
    argv = ["--model", "SGCN_GCN_IMGSNP", "--synthetic",
            "--synthetic_subjects", "36", "--epochs", "2", "--fold", "3",
            "--no-search", "--save_appendix", "_cc1"]
    cli.main(argv)
    out1 = capsys.readouterr().out
    assert "cohort loaded from cache" not in out1
    cache_files = os.listdir(tmp_path / "cohort_cache")
    assert len(cache_files) == 1 and cache_files[0].endswith(".npz")

    cli.main(["--model", "SGCN_GCN_IMGSNP", "--synthetic",
              "--synthetic_subjects", "36", "--epochs", "2", "--fold", "3",
              "--no-search", "--save_appendix", "_cc2"])
    out2 = capsys.readouterr().out
    assert "cohort loaded from cache" in out2

    log1 = (tmp_path / "results" / "ADNI_cc1" / "log.txt").read_text()
    log2 = (tmp_path / "results" / "ADNI_cc2" / "log.txt").read_text()
    assert log1 == log2    # cached cohort reproduces the run exactly
