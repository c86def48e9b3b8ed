"""Unit coverage for bench.py's host-side pieces (the full benchmark runs
on the TPU at round end; these pin the parts that must not crash there)."""


def test_canary_runs_and_is_positive():
    from bench import _canary

    rtt_ms, compute_ms = _canary()
    assert rtt_ms > 0 and compute_ms > 0


def test_build_data_shapes():
    from bench import SUBJECTS, build_data

    topo, cohort = build_data()
    assert len(cohort) == SUBJECTS
    assert cohort.x.shape == (SUBJECTS, 90, 3)
    assert topo.go_snps.shape[1] == 54
    # real analysis scale, not the unit-test fixture (SURVEY §intro)
    assert topo.n >= 400


def test_bench_infer_tiny():
    import numpy as np

    from bench import bench_infer
    from iggcn_tpu.data.adni import synthetic_cohort
    from iggcn_tpu.data.go_graph import synthetic_topology

    rng = np.random.default_rng(0)
    topo = synthetic_topology(rng)
    cohort = synthetic_cohort(rng, num_subjects=12)
    gps = bench_infer(topo, cohort, batch=8, reps=2)
    assert gps > 0


def test_probe_backend_ok_on_cpu(monkeypatch):
    from iggcn_tpu.utils.platform import probe_backend
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert probe_backend(timeout_s=120.0) is None


def test_probe_backend_times_out_loudly():
    from iggcn_tpu.utils.platform import probe_backend
    err = probe_backend(timeout_s=0.05)
    assert err is not None and "did not respond" in err


def test_probe_retry_recovers_from_transient_outage(monkeypatch):
    """A tunnel outage during the first probe must not forfeit the round's
    bench artifact: the retry loop probes again (without the retry sleeps
    eating real time here) and returns None once the backend answers."""
    import time as time_mod

    from iggcn_tpu.utils import platform as plat

    calls = {"probe": 0, "sleeps": []}

    def fake_probe(timeout_s=180.0):
        calls["probe"] += 1
        return None if calls["probe"] >= 3 else "tunnel down"

    monkeypatch.setattr(plat, "probe_backend", fake_probe)
    monkeypatch.setattr(time_mod, "sleep",
                        lambda s: calls["sleeps"].append(s))
    monkeypatch.setenv("IGGCN_BENCH_PROBE_RETRIES", "6")
    assert plat.probe_backend_with_retries() is None
    assert calls["probe"] == 3 and len(calls["sleeps"]) == 2


def test_probe_retry_gives_up_loudly(monkeypatch):
    import time as time_mod

    import bench
    from iggcn_tpu.utils import platform as plat

    monkeypatch.setattr(plat, "probe_backend",
                        lambda timeout_s=180.0: "still down")
    monkeypatch.setattr(time_mod, "sleep", lambda s: None)
    monkeypatch.setenv("IGGCN_BENCH_PROBE_RETRIES", "2")
    # through bench.py's wrapper: same helper, bench-labelled logging
    assert bench._probe_with_retries() == "still down"

    monkeypatch.setenv("IGGCN_BENCH_PROBE_RETRIES", "0")  # retrying disabled
    assert plat.probe_backend_with_retries() == "still down"
