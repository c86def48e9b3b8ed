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
    from bench import _probe_backend
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert _probe_backend(timeout_s=120.0) is None


def test_probe_backend_times_out_loudly():
    from bench import _probe_backend
    err = _probe_backend(timeout_s=0.05)
    assert err is not None and "did not respond" in err
