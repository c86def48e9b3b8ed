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

    from iggcn_tpu.utils import platform as plat

    monkeypatch.setattr(plat, "probe_backend",
                        lambda timeout_s=180.0: "still down")
    monkeypatch.setattr(time_mod, "sleep", lambda s: None)
    monkeypatch.setenv("IGGCN_BENCH_PROBE_RETRIES", "2")
    assert plat.probe_backend_with_retries() == "still down"

    monkeypatch.setenv("IGGCN_BENCH_PROBE_RETRIES", "0")  # retrying disabled
    assert plat.probe_backend_with_retries() == "still down"


def test_probe_retry_respects_deadline(monkeypatch):
    """The retry ladder alone must never eat a caller's wall-clock budget
    (bench.py passes deadline_s so a dead tunnel leaves time for nothing
    BUT the error line — not a 15-minute silent wait)."""
    import time as time_mod

    from iggcn_tpu.utils import platform as plat

    calls = {"probe": 0, "sleeps": []}
    monkeypatch.setattr(plat, "probe_backend",
                        lambda timeout_s=180.0: calls.__setitem__(
                            "probe", calls["probe"] + 1) or "down")
    monkeypatch.setattr(time_mod, "sleep",
                        lambda s: calls["sleeps"].append(s))
    monkeypatch.setenv("IGGCN_BENCH_PROBE_RETRIES", "6")
    monkeypatch.setenv("IGGCN_BENCH_PROBE_RETRY_SLEEP_S", "60")
    # deadline below one sleep+probe: gives up after the FIRST probe
    assert plat.probe_backend_with_retries(deadline_s=30.0) == "down"
    assert calls["probe"] == 1 and calls["sleeps"] == []


def _fake_bench_env(monkeypatch, leg_s=0.0, torch_gps=100.0,
                    canary=(30.0, 30.0)):
    """Patch bench.py's measurement legs with fast fakes so main()'s
    budget/emission control flow can be driven in milliseconds."""
    import time as time_mod

    import bench
    from iggcn_tpu.utils import cache as cache_mod
    from iggcn_tpu.utils import platform as plat

    calls = {"jax": [], "infer": [], "torch": []}

    def fake_bench_jax(topo, cohort, batch=32, attention_impl=None,
                       donate=None, **kw):
        calls["jax"].append((batch, attention_impl, donate))
        if leg_s:
            time_mod.sleep(leg_s)
        return 1000.0 + batch, 0.1, {"step_time_us": 1.0}

    class _Cohort:
        def __len__(self):
            return 512

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setattr(plat, "probe_backend_with_retries",
                        lambda log=None, deadline_s=None: None)
    monkeypatch.setattr(plat, "honor_platform_env", lambda: None)
    monkeypatch.setattr(cache_mod, "enable_compilation_cache",
                        lambda *a, **k: None)
    monkeypatch.setattr(bench, "build_data", lambda: (None, _Cohort()))
    monkeypatch.setattr(bench, "bench_jax", fake_bench_jax)
    monkeypatch.setattr(bench, "bench_infer",
                        lambda *a, **k: calls["infer"].append(k) or 5000.0)
    monkeypatch.setattr(bench, "bench_torch",
                        lambda *a, **k: calls["torch"].append(k) or torch_gps)
    monkeypatch.setattr(bench, "_canary", lambda: canary)
    monkeypatch.setattr(bench, "measure_mfu",
                        lambda topo, cohort, batch, gps: {
                            "mfu_pct_vs_bf16_peak": 3.0,
                            "flops_per_graph": 1000,
                            "mfu_method": "flops_per_step*steps_per_sec/peak"})
    monkeypatch.setattr(bench, "bench_experiment_wall",
                        lambda timeout_s: {"wall_s": 53.7, "rc": 0,
                                           "result": "Result - 0.5 +/- 0.1"})
    monkeypatch.setattr(bench, "bench_donate_ab",
                        lambda topo, cohort, batch, pairs=5: {
                            "batch": batch, "pairs": pairs,
                            "off_median": 1000.0 + batch,
                            "on_median": 990.0 + batch,
                            "on_vs_off_pct": -1.0,
                            "off_gps": [], "on_gps": [],
                            "off_spread_pct": 2.0, "on_spread_pct": 2.0})
    return bench, calls


def _json_lines(out):
    import json

    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    return [json.loads(ln) for ln in lines]


def test_budgeted_main_emits_incremental_then_final(monkeypatch, capsys):
    """Happy path: a JSON line lands after every leg (all parseable), the
    last line is final (no 'partial'), carries the measured oracle ratio,
    and both A/B legs ran."""
    bench, calls = _fake_bench_env(monkeypatch)
    monkeypatch.setattr(bench, "BUDGET_S", 300.0)
    bench.main()
    records = _json_lines(capsys.readouterr().out)
    assert len(records) >= 4           # sweep legs + oracle + infer + A/B
    assert all(r["metric"] == "fused_sgcn_go_train_throughput"
               for r in records)
    assert all(r.get("partial") for r in records[:-1])
    final = records[-1]
    assert "partial" not in final
    assert final["value"] == 2024.0 and final["batch"] == 1024
    assert final["baseline_source"] == "torch_cpu_oracle_measured"
    assert final["vs_baseline"] == round(2024.0 / 100.0, 3)
    assert "attention_ab" in final and "donate_ab" in final
    # donate A/B is the interleaved-median structure now (VERDICT r4 #3)
    assert final["donate_ab"]["batch"] == 1024
    assert final["donate_ab"]["on_median"] == 990.0 + 1024
    # MFU by the documented method + the whole-experiment wall leg
    assert final["mfu_method"] == "flops_per_step*steps_per_sec/peak"
    assert final["experiment_wall"]["rc"] == 0
    assert final["experiment_wall"]["result"].startswith("Result -")
    # the A/B legs measured the OPPOSITE impl of what 'auto' picks
    assert ("dense_b64" in final["attention_ab"]
            and "edge_b32" in final["attention_ab"])


def test_budgeted_main_slow_window_still_parseable(monkeypatch, capsys):
    """Forced-slow-window simulation (VERDICT r3 #1): legs so slow the
    budget dies after the first — the output must STILL end in a parseable
    line carrying the one measured number, with the skipped legs named."""
    bench, calls = _fake_bench_env(monkeypatch, leg_s=0.25,
                                   canary=(900.0, 900.0))
    monkeypatch.setattr(bench, "BUDGET_S", 0.3)
    bench.main()
    records = _json_lines(capsys.readouterr().out)
    final = records[-1]
    assert "partial" not in final
    # the PRIORITY leg (first in IGGCN_BENCH_SWEEP = the headline batch
    # 256) is the one leg that always lands before the budget dies
    assert final["value"] == 1256.0 and final["batch"] == 256
    assert final["skipped_legs"]       # everything else was budget-skipped
    assert final["baseline_source"] == "fallback_constant"
    assert len(calls["jax"]) == 1 and calls["infer"] == []
    # unhealthy canaries did NOT trigger a retry: no budget for it
    assert final["attempts"] == 1


def test_budgeted_main_survives_failing_leg(monkeypatch, capsys):
    """An OOM (or any exception) in one training leg must not forfeit the
    sweep: the leg is recorded as failed and the smaller batches still
    produce the artifact."""
    import pytest

    bench, calls = _fake_bench_env(monkeypatch)
    real = bench.bench_jax

    def flaky(topo, cohort, batch=32, **kw):
        if batch == 1024:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return real(topo, cohort, batch=batch, **kw)

    monkeypatch.setattr(bench, "bench_jax", flaky)
    monkeypatch.setattr(bench, "BUDGET_S", 300.0)
    bench.main()
    final = _json_lines(capsys.readouterr().out)[-1]
    assert final["value"] == 1512.0 and final["batch"] == 512
    assert "train_b1024_failed" in final["skipped_legs"]

    def dead(*a, **k):
        raise RuntimeError("tunnel gone")

    monkeypatch.setattr(bench, "bench_jax", dead)
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    final = _json_lines(capsys.readouterr().out)[-1]
    assert final["value"] is None and "every training leg failed" in \
        final["error"]


def test_budgeted_main_term_handler_flushes(monkeypatch, capsys):
    """SIGTERM mid-run (the driver's timeout) flushes the best-so-far line
    instead of dying silently."""
    import os
    import signal

    bench, _ = _fake_bench_env(monkeypatch)
    emitter = bench._Emitter(bench._Budget(10.0))
    emitter.update(value=123.0, batch=32)
    old = signal.getsignal(signal.SIGTERM)
    try:
        bench._install_term_handler(emitter)
        with __import__("pytest").raises(SystemExit) as ei:
            os.kill(os.getpid(), signal.SIGTERM)
        assert ei.value.code == 0
    finally:
        signal.signal(signal.SIGTERM, old)
    records = _json_lines(capsys.readouterr().out)
    assert records[-1]["value"] == 123.0
    assert records[-1]["terminated_by_signal"] == signal.SIGTERM


def test_measure_mfu_tiny(monkeypatch):
    """The documented-method MFU leg on a tiny CPU config: one compiled
    optimizer step's flops, per-graph normalization, and the method
    string that makes the artifact self-describing."""
    import numpy as np

    import bench
    from iggcn_tpu.data.adni import synthetic_cohort
    from iggcn_tpu.data.go_graph import synthetic_topology

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    rng = np.random.default_rng(0)
    topo = synthetic_topology(rng)
    cohort = synthetic_cohort(rng, num_subjects=8)
    out = bench.measure_mfu(topo, cohort, batch=4, gps=1000.0)
    assert out["flops_per_step_xla"] > 0
    assert out["flops_per_graph"] == round(out["flops_per_step_xla"] / 4)
    assert out["mfu_method"] == "flops_per_step*steps_per_sec/peak"
    # formula pinned: mfu = 100 * F * (gps/batch) / (peak TFLOP/s)
    want = round(100.0 * out["flops_per_step_xla"] * 250.0
                 / (out["peak_tflops_assumed"] * 1e12), 2)
    assert out["mfu_pct_vs_bf16_peak"] == want


def test_bench_donate_ab_tiny(monkeypatch):
    """Interleaved donation A/B on a tiny CPU config: off/on sample lists
    of the requested length, medians derived from them, and the donated
    program chain actually executing (donated input buffers rebound to
    outputs between pairs)."""
    import numpy as np

    import bench
    from iggcn_tpu.data.adni import synthetic_cohort
    from iggcn_tpu.data.go_graph import synthetic_topology

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setattr(bench, "EPOCHS_TIMED", 2)
    rng = np.random.default_rng(1)
    topo = synthetic_topology(rng)
    cohort = synthetic_cohort(rng, num_subjects=8)
    ab = bench.bench_donate_ab(topo, cohort, batch=4, pairs=2)
    assert len(ab["off_gps"]) == 2 and len(ab["on_gps"]) == 2
    assert ab["off_median"] == float(np.median(ab["off_gps"]))
    assert ab["on_median"] == float(np.median(ab["on_gps"]))
    assert all(v > 0 for v in ab["off_gps"] + ab["on_gps"])
    assert ab["batch"] == 4 and ab["pairs"] == 2
