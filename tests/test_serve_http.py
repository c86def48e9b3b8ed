"""HTTP serving daemon: protocol, prediction parity, error handling.

The daemon (`tools/serve.build_http_server`) is the long-lived deployment
surface over the same `predict.batched_forward` program the batch CLI uses
— a capability the reference lacks entirely (its checkpoints are written
and never loaded, SURVEY §5).
"""
import http.client
import io
import json
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def server_and_truth():
    from iggcn_tpu.config import ModelConfig
    from iggcn_tpu.data.adni import synthetic_cohort
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.fused_sgcn import FusedSGCN
    from iggcn_tpu.predict import batched_forward
    from iggcn_tpu.tools.serve import build_http_server

    rng = np.random.default_rng(0)
    topo = synthetic_topology(rng)
    cohort = synthetic_cohort(rng, num_subjects=11)
    mcfg = ModelConfig(num_layers=2, hidden=8)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((4, mcfg.rois, mcfg.feat_dim)),
        jnp.zeros((4, mcfg.rois, mcfg.rois)),
        jnp.zeros((4, mcfg.num_snps)))
    params, stats = variables["params"], variables["batch_stats"]
    want = batched_forward(model, params, stats,
                           cohort.x.astype(np.float32),
                           cohort.adj.astype(np.float32),
                           cohort.snps.astype(np.float32), batch_size=8)
    server = build_http_server(model, params, stats, port=0, batch=8)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server.server_address[:2], cohort, want
    server.shutdown()
    server.server_close()
    thread.join(timeout=5)


def _post_npz(addr, path, body):
    conn = http.client.HTTPConnection(*addr, timeout=60)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": "application/octet-stream"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_predict_endpoint_matches_direct_serving(server_and_truth):
    addr, cohort, want = server_and_truth
    buf = io.BytesIO()
    np.savez(buf, x=cohort.x.astype(np.float32),
             adj=cohort.adj.astype(np.float32),
             snps=cohort.snps.astype(np.float32))
    status, data = _post_npz(addr, "/predict", buf.getvalue())
    assert status == 200
    with np.load(io.BytesIO(data)) as zf:
        np.testing.assert_allclose(zf["log_probs"], want["log_probs"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(zf["pred"], want["pred"])
        assert zf["our_reg"].shape == want["our_reg"].shape


def test_health_endpoint_reports_model(server_and_truth):
    addr, _, _ = server_and_truth
    conn = http.client.HTTPConnection(*addr, timeout=30)
    conn.request("GET", "/health")
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    assert resp.status == 200
    assert body["model_class"] == "FusedSGCN"
    assert body["batch"] == 8 and body["dtype"] == "float32"


def test_bad_body_is_400_and_unknown_route_404(server_and_truth):
    addr, _, _ = server_and_truth
    status, data = _post_npz(addr, "/predict", b"this is not an npz")
    assert status == 400
    assert "x/adj/snps" in json.loads(data)["error"]
    status, _ = _post_npz(addr, "/nope", b"")
    assert status == 404


def test_oversized_body_is_413_without_reading(server_and_truth):
    from iggcn_tpu.tools.serve import MAX_BODY_BYTES

    addr, _, _ = server_and_truth
    conn = http.client.HTTPConnection(*addr, timeout=30)
    conn.putrequest("POST", "/predict")
    conn.putheader("Content-Length", str(MAX_BODY_BYTES + 1))
    conn.endheaders()          # body never sent: the cap must trip first
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    assert resp.status == 413 and "cap" in body["error"]


def test_requests_up_to_batch_reuse_one_compiled_program(server_and_truth):
    """fixed_batch serving: cohorts of any size <= --batch pad to identical
    shapes, so after warm-up no request-size change triggers a jit trace."""
    addr, cohort, _ = server_and_truth
    import iggcn_tpu.predict as predict

    traces = 0
    orig = predict.pad_split_batches

    def counting(arrays, batch_size):
        nonlocal traces
        traces += 1
        out = orig(arrays, batch_size)
        assert out[0].shape[:2] == (1, 8)   # (NB=1, B=batch) for n<=batch
        return out

    predict.pad_split_batches = counting
    try:
        for n in (1, 5, 8):
            buf = io.BytesIO()
            np.savez(buf, x=cohort.x[:n].astype(np.float32),
                     adj=cohort.adj[:n].astype(np.float32),
                     snps=cohort.snps[:n].astype(np.float32))
            status, _ = _post_npz(addr, "/predict", buf.getvalue())
            assert status == 200
    finally:
        predict.pad_split_batches = orig
    assert traces == 3


def test_concurrent_requests_all_succeed_and_agree(server_and_truth):
    """The daemon serializes device work behind a lock while threads overlap
    request I/O (ThreadingHTTPServer): a burst of parallel clients must all
    get 200s with predictions identical to the single-request truth."""
    addr, cohort, want = server_and_truth
    buf = io.BytesIO()
    np.savez(buf, x=cohort.x.astype(np.float32),
             adj=cohort.adj.astype(np.float32),
             snps=cohort.snps.astype(np.float32))
    body = buf.getvalue()
    results = [None] * 8

    def hit(i):
        results[i] = _post_npz(addr, "/predict", body)

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(len(results))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for status, data in results:
        assert status == 200
        with np.load(io.BytesIO(data)) as zf:
            np.testing.assert_array_equal(zf["pred"], want["pred"])


def test_bf16_daemon_agrees_with_fp32_and_casts_params_once(tmp_path):
    from iggcn_tpu.config import ModelConfig
    from iggcn_tpu.data.adni import synthetic_cohort
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.fused_sgcn import FusedSGCN
    from iggcn_tpu.predict import batched_forward
    from iggcn_tpu.tools.serve import build_http_server

    rng = np.random.default_rng(3)
    topo = synthetic_topology(rng)
    cohort = synthetic_cohort(rng, num_subjects=7)
    mcfg = ModelConfig(num_layers=2, hidden=8)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((4, mcfg.rois, mcfg.feat_dim)),
        jnp.zeros((4, mcfg.rois, mcfg.rois)),
        jnp.zeros((4, mcfg.num_snps)))
    fp32 = batched_forward(model, variables["params"],
                           variables["batch_stats"],
                           cohort.x.astype(np.float32),
                           cohort.adj.astype(np.float32),
                           cohort.snps.astype(np.float32), batch_size=8)
    server = build_http_server(model, variables["params"],
                               variables["batch_stats"], port=0, batch=8,
                               dtype=jnp.bfloat16)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        buf = io.BytesIO()
        np.savez(buf, x=cohort.x.astype(np.float32),
                 adj=cohort.adj.astype(np.float32),
                 snps=cohort.snps.astype(np.float32))
        status, data = _post_npz(server.server_address[:2], "/predict",
                                 buf.getvalue())
        assert status == 200
        with np.load(io.BytesIO(data)) as zf:
            assert zf["log_probs"].dtype == np.float32
            agree = np.mean(zf["pred"] == fp32["pred"])
            assert agree >= 0.8, f"bf16/fp32 agreement {agree}"
            np.testing.assert_allclose(zf["log_probs"], fp32["log_probs"],
                                       atol=0.15)
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


def test_snps_only_daemon_serves_from_snps_matrix(tmp_path):
    """SNP-only bundles (GeneOntologyNetwork) serve over HTTP from a
    snps-matrix npz alone — the deploy surface covers every CLI-trainable
    ADNI family, not just the fused ones."""
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.go_network import GeneOntologyNetwork
    from iggcn_tpu.predict import batched_forward_snps
    from iggcn_tpu.tools.serve import build_http_server, load_bundle, \
        save_bundle

    rng = np.random.default_rng(5)
    topo = synthetic_topology(rng)
    model = GeneOntologyNetwork(topo=topo, in_f_dim=2, n_l=2, f_dim=(5, 5),
                                l_dim=8)

    def init_all(mod, x):
        latent, x_hat, _ = mod(x)
        return mod.classify(latent, x)

    variables = jax.jit(lambda r, x: model.init(r, x, method=init_all))(
        jax.random.PRNGKey(0), jnp.zeros((4, topo.num_snps)))
    bundle = str(tmp_path / "snps.npz")
    save_bundle(bundle, model, variables["params"],
                variables["batch_stats"])
    model2, params2, stats2 = load_bundle(bundle)

    snps = rng.random((9, topo.num_snps)).astype(np.float32)
    want = batched_forward_snps(model2, params2, stats2, snps, batch_size=8)

    server = build_http_server(model2, params2, stats2, port=0, batch=8)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        addr = server.server_address[:2]
        conn = http.client.HTTPConnection(*addr, timeout=30)
        conn.request("GET", "/health")
        health = json.loads(conn.getresponse().read())
        conn.close()
        assert health["inputs"] == "snps"
        assert health["num_snps"] == topo.num_snps

        buf = io.BytesIO()
        np.savez(buf, snps=snps)
        status, data = _post_npz(addr, "/predict", buf.getvalue())
        assert status == 200
        with np.load(io.BytesIO(data)) as zf:
            np.testing.assert_allclose(zf["prob"], want["prob"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_array_equal(zf["pred"], want["pred"])
        # a fused-style body against a snps-only server is a clean 400
        buf = io.BytesIO()
        np.savez(buf, x=snps, adj=snps, wrong=snps)
        status, data = _post_npz(addr, "/predict", buf.getvalue())
        assert status == 400 and "snps" in json.loads(data)["error"]
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


def test_cli_rejects_http_with_one_shot_flags(tmp_path):
    from iggcn_tpu.tools.serve import main

    with pytest.raises(SystemExit):
        main(["bundle.npz", "--http", "0", "--npz", "c.npz", "--out", "p.npz"])
    with pytest.raises(SystemExit):
        main(["bundle.npz"])     # neither mode selected


def test_stats_endpoint_tracks_requests_and_latency(server_and_truth):
    import json

    addr, cohort, _ = server_and_truth
    buf = io.BytesIO()
    np.savez(buf, x=cohort.x.astype(np.float32),
             adj=cohort.adj.astype(np.float32),
             snps=cohort.snps.astype(np.float32))
    _post_npz(addr, "/predict", buf.getvalue())           # one good request
    _post_npz(addr, "/predict", b"garbage")               # one error
    conn = http.client.HTTPConnection(*addr, timeout=60)
    conn.request("GET", "/stats")
    resp = conn.getresponse()
    stats = json.loads(resp.read())
    conn.close()
    assert resp.status == 200
    # >= because the module-scoped server is shared across tests
    assert stats["requests"] >= 2
    assert stats["errors"] >= 1
    assert stats["subjects_scored"] >= len(cohort.y)
    assert stats["uptime_s"] >= 0
    lat = stats["latency_ms"]
    assert lat["window"] >= 2
    assert 0 <= lat["p50"] <= lat["p95"]
    assert lat["last"] >= 0
