"""Self-contained serving bundle + batch-prediction CLI.

A training checkpoint (`train/checkpoint.py`) holds params/batch-stats only
— rebuilding the model for inference also needs the `ModelConfig` and the
data-derived `GoTopology` (the GO DAG the params were trained against).
This tool bundles all four into ONE `.npz` so a deployment host can serve
with no access to the training data or flag line (the reference has no
equivalent: its checkpoints are written and never loaded, SURVEY §5).

API:
  save_bundle(path, model, params, batch_stats)
  model, params, batch_stats = load_bundle(path)

CLI:
  # one-shot batch scoring
  python -m iggcn_tpu.tools.serve BUNDLE.npz --npz cohort.npz --out preds.npz
      [--batch 256] [--bf16]
  # long-lived HTTP daemon (stdlib-only; no extra deps)
  python -m iggcn_tpu.tools.serve BUNDLE.npz --http 8000 [--batch 256] [--bf16]

`cohort.npz` needs arrays `x` (S, N, F), `adj` (S, N, N), `snps` (S, P);
`preds.npz` gets `log_probs`, `pred`, and `our_reg` when the model has the
regression head. SNP-only bundles (`GeneOntologyNetwork`/`MLPModel`, written
by the SNP trainer's `bundle_dir` / CLI `--export_bundle`) need only `snps`
and get `prob`/`pred`.

HTTP protocol (wire format is npz — numpy-native, zero client deps):
  GET  /health           -> JSON {model_class, batch, dtype, device, ...}
  GET  /stats            -> JSON {requests, errors, subjects_scored,
                            uptime_s, latency_ms {last, p50, p95, window}}
  POST /predict          -> body: npz bytes with x/adj/snps arrays;
                            response: npz bytes with log_probs/pred[/our_reg]
The daemon holds ONE warmed jitted serving program (`make_forward_scan`);
requests pad to the fixed serving batch, so any request of up to `--batch`
subjects reuses the startup-compiled program (larger cohorts compile one
extra program per distinct batch count, cached thereafter).
"""
from __future__ import annotations

import argparse
import dataclasses
import io
import json
import os
import sys
import threading
from typing import Any, Dict, Tuple

import numpy as np


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    """Nested dict-of-arrays -> {'prefix/a/b': array} (msgpack-free, so the
    bundle is one plain npz)."""
    from flax import serialization

    out = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}/{k}")
        else:
            out[path] = np.asarray(node)
    walk(serialization.to_state_dict(tree), prefix)
    return out


def _unflatten(flat: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    plen = len(prefix) + 1
    for key in sorted(flat):
        if not key.startswith(prefix + "/"):
            continue
        node = out
        parts = key[plen:].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return out


def save_bundle(path: str, model, params, batch_stats) -> None:
    """Write model config + GO topology + trained collections as one npz.

    Two meta layouts, one per model-construction style:
      * fused families (`cfg: ModelConfig` + `topo`): meta carries
        `config` (the dataclass) — the original layout;
      * cfg-less families (SNP-only `GeneOntologyNetwork`, `MLPModel`):
        meta carries `ctor`, the module's own dataclass fields (minus
        topo/parent/name), and the topo block is present only when the
        model has one.
    """
    import jax

    topo = getattr(model, "topo", None)
    meta: Dict[str, Any] = {"model_class": type(model).__name__}
    if hasattr(model, "cfg"):
        meta["config"] = dataclasses.asdict(model.cfg)
    else:
        # dropout fields are excluded: serving is eval-mode-only, so the
        # rates never apply, and leaving them out keeps bundles loadable
        # on hosts whose model class predates a given dropout knob
        # (producer/consumer version skew is the bundle's whole use case)
        meta["ctor"] = {
            f.name: (list(v) if isinstance(v, tuple) else v)
            for f in dataclasses.fields(model)
            if f.name not in ("parent", "name", "topo")
            and not f.name.startswith("dropout")
            for v in (getattr(model, f.name),)}
    payload = {
        **_flatten(jax.device_get(params), "params"),
        **_flatten(jax.device_get(batch_stats), "batch_stats"),
    }
    if topo is not None:
        meta["topo"] = {"pool": list(map(int, topo.pool)),
                        "n_l": int(topo.n_l),
                        "go_ids": list(topo.go_ids),
                        "go_genes": [list(g) for g in topo.go_genes]}
        payload["topo/adj_child_parent"] = np.asarray(topo.adj_child_parent)
        payload["topo/go_snps"] = np.asarray(topo.go_snps)
        payload["topo/go_level"] = np.asarray(topo.go_level)
    payload["__meta__"] = np.asarray(json.dumps(meta))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **payload)


def load_bundle(path: str) -> Tuple[Any, Dict[str, Any], Dict[str, Any]]:
    """Rebuild (model, params, batch_stats) from a `save_bundle` npz."""
    from iggcn_tpu.config import ModelConfig
    from iggcn_tpu.data.go_graph import GoTopology
    from iggcn_tpu.models.baselines import MLPModel
    from iggcn_tpu.models.clusterlabel import ClusterLabelSGCN
    from iggcn_tpu.models.fused_sgcn import FusedSGCN
    from iggcn_tpu.models.go_network import GeneOntologyNetwork
    from iggcn_tpu.models.guide import GuideImgSnp

    with np.load(path, allow_pickle=False) as zf:
        flat = {k: zf[k] for k in zf.files}
    if "__meta__" not in flat:
        raise ValueError(
            f"{path} is not a serving bundle (no __meta__ entry; keys: "
            f"{sorted(flat)[:6]}...) — expected an npz written by "
            "save_bundle / --export_bundle. A cohort npz (x/adj/snps) "
            "belongs on --npz, not in the bundle position.")
    meta = json.loads(str(flat.pop("__meta__")))
    # cfg-built fused families (eval forward (x, adj, snps, train=False)
    # with log_probs) — must cover everything cv.py's export_bundle guard
    # lets through — plus the ctor-built SNP-only families (snps -> prob)
    classes = {"FusedSGCN": FusedSGCN, "GuideImgSnp": GuideImgSnp,
               "ClusterLabelSGCN": ClusterLabelSGCN,
               "GeneOntologyNetwork": GeneOntologyNetwork,
               "MLPModel": MLPModel}
    if meta["model_class"] not in classes:
        raise ValueError(f"unknown bundled model class {meta['model_class']};"
                         f" supported: {sorted(classes)}")
    cls = classes[meta["model_class"]]
    topo = None
    if "topo" in meta:
        topo = GoTopology(
            adj_child_parent=flat.pop("topo/adj_child_parent"),
            go_snps=flat.pop("topo/go_snps"),
            go_level=flat.pop("topo/go_level"),
            pool=list(meta["topo"]["pool"]), n_l=meta["topo"]["n_l"],
            go_ids=list(meta["topo"]["go_ids"]),
            go_genes=[list(g) for g in meta["topo"]["go_genes"]])
    # JSON turns tuples into lists; coerce back per the dataclass defaults
    if "config" in meta:
        # same version-skew contract as the ctor branch below: drop config
        # keys this host's ModelConfig doesn't know, so bundles written by
        # a NEWER producer stay loadable
        known_cfg = {f.name for f in dataclasses.fields(ModelConfig)}
        cfg_dict = {k: tuple(v) if isinstance(v, list) else v
                    for k, v in meta["config"].items() if k in known_cfg}
        model = cls(cfg=ModelConfig(**cfg_dict), topo=topo)
    else:
        # drop ctor keys this host's model class doesn't know (bundles
        # written by a NEWER producer stay loadable; serving-relevant state
        # lives in params/batch_stats, not in extra ctor knobs)
        known = {f.name for f in dataclasses.fields(cls)}
        ctor = {k: tuple(v) if isinstance(v, list) else v
                for k, v in meta["ctor"].items() if k in known}
        model = cls(topo=topo, **ctor) if topo is not None else cls(**ctor)
    return model, _unflatten(flat, "params"), _unflatten(flat, "batch_stats")


def _infer_input_width(params) -> int:
    """Input feature width of a topo-less serving bundle (lazy `nn.compact`
    modules like `MLPModel` have no width attribute — the trained params fix
    it). Structural inference, not name order: in a chain of dense layers
    the INPUT layer is the one whose fan-in is not any other layer's output
    width, so this holds regardless of how the layer names sort. Falls back
    to key order only if the structure is ambiguous (e.g. coincidental
    dimension matches)."""
    kernels = {key: node["kernel"] for key, node in params.items()
               if isinstance(node, dict)
               and getattr(node.get("kernel"), "ndim", 0) == 2}
    if not kernels:
        raise ValueError("could not infer the input width from the bundle's "
                         "params (no 2-D kernel leaf found)")
    out_widths = {int(k.shape[1]) for k in kernels.values()}
    roots = [k for k in kernels.values() if int(k.shape[0]) not in out_widths]
    if len(roots) == 1:
        return int(roots[0].shape[0])
    return int(kernels[sorted(kernels)[0]].shape[0])


# request-body ceiling for the HTTP daemon: ~10x a 256-subject fp32 cohort
# (x + adj + snps); a client-supplied Content-Length beyond this is refused
# before any allocation so one request cannot OOM the long-lived process
MAX_BODY_BYTES = 256 * 1024 * 1024


def build_http_server(model, params, batch_stats, *, host="127.0.0.1",
                      port=0, batch=256, dtype=None):
    """A ready-to-serve `ThreadingHTTPServer` around one warmed jitted
    serving program. The caller owns the lifecycle (`serve_forever` /
    `shutdown`); tests bind port 0 and read `server.server_address`.

    Inference calls are serialized behind a lock: the model is latency-bound
    at serving shapes (BASELINE.md), so queueing on one device program beats
    interleaving dispatches; threads still overlap request I/O.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import jax

    from iggcn_tpu.predict import (batched_forward, batched_forward_snps,
                                   cast_floating, make_forward_scan,
                                   make_snps_forward_scan)

    # SNP-only families (no ModelConfig) serve from a snps matrix alone;
    # the fused families from the (x, adj, snps) triple
    snps_only = not hasattr(model, "cfg")
    scan = (make_snps_forward_scan(model) if snps_only
            else make_forward_scan(model))
    lock = threading.Lock()
    cfg = getattr(model, "cfg", None)
    if snps_only:
        topo = getattr(model, "topo", None)
        num_snps = (int(topo.num_snps) if topo is not None
                    else _infer_input_width(params))
    # cast once at build (NOT per request: a per-request tree cast is one
    # eager device op per leaf) and commit the collections to the device —
    # jit re-transfers host-numpy arguments on every call, so un-committed
    # params would re-upload per request
    np_dtype = None
    if dtype is not None:
        params = cast_floating(params, dtype)
        batch_stats = cast_floating(batch_stats, dtype)
        np_dtype = np.dtype(dtype)
    params = jax.device_put(params)
    batch_stats = jax.device_put(batch_stats)
    health = {
        "model_class": type(model).__name__,
        "batch": batch,
        "dtype": "bfloat16" if dtype is not None else "float32",
        "device": jax.devices()[0].device_kind,
    }
    if snps_only:
        health.update(inputs="snps", num_snps=num_snps)
    else:
        health.update(inputs="x,adj,snps", rois=cfg.rois,
                      feat_dim=cfg.feat_dim, num_snps=cfg.num_snps,
                      num_classes=cfg.num_classes)

    if snps_only:
        def forward(snps):
            if np_dtype is not None:
                snps = snps.astype(np_dtype)
            with lock:
                return batched_forward_snps(model, params, batch_stats,
                                            snps, batch_size=batch,
                                            forward_scan=scan,
                                            fixed_batch=True,
                                            expected_width=num_snps)
    else:
        def forward(x, adj, snps):
            if np_dtype is not None:  # inputs are per-request; params not
                x, adj, snps = (v.astype(np_dtype) for v in (x, adj, snps))
            with lock:
                # fixed_batch: every cohort up to `batch` subjects pads to
                # the SAME (1, batch, ...) shapes and reuses the warmed
                # program (larger cohorts compile once per distinct batch
                # count)
                return batched_forward(model, params, batch_stats, x, adj,
                                       snps, batch_size=batch,
                                       forward_scan=scan, fixed_batch=True)

    # warm the compile before accepting traffic: the first real request
    # should pay milliseconds, not the jit compile
    if snps_only:
        forward(np.zeros((1, num_snps), np.float32))
    else:
        forward(np.zeros((1, cfg.rois, cfg.feat_dim), np.float32),
                np.zeros((1, cfg.rois, cfg.rois), np.float32),
                np.zeros((1, cfg.num_snps), np.float32))

    # request-level observability for GET /stats: counters + a ring of the
    # last 200 request latencies (wall time around parse+inference, i.e.
    # what the client experiences minus network)
    import collections
    import time as _time

    stats_lock = threading.Lock()
    started = _time.monotonic()
    counters = {"requests": 0, "errors": 0, "subjects_scored": 0}
    latencies: collections.deque = collections.deque(maxlen=200)

    def _record(ok: bool, subjects: int, dt_s: float) -> None:
        with stats_lock:
            counters["requests"] += 1
            if not ok:
                counters["errors"] += 1
            counters["subjects_scored"] += subjects
            latencies.append(dt_s)

    def _stats() -> dict:
        with stats_lock:
            lat = sorted(latencies)
            snap = dict(counters)
        out = {**snap, "uptime_s": round(_time.monotonic() - started, 1)}
        if lat:
            out["latency_ms"] = {
                "last": round(latencies[-1] * 1e3, 1),
                "p50": round(lat[len(lat) // 2] * 1e3, 1),
                "p95": round(lat[min(len(lat) - 1,
                                     int(len(lat) * 0.95))] * 1e3, 1),
                "window": len(lat),
            }
        return out

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route access logs to stderr
            sys.stderr.write(f"[serve] {self.address_string()} "
                             f"{fmt % args}\n")

        def _reply(self, code, body, content_type):
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code, obj):
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/health":
                self._reply_json(200, health)
            elif self.path == "/stats":
                self._reply_json(200, _stats())
            else:
                self._reply_json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply_json(404, {"error": f"no route {self.path}"})
                return
            t0 = _time.monotonic()
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                n = 0
            if n <= 0:
                self._reply_json(400, {"error": "missing Content-Length"})
                _record(False, 0, _time.monotonic() - t0)
                return
            if n > MAX_BODY_BYTES:
                self._reply_json(
                    413, {"error": f"body {n} bytes exceeds the "
                                   f"{MAX_BODY_BYTES}-byte cap"})
                _record(False, 0, _time.monotonic() - t0)
                return
            want = ("snps",) if snps_only else ("x", "adj", "snps")
            try:
                with np.load(io.BytesIO(self.rfile.read(n)),
                             allow_pickle=False) as zf:
                    args = tuple(np.asarray(zf[k], np.float32)
                                 for k in want)
            except Exception as e:
                self._reply_json(
                    400, {"error": f"bad request body (want npz with "
                                   f"{'/'.join(want)}): {e}"})
                _record(False, 0, _time.monotonic() - t0)
                return
            try:
                out = forward(*args)
            except Exception as e:
                self._reply_json(500, {"error": f"inference failed: {e}"})
                _record(False, 0, _time.monotonic() - t0)
                return
            buf = io.BytesIO()
            np.savez(buf, **out)
            self._reply(200, buf.getvalue(), "application/octet-stream")
            _record(True, int(args[-1].shape[0]), _time.monotonic() - t0)

    return ThreadingHTTPServer((host, port), Handler)


def build_parser() -> argparse.ArgumentParser:
    """Parser construction hoisted from main() so the CLI reference
    (tools/gen_docs.py) can render it without side effects."""
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("bundle", help="npz written by save_bundle")
    p.add_argument("--npz", help="cohort npz with x/adj/snps arrays")
    p.add_argument("--out", help="output predictions npz")
    p.add_argument("--http", type=int, metavar="PORT",
                   help="run a long-lived HTTP daemon on this port instead "
                        "of one-shot scoring (GET /health, GET /stats, POST /predict)")
    p.add_argument("--host", default="127.0.0.1",
                   help="HTTP bind address (default loopback; set 0.0.0.0 "
                        "to expose)")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--bf16", action="store_true",
                   help="serve in bfloat16 (fp32 agreement pinned by "
                        "tests/test_predict.py)")
    return p


def main(argv=None):
    from iggcn_tpu.utils.platform import honor_platform_env

    honor_platform_env()   # JAX_PLATFORMS=cpu must actually mean cpu
    from iggcn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # warm compiles + dead-tunnel watchdog
    p = build_parser()
    args = p.parse_args(argv)
    if args.http is None and (args.npz is None or args.out is None):
        p.error("--npz and --out are required unless --http is given")
    if args.http is not None and (args.npz is not None or
                                  args.out is not None):
        p.error("--http is a daemon mode and does not score a cohort; "
                "drop --npz/--out (or drop --http for one-shot scoring)")

    import jax.numpy as jnp

    from iggcn_tpu.predict import batched_forward

    model, params, batch_stats = load_bundle(args.bundle)
    if args.http is not None:
        server = build_http_server(
            model, params, batch_stats, host=args.host, port=args.http,
            batch=args.batch, dtype=jnp.bfloat16 if args.bf16 else None)
        host, port = server.server_address[:2]
        print(f"serving {type(model).__name__} on http://{host}:{port} "
              f"(batch {args.batch}, "
              f"{'bf16' if args.bf16 else 'fp32'}; Ctrl-C to stop)",
              file=sys.stderr)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.server_close()
        return
    y_true = None
    if not hasattr(model, "cfg"):
        # SNP-only bundle: the cohort npz needs just the snps matrix
        from iggcn_tpu.predict import batched_forward_snps
        with np.load(args.npz) as zf:
            snps = np.asarray(zf["snps"], np.float32)
            if "y" in zf.files:
                y_true = np.asarray(zf["y"]).reshape(-1)
        topo = getattr(model, "topo", None)
        width = (int(topo.num_snps) if topo is not None
                 else _infer_input_width(params))
        out = batched_forward_snps(model, params, batch_stats, snps,
                                   batch_size=args.batch,
                                   dtype=jnp.bfloat16 if args.bf16 else None,
                                   expected_width=width)
    else:
        with np.load(args.npz) as zf:
            x, adj, snps = (np.asarray(zf[k], np.float32)
                            for k in ("x", "adj", "snps"))
            if "y" in zf.files:
                y_true = np.asarray(zf["y"]).reshape(-1)
        out = batched_forward(model, params, batch_stats, x, adj, snps,
                              batch_size=args.batch,
                              dtype=jnp.bfloat16 if args.bf16 else None)
    np.savez(args.out, **out)
    counts = np.bincount(out["pred"].astype(int))
    print(f"served {snps.shape[0]} subjects -> {args.out} "
          f"(class counts {counts.tolist()})", file=sys.stderr)
    if y_true is not None and y_true.shape[0] == out["pred"].shape[0]:
        # labeled cohort (iggcn-export-cohort keeps y by default):
        # offline evaluation of the served predictions
        acc = float((out["pred"].astype(int) == y_true.astype(int)).mean())
        msg = f"accuracy vs provided labels: {acc:.4f}"
        score = None
        if "log_probs" in out and out["log_probs"].shape[1] == 2:
            score = out["log_probs"][:, 1]
        elif "prob" in out:                        # SNP-only families
            score = np.asarray(out["prob"]).reshape(-1)
        if score is not None and len(np.unique(y_true)) == 2:
            from iggcn_tpu.train.metrics import classification_metrics
            cm = classification_metrics(
                y_true.astype(np.int64), out["pred"].astype(np.int64),
                score, 2)
            msg += f", auc: {cm['auc']:.4f}"
        print(msg, file=sys.stderr)


if __name__ == "__main__":
    main()
