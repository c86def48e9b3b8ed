"""Per-fusion device-time histogram of the flagship train step.

The r2 bottleneck statement ("the ceiling is the long tail of tiny
non-matmul ops") rested on op COUNTS from compiled HLO; this tool grounds
it in a real device profile: it traces N train steps at a given batch
size with `jax.profiler`, reads the trace back programmatically
(`jax.profiler.ProfileData` — no TensorBoard round trip), and aggregates
XLA op/fusion durations on the device plane.

Usage:
  python -m iggcn_tpu.tools.profile_step [--batch 256] [--steps 20]
      [--top 20] [--out trace_dir]

Prints the top-k entries by total device time with their share of the
step, plus a category rollup (matmul/conv vs elementwise-fusion vs
reduce vs copy/layout vs other) — the evidence base for the megakernel
closure memo in BASELINE.md.
"""
from __future__ import annotations

import argparse
import collections
import re
import tempfile

import numpy as np


def build_step(batch: int):
    """The bench's fused train-step program at the real GO scale."""
    import jax

    from iggcn_tpu.config import ModelConfig, TrainConfig
    from iggcn_tpu.data.adni import synthetic_cohort
    from iggcn_tpu.data.batching import cohort_batch_arrays, pad_to_batches, to_device
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.fused_sgcn import FusedSGCN
    from iggcn_tpu.train.steps import (TrainState, make_optimizer,
                                       make_train_step)

    rng = np.random.default_rng(0)
    topo = synthetic_topology(rng, level_sizes=[250, 120, 50, 15, 1])
    cohort = synthetic_cohort(rng, num_subjects=batch)
    mcfg = ModelConfig(num_layers=2, hidden=16)
    tcfg = TrainConfig(epochs=1, batch_size=batch)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    arrays = cohort_batch_arrays(cohort)
    arrays.pop("sbj_id")
    data = to_device(pad_to_batches(arrays, batch))
    batch_dict = {k: v[:batch] for k, v in data.items()}
    optimizer = make_optimizer(tcfg)
    step = jax.jit(make_train_step(model, mcfg, tcfg, optimizer),
                   donate_argnums=(0,))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        np.zeros((batch, mcfg.rois, mcfg.feat_dim), np.float32),
        np.zeros((batch, mcfg.rois, mcfg.rois), np.float32),
        np.zeros((batch, mcfg.num_snps), np.float32))
    state = TrainState.create(variables, optimizer, 1)
    return step, state, batch_dict


CATEGORIES = (
    # async DMA staging: overlapped with compute by XLA's pipeliner; their
    # summed engine time routinely EXCEEDS the step wall
    ("async DMA (overlapped)",
     re.compile(r"(copy|slice|all-gather|all-reduce|collective).*-(start|done)", re.I)),
    ("matmul/conv (MXU)", re.compile(r"dot|conv|einsum|matmul", re.I)),
    ("fused elementwise/loop", re.compile(r"fusion", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("copy/layout/transpose", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("rng", re.compile(r"rng|threefry", re.I)),
)


def categorize(name: str) -> str:
    """Categorize by the op-name PREFIX only (the text before ' = '): the
    full HLO line includes operand/callee text, where e.g. a loop fusion
    calling %fused_reduce would falsely match 'reduce'."""
    op = name.split(" = ")[0].lstrip("%")
    for label, pat in CATEGORIES:
        if pat.search(op):
            return label
    return "other"


def collect_histogram(trace_dir: str):
    """Aggregate (name -> [total_ns, count]) over XLA-op device-plane
    events of the trace at `trace_dir`."""
    from jax.profiler import ProfileData

    data = ProfileData.from_serialized_xspace(_read_xspace(trace_dir))
    hist = collections.defaultdict(lambda: [0.0, 0])
    seen_lines = []
    for plane in data.planes:
        pname = plane.name.lower()
        if not ("device" in pname or "tpu" in pname or "/device:" in pname):
            continue
        for line in plane.lines:
            seen_lines.append(f"{plane.name}/{line.name}")
            # restrict to the per-op timeline; module/step/annotation lines
            # would double-count every nested op
            if "xla op" not in line.name.lower():
                continue
            for event in line.events:
                name = event.name
                hist[name][0] += event.duration_ns
                hist[name][1] += 1
    if not hist:
        raise RuntimeError("no 'XLA Ops' line found on a device plane; "
                           f"lines seen: {seen_lines}")
    return hist


def _read_xspace(trace_dir: str) -> bytes:
    import glob
    import os
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    with open(max(paths, key=os.path.getmtime), "rb") as fh:
        return fh.read()


def build_parser() -> argparse.ArgumentParser:
    """Parser construction hoisted from main() so the CLI reference
    (tools/gen_docs.py) can render it without side effects."""
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--out", default=None,
                   help="trace directory (default: a temp dir)")
    return p


def main(argv=None):
    from iggcn_tpu.utils.platform import honor_platform_env

    honor_platform_env()   # JAX_PLATFORMS=cpu must actually mean cpu
    args = build_parser().parse_args(argv)

    import jax

    from iggcn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    step, state, batch_dict = build_step(args.batch)
    rng = jax.random.PRNGKey(1)
    # warm up / compile outside the trace
    state, loss = step(state, batch_dict, rng)
    _ = float(loss)

    out_dir = args.out or tempfile.mkdtemp(prefix="iggcn_profile_")
    jax.profiler.start_trace(out_dir)
    for _ in range(args.steps):
        state, loss = step(state, batch_dict, rng)
    _ = float(loss)          # force completion inside the trace
    jax.profiler.stop_trace()

    hist = collect_histogram(out_dir)
    total = sum(t for t, _ in hist.values()) or 1.0
    print(f"# trace: {out_dir}  steps={args.steps} batch={args.batch}")
    print(f"# total device op time: {total/1e6:.2f} ms "
          f"({total/1e3/args.steps:.0f} us/step)")
    rows = sorted(hist.items(), key=lambda kv: -kv[1][0])
    print(f"{'us/step':>9} {'share':>6} {'count':>6}  name")
    for name, (t, c) in rows[:args.top]:
        print(f"{t/1e3/args.steps:9.1f} {t/total*100:5.1f}% {c:6d}  "
              f"{name[:90]}")
    cats = collections.defaultdict(float)
    for name, (t, _) in hist.items():
        cats[categorize(name)] += t
    print("\n# category rollup")
    for label, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{t/1e3/args.steps:9.1f} us/step {t/total*100:5.1f}%  {label}")


if __name__ == "__main__":
    main()
