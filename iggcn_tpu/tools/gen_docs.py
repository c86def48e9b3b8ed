"""Generate ``docs/cli.md`` from the argparse parsers themselves.

The reference documents its CLI only through a README example and the
``--help`` text of ``main.py`` (reference ``main.py:35-113``); flags and
defaults drift silently. Here the parsers are the single source of truth:
every entry point exposes a side-effect-free ``build_parser()``, this tool
renders them all to one markdown reference, and ``tests/test_docs.py``
regenerates the document and fails the suite on any drift — a flag can no
longer change without its documentation changing in the same commit.

Usage:
  python -m iggcn_tpu.tools.gen_docs          # rewrite docs/cli.md
  python -m iggcn_tpu.tools.gen_docs --check  # exit 1 if docs/cli.md is stale
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import List

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DOC_PATH = os.path.join(REPO_ROOT, "docs", "cli.md")

HEADER = """\
# Command-line reference

<!-- GENERATED FILE — do not edit by hand.
     Regenerate with: python -m iggcn_tpu.tools.gen_docs
     tests/test_docs.py fails the suite when this file is stale. -->

All entry points honor `JAX_PLATFORMS=cpu` (re-asserted past the
plugin-prepending image quirk, `iggcn_tpu/utils/platform.py`) and share the
persistent compilation cache. Flag names, defaults, and help strings below
are rendered from the argparse parsers themselves.
"""


def _flag_cell(action: argparse.Action) -> str:
    if not action.option_strings:          # positional
        return f"`{action.dest}`"
    return " / ".join(f"`{s}`" for s in action.option_strings)


def _type_cell(action: argparse.Action) -> str:
    if isinstance(action, argparse.BooleanOptionalAction):
        return "bool"
    if isinstance(action, (argparse._StoreTrueAction,
                           argparse._StoreFalseAction)):
        return "flag"
    if action.choices:
        return " \\| ".join(str(c) for c in action.choices)
    if action.type is int:
        return "int"
    if action.type is float:
        return "float"
    return "str"


def _default_cell(action: argparse.Action) -> str:
    if isinstance(action, argparse._StoreTrueAction):
        return "off"
    if isinstance(action, argparse._StoreFalseAction):
        return "on"
    if isinstance(action, argparse.BooleanOptionalAction):
        return "on" if action.default else "off"
    if not action.option_strings:
        return "(required)"
    if action.default is None:
        return "—"
    if action.default == "":
        return '`""`'
    return f"`{action.default}`"


def _escape(text: str) -> str:
    return text.replace("|", "\\|").replace("\n", " ")


def render_parser(parser: argparse.ArgumentParser) -> str:
    rows = ["| flag | type | default | description |",
            "|---|---|---|---|"]
    for action in parser._actions:
        if isinstance(action, argparse._HelpAction):
            continue
        rows.append(
            f"| {_flag_cell(action)} | {_type_cell(action)} "
            f"| {_default_cell(action)} | {_escape(action.help or '')} |")
    return "\n".join(rows)


def _import_main_module():
    if REPO_ROOT not in sys.path:
        sys.path.insert(0, REPO_ROOT)
    import main as main_mod
    return main_mod


def render_cli_md() -> str:
    main_mod = _import_main_module()
    from iggcn_tpu.tools import (doctor, explain, export_cohort,
                                 import_torch, profile_step, report, serve)

    parts: List[str] = [HEADER]

    parts.append("## `main.py` — experiment driver (`iggcn-train`)\n")
    parts.append(
        "Cross-validated training for every model family. `--model` "
        "routes to the matching trainer (unknown names abort with the "
        "full list):\n")
    parts.append("| family | `--model` names | trainer |")
    parts.append("|---|---|---|")
    fusion = ", ".join(f"`{m}`" for m in main_mod.FUSION_MODELS)
    zoo = ", ".join(f"`{m}`" for m in main_mod.ZOO_MODELS)
    snp = ", ".join(f"`{m}`" for m in main_mod.SNP_MODELS)
    parts.append(f"| fused imaging-genetics + image-only SGCN | {fusion} "
                 "| `train/cv.py` (fold-scan / fold-parallel) |")
    parts.append(f"| baseline / pooling / nested zoo | {zoo} "
                 "| `train/generic_cv.py` |")
    parts.append(f"| SNP-only | {snp} | `train/snps_trainer.py` |")
    parts.append("")
    parts.append(render_parser(main_mod.build_parser()))

    for title, blurb, mod in (
        ("## `iggcn_tpu.tools.doctor` (`iggcn-doctor`)",
         "Pre-flight validation of real data layouts (files, mat keys, "
         "shapes, cross-file agreement, GO parseability). Host-side only — "
         "never initializes a jax backend. Exit 0 = all checks pass.",
         doctor),
        ("## `iggcn_tpu.tools.serve` (`iggcn-serve`)",
         "Score a cohort npz against a serving bundle (one-shot), or run a "
         "long-lived HTTP daemon (`GET /health`, `POST /predict`).",
         serve),
        ("## `iggcn_tpu.tools.explain` (`iggcn-explain`)",
         "Export learned ROI/edge/SNP importances (and grad-CAM saliency "
         "for the SGCN image family) from a checkpoint or serving bundle.",
         explain),
        ("## `iggcn_tpu.tools.profile_step`",
         "Trace N real train steps with `jax.profiler` and print the "
         "per-op device-time histogram (the megakernel closure memo's "
         "measurement tool, BASELINE.md).",
         profile_step),
        ("## `iggcn_tpu.tools.report` (`iggcn-report`)",
         "Aggregate results dirs into a summary table (best epoch by "
         "fold-mean accuracy, acc ± std, auc/f1/sen/spe) from the per-fold "
         "result records, and compute permutation p-values of observed "
         "accuracies against `--isPermutTest` null runs. Host-side only.",
         report),
        ("## `iggcn_tpu.tools.export_cohort` (`iggcn-export-cohort`)",
         "Convert a reference-layout data dir into a serving cohort npz "
         "using the training loaders themselves (same diffusion/scaling), "
         "ready for `iggcn-serve --npz` or the daemon's `/predict`. "
         "Host-side only.",
         export_cohort),
        ("## `iggcn_tpu.tools.import_torch` (`iggcn-import-torch`)",
         "Convert a reference-trained torch checkpoint "
         "(`gcn_state_dict_*.pt`, the fused SGCN_GCN_IMGSNP family — the "
         "only checkpoint the reference writes, and one it never loads "
         "back) into a serving bundle. Architecture is inferred from the "
         "tensor shapes; the GO topology must be supplied (same sources "
         "the training run used) because the checkpoint stores only the "
         "sparse gene-coding VALUE vectors.",
         import_torch),
    ):
        parts.append("")
        parts.append(title + "\n")
        parts.append(blurb + "\n")
        parts.append(render_parser(mod.build_parser()))

    parts.append("")
    parts.append("## Environment variables\n")
    parts.append("| variable | effect |")
    parts.append("|---|---|")
    for var, effect in (
        ("`JAX_PLATFORMS`", "force the backend (`cpu` to bypass the TPU "
         "tunnel); re-asserted via `jax.config.update` because this "
         "image's axon plugin prepends itself to the platform list"),
        ("`XLA_FLAGS=--xla_force_host_platform_device_count=N`",
         "expose N virtual CPU devices (multi-chip tests / dryruns)"),
        ("`IGGCN_BENCH_PALLAS=1`", "run the imaging GCN stack as the "
         "fused Pallas kernel inside bench.py (measured slower; "
         "BASELINE.md)"),
        ("`IGGCN_BENCH_PROBE_RETRIES` / `IGGCN_BENCH_PROBE_RETRY_SLEEP_S`",
         "bound the dead-tunnel probe-retry window used by bench.py and "
         "the driver entry points (0 retries disables)"),
    ):
        parts.append(f"| {var} | {effect} |")
    parts.append("")
    return "\n".join(parts)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--check", action="store_true",
                   help="exit 1 if docs/cli.md differs from the parsers")
    args = p.parse_args(argv)
    text = render_cli_md()
    if args.check:
        on_disk = (open(DOC_PATH).read()
                   if os.path.isfile(DOC_PATH) else "")
        if on_disk != text:
            print("docs/cli.md is stale; regenerate with "
                  "python -m iggcn_tpu.tools.gen_docs", file=sys.stderr)
            return 1
        print("docs/cli.md is up to date")
        return 0
    os.makedirs(os.path.dirname(DOC_PATH), exist_ok=True)
    with open(DOC_PATH, "w") as fh:
        fh.write(text)
    print(f"wrote {DOC_PATH}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
