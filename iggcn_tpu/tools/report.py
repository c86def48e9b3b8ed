"""Results aggregator: summarize experiment dirs, compute permutation p-values.

The reference leaves analysis to the user: it prints one `Result - ...`
line per run, writes per-epoch score matrices as bare npys
(`kernel/train_eval_sgcn_img_snps.py:228-239`), and its permutation-test
mode (`--isPermutTest`) produces null runs it never aggregates. This tool
closes that loop host-side (no jax):

  * `collect_dir` reads every per-fold result record
    (`fold_result_*.npz`, written by all three trainers — present even for
    permutation runs, whose npy artifacts are suppressed for reference
    parity) plus legacy `result_*.npy` score matrices, and derives the
    reported surface: best epoch by fold-mean accuracy, acc +/- std across
    folds, and the other four metrics at that epoch.
  * `--permut_null` computes the standard permutation p-value
    p = (1 + #{null >= observed}) / (1 + N) of the observed best accuracy
    against the null runs' best accuracies.

Usage:
  python -m iggcn_tpu.tools.report results/ADNI_a [results/ADNI_b ...]
  python -m iggcn_tpu.tools.report results/ADNI_a \
      --permut_null results_permuttest/ADNI_p1 results_permuttest/ADNI_p2
  python -m iggcn_tpu.tools.report results/ADNI_a --csv summary.csv
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from typing import Dict, List, Optional

import numpy as np

METRIC_NAMES = ("acc", "auc", "f1", "sen", "spe")
_RECORD_RE = re.compile(r"fold_result_(.+)_fold_(\d+)\.npz$")


def _score_matrix_rows(tag: str, mats: List[np.ndarray],
                       src: str) -> Optional[Dict]:
    """Aggregate per-fold (E, 5) score matrices into one summary row."""
    epochs = {m.shape[0] for m in mats}
    if len(epochs) != 1:
        print(f"[report] {src}: fold records of {tag} disagree on epoch "
              f"count {sorted(epochs)}; skipping", file=sys.stderr)
        return None
    score = np.stack(mats)                      # (folds, E, 5)
    acc_mean = score[:, :, 0].mean(axis=0)
    best = int(acc_mean.argmax())
    row = {
        "dir": src, "tag": tag,
        "folds": score.shape[0], "epochs": score.shape[1],
        "best_epoch": best,
        "acc": float(acc_mean[best]),
        "acc_std": float(score[:, best, 0].std(ddof=1)
                         if score.shape[0] > 1 else 0.0),
    }
    for i, name in enumerate(METRIC_NAMES[1:], start=1):
        row[name] = float(score[:, best, i].mean())
    return row


def collect_dir(res_dir: str) -> List[Dict]:
    """Summary rows for one results dir (one row per model/config tag)."""
    rows: List[Dict] = []
    groups: Dict[str, Dict[int, np.ndarray]] = {}
    for path in sorted(glob.glob(os.path.join(res_dir, "fold_result_*.npz"))):
        m = _RECORD_RE.search(os.path.basename(path))
        if not m:
            continue
        tag, fold = m.group(1), int(m.group(2))
        try:
            with np.load(path) as zf:
                if "score_result_epoch" in zf.files:      # fused / snps
                    mat = np.asarray(zf["score_result_epoch"], np.float64)
                else:                                      # generic zoo
                    accs = np.asarray(zf["accs"], np.float64)
                    mat = np.full((accs.shape[0], 5), np.nan)
                    mat[:, 0] = accs
        except Exception as e:
            print(f"[report] skipping unreadable {path} ({e})",
                  file=sys.stderr)
            continue
        groups.setdefault(tag, {})[fold] = mat
    for tag, by_fold in sorted(groups.items()):
        row = _score_matrix_rows(tag, [by_fold[f] for f in sorted(by_fold)],
                                 res_dir)
        if row is not None:
            rows.append(row)
    # legacy aggregated score matrices (runs that predate fold records)
    seen = {r["tag"] for r in rows}
    for path in sorted(glob.glob(os.path.join(res_dir, "result_*.npy"))):
        tag = os.path.basename(path)[len("result_"):-len(".npy")]
        if ("result_" + tag) in seen or tag in seen:
            continue
        try:
            score = np.load(path)
        except Exception as e:
            print(f"[report] skipping unreadable {path} ({e})",
                  file=sys.stderr)
            continue
        if score.ndim != 3 or score.shape[2] != 5:
            continue
        row = _score_matrix_rows("result_" + tag, list(score), res_dir)
        if row is not None and row["tag"] not in seen:
            rows.append(row)
    return rows


def _fmt(v) -> str:
    if isinstance(v, float):
        return "nan" if np.isnan(v) else f"{v:.4f}"
    return str(v)


COLUMNS = ("dir", "tag", "folds", "epochs", "best_epoch", "acc", "acc_std",
           "auc", "f1", "sen", "spe")


def render_table(rows: List[Dict]) -> str:
    lines = ["| " + " | ".join(COLUMNS) + " |",
             "|" + "---|" * len(COLUMNS)]
    for r in rows:
        lines.append("| " + " | ".join(_fmt(r.get(c, "")) for c in COLUMNS)
                     + " |")
    return "\n".join(lines)


def render_csv(rows: List[Dict]) -> str:
    lines = [",".join(COLUMNS)]
    for r in rows:
        lines.append(",".join(_fmt(r.get(c, "")) for c in COLUMNS))
    return "\n".join(lines) + "\n"


def permutation_pvalue(observed_rows: List[Dict], null_dirs: List[str]
                       ) -> List[Dict]:
    """Permutation p-value per observed tag: the observed statistic is the
    best fold-mean accuracy; the null distribution is the same statistic
    over the permutation runs (label-pairing shuffled, --isPermutTest).
    p = (1 + #{null >= obs}) / (1 + N) — the add-one estimator, unbiased
    under the null and never exactly zero."""
    null_rows: List[Dict] = []
    for d in null_dirs:
        null_rows.extend(collect_dir(d))
    out = []
    for obs in observed_rows:
        nulls = [r["acc"] for r in null_rows if r["tag"] == obs["tag"]]
        if not nulls:
            print(f"[report] no null runs found for tag {obs['tag']}",
                  file=sys.stderr)
            continue
        ge = sum(1 for a in nulls if a >= obs["acc"] - 1e-12)
        out.append({
            "tag": obs["tag"], "observed_acc": obs["acc"],
            "null_n": len(nulls),
            "null_mean": float(np.mean(nulls)),
            "null_max": float(np.max(nulls)),
            "p_value": (1 + ge) / (1 + len(nulls)),
        })
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("results_dirs", nargs="+",
                   help="experiment results dir(s) (results/ADNI_<appendix>)")
    p.add_argument("--permut_null", nargs="*", default=None,
                   help="permutation-run dirs (results_permuttest/...) to "
                        "compute p-values for the observed accuracies")
    p.add_argument("--csv", default=None,
                   help="also write the summary as CSV to this path")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    rows = []
    for d in args.results_dirs:
        rows.extend(collect_dir(d))
    if not rows:
        print("[report] no result records found (fold_result_*.npz / "
              "result_*.npy) in the given dirs", file=sys.stderr)
        return 1
    print(render_table(rows))
    if args.csv:
        with open(args.csv, "w") as fh:
            fh.write(render_csv(rows))
        print(f"[report] wrote {args.csv}", file=sys.stderr)
    if args.permut_null is not None:
        pv = permutation_pvalue(rows, args.permut_null)
        if not pv:
            return 1
        print()
        cols = ("tag", "observed_acc", "null_n", "null_mean", "null_max",
                "p_value")
        print("| " + " | ".join(cols) + " |")
        print("|" + "---|" * len(cols))
        for r in pv:
            print("| " + " | ".join(_fmt(r[c]) for c in cols) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
