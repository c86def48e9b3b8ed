"""Test-sensitivity audit: prove the parity suite catches real bugs.

For each named mutation in `tests/mutations.py` — a realistic semantic
drift of the kind a porter actually writes (StepLR off-by-one, biased BN
running variance, decoupled weight decay, dropped self-loops, a lost loss
term) — run the pinned target test in a subprocess with `IGGCN_MUTATION`
set and assert it FAILS; then run every target once unmutated and assert
it PASSES (so the failures above are attributable to the mutations, not
to flaky targets).

This is the generalization of the adversarial-sensitivity argument the
golden GO test makes for itself (`tests/test_golden_go.py`): a green suite
only certifies parity if a plausibly-wrong implementation turns it red.

Usage:
    env JAX_PLATFORMS=cpu python scripts/mutation_audit.py [names...]

Prints one line per case and a final JSON summary; exit 1 when any
mutation SURVIVES (target stays green) or any control fails.
Runtime: ~15-20 min for all eighteen on a warm compile cache (several
targets are 6-step trajectory suites; the data-layer targets run in
seconds).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.mutations import MUTATIONS, TARGETS  # noqa: E402


def run_pytest(target: str, mutation: str = "") -> int:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if mutation:
        env["IGGCN_MUTATION"] = mutation
    else:
        env.pop("IGGCN_MUTATION", None)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", target, "-x", "-q",
         "--no-header", "-p", "no:cacheprovider"],
        cwd=REPO, env=env, capture_output=True, text=True)
    return proc.returncode


def main(argv=None) -> int:
    names = (argv if argv else sys.argv[1:]) or sorted(MUTATIONS)
    unknown = [n for n in names if n not in MUTATIONS]
    if unknown:
        print(f"unknown mutation(s) {unknown}; known: {sorted(MUTATIONS)}")
        return 2

    results = {}
    for name in names:
        target = TARGETS[name]
        rc = run_pytest(target, mutation=name)
        caught = rc != 0
        results[name] = {"target": target, "caught": caught}
        print(f"[mutation] {name:28s} -> {target}: "
              f"{'CAUGHT' if caught else 'SURVIVED (bad)'}", flush=True)

    controls = {}
    for target in sorted({TARGETS[n] for n in names}):
        rc = run_pytest(target)
        controls[target] = rc == 0
        print(f"[control]  {target}: "
              f"{'green' if rc == 0 else 'RED (bad)'}", flush=True)

    ok = (all(r["caught"] for r in results.values())
          and all(controls.values()))
    print(json.dumps({"mutations": results, "controls": controls,
                      "ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
