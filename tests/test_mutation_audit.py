"""The mutation-audit machinery itself must work end to end: two FAST cases
(StepLR off-by-one vs the lr-schedule pins; val-fold off-by-one vs the
split pins) run through the real subprocess + `IGGCN_MUTATION` conftest
hook. The full twelve-mutation audit is `scripts/mutation_audit.py`
(results recorded in R3_NOTES.md)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from mutation_audit import run_pytest  # noqa: E402


def test_steplr_mutation_is_caught_and_control_is_green():
    assert run_pytest("tests/test_lr_schedule.py",
                      mutation="steplr_off_by_one") != 0, (
        "the lr-schedule tests did not catch the StepLR off-by-one mutation")
    assert run_pytest("tests/test_lr_schedule.py") == 0, (
        "control run failed — the target test is red without any mutation")


def test_kfold_mutation_is_caught_and_control_is_green():
    assert run_pytest("tests/test_splits.py",
                      mutation="kfold_val_is_next") != 0, (
        "the split pins did not catch the val-fold off-by-one mutation")
    assert run_pytest("tests/test_splits.py") == 0, (
        "control run failed — the target test is red without any mutation")


def test_unknown_mutation_fails_loudly():
    assert run_pytest("tests/test_lr_schedule.py", mutation="bogus") != 0
