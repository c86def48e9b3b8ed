"""`--batch_file`: many experiment command lines in ONE process.

The reference's sweep workflow is one process per run, each paying the
full fixed cost (backend init, compile, data prep). The batch runner
executes each line of a file as its own main.py invocation in-process,
with keep-going semantics and a non-zero exit if any line failed.
"""
import os

import numpy as np
import pytest

import main as cli


def test_batch_file_runs_lines_and_skips_comments(tmp_path, monkeypatch,
                                                  capsys):
    """Each non-empty, non-# line dispatches as its own experiment (mocked
    trainer), in order, with per-line headers and a success tally."""
    import iggcn_tpu.train.generic_cv as gmod

    runs = []

    def fake_generic(dataset, model, *, seed, record_dir, **kw):
        runs.append((type(model).__name__, seed, record_dir))
        return gmod.GenericCVResult(best_acc=0.5, best_acc_std=0.0,
                                    accs=np.zeros((3, 1)), mean_loss=1.0)

    monkeypatch.setattr(gmod, "cross_validation_generic", fake_generic)
    monkeypatch.chdir(tmp_path)
    base = ("--synthetic --synthetic_subjects 24 --no-search --epochs 1 "
            "--fold 3 --cohort_cache_dir '' ")
    (tmp_path / "runs.txt").write_text(
        "# a comment line\n"
        "\n"
        f"{base} --model GCN --seed 3 --save_appendix _b1\n"
        f"{base} --model GIN --seed 7 --save_appendix _b2\n")
    cli.main(["--batch_file", "runs.txt"])
    assert [(r[0], r[1]) for r in runs] == [("GCNFlat", 3), ("GIN", 7)]
    assert runs[0][2].endswith(os.path.join("results", "ADNI_b1"))
    out = capsys.readouterr().out
    assert "[batch] 1/2 (line 3):" in out
    assert "[batch] 2/2 (line 4):" in out
    assert "[batch] 2/2 experiments succeeded" in out


def test_batch_file_keep_going_and_exit_code(tmp_path, monkeypatch, capsys):
    """A failing line (unknown model -> parser SystemExit) is reported, the
    NEXT line still runs, and the batch exits 1."""
    import iggcn_tpu.train.generic_cv as gmod

    runs = []

    def fake_generic(dataset, model, *, seed, record_dir, **kw):
        runs.append(seed)
        return gmod.GenericCVResult(best_acc=0.5, best_acc_std=0.0,
                                    accs=np.zeros((3, 1)), mean_loss=1.0)

    monkeypatch.setattr(gmod, "cross_validation_generic", fake_generic)
    monkeypatch.chdir(tmp_path)
    base = ("--synthetic --synthetic_subjects 24 --no-search --epochs 1 "
            "--fold 3 --cohort_cache_dir '' ")
    (tmp_path / "runs.txt").write_text(
        f"{base} --model BOGUS --save_appendix _x\n"
        f"{base} --model GCN --seed 5 --save_appendix _y\n")
    with pytest.raises(SystemExit) as ei:
        cli.main(["--batch_file", "runs.txt"])
    assert ei.value.code == 1
    assert runs == [5]                       # line 2 ran despite line 1
    cap = capsys.readouterr()
    assert "1/2 experiments succeeded" in cap.out
    assert "FAILED line 1" in cap.err


def test_batch_file_validation(tmp_path, monkeypatch, capsys):
    """Extra CLI flags, nested --batch_file lines, unreadable and empty
    files all fail loudly."""
    monkeypatch.chdir(tmp_path)
    (tmp_path / "runs.txt").write_text("--synthetic\n")
    with pytest.raises(SystemExit):
        cli.main(["--batch_file", "runs.txt", "--epochs", "5"])
    assert "self-contained" in capsys.readouterr().err

    with pytest.raises(SystemExit):
        cli.main(["--batch_file", "missing.txt"])
    assert "cannot read" in capsys.readouterr().err

    (tmp_path / "empty.txt").write_text("# only comments\n\n")
    with pytest.raises(SystemExit):
        cli.main(["--batch_file", "empty.txt"])
    assert "no runnable lines" in capsys.readouterr().err

    (tmp_path / "nested.txt").write_text("--batch_file other.txt\n")
    with pytest.raises(SystemExit) as ei:
        cli.main(["--batch_file", "nested.txt"])
    assert ei.value.code == 1
    assert "does not nest" in capsys.readouterr().err


def test_batch_file_real_runs_match_standalone(tmp_path, monkeypatch):
    """Two real (tiny) zoo experiments through one batch produce the same
    fold records as the same command lines run standalone."""
    monkeypatch.chdir(tmp_path)
    base = ("--synthetic --synthetic_subjects 24 --no-search --epochs 2 "
            "--fold 3 --model GCN --layers 1 --hiddens 4 "
            "--cohort_cache_dir ''")
    (tmp_path / "runs.txt").write_text(
        f"{base} --seed 5 --save_appendix _ba\n"
        f"{base} --seed 9 --save_appendix _bb\n")
    cli.main(["--batch_file", "runs.txt"])
    cli.main(base.split() + ["--seed", "5", "--save_appendix", "_sa"])
    cli.main(base.split() + ["--seed", "9", "--save_appendix", "_sb"])

    rec = "fold_result_generic_GCN_layers1_hidden4_h2_fold_0.npz"
    for b_dir, s_dir in (("ADNI_ba", "ADNI_sa"), ("ADNI_bb", "ADNI_sb")):
        pb = os.path.join(str(tmp_path), "results", b_dir, rec)
        ps = os.path.join(str(tmp_path), "results", s_dir, rec)
        with np.load(pb) as zb, np.load(ps) as zs:
            assert np.array_equal(zb["losses"], zs["losses"])
            assert np.array_equal(zb["accs"], zs["accs"])

    # each batch job's cmd_input.txt records ITS OWN command line (the
    # reproducible one), not the outer --batch_file invocation (whose file
    # may change or vanish)
    cmd = (tmp_path / "results" / "ADNI_ba" / "cmd_input.txt").read_text()
    assert "--seed 5 --save_appendix _ba" in cmd
    assert "--batch_file" not in cmd
