"""Pre-flight data doctor (`tools/doctor.py`): the checks must pass on a
well-formed reference-layout fixture and pinpoint each broken-layout mode
(missing file, renamed mat variable, subject-count disagreement, SNP-width
mismatch vs the GO incidence, malformed csv cohort) with a FAIL — the
failure modes the reference only surfaces as deep scipy KeyErrors."""
import os

import numpy as np
import pytest
import scipy.io as sio

from iggcn_tpu.tools import doctor
from tests.test_real_loaders import S, SNPS, _write_mat_cohort

GO_FIX = os.path.join(os.path.dirname(__file__), "fixtures", "go")
GO_ARGS = (os.path.join(GO_FIX, "analysis.json"),
           os.path.join(GO_FIX, "go_root_connection.txt"),
           os.path.join(GO_FIX, "snps_to_gene.txt"))


def _fails(findings):
    return [msg for level, msg in findings if level == "fail"]


@pytest.fixture()
def mat_dir(tmp_path):
    base = str(tmp_path) + "/"
    _write_mat_cohort(base, np.random.default_rng(0))
    return base


def test_doctor_passes_on_good_layout(mat_dir, capsys):
    findings, info = doctor.check_adni874(mat_dir, knn=5)
    assert not _fails(findings)
    assert info["subjects"] == S and info["snp_width"] == SNPS
    # CLI wrapper: exit code 0, summary line printed
    assert doctor.main(["--data_path", mat_dir]) == 0
    assert "0 failure(s)" in capsys.readouterr().out


def test_doctor_flags_missing_and_renamed_files(mat_dir):
    os.remove(os.path.join(mat_dir, "knn/5/corr_data.mat"))
    sio.savemat(os.path.join(mat_dir, "knn/5/SNPS_data.mat"),
                {"WRONG_NAME": np.zeros((S, SNPS))})
    findings, _ = doctor.check_adni874(mat_dir, knn=5)
    fails = _fails(findings)
    assert any("corr_data.mat" in m and "missing" in m for m in fails)
    assert any("SNPS_data" in m and "WRONG_NAME" in m for m in fails)
    assert doctor.main(["--data_path", mat_dir]) == 1


def test_doctor_flags_subject_count_and_label_range(mat_dir):
    kdir = os.path.join(mat_dir, "knn/5")
    # labels: wrong count AND already-0-based values
    sio.savemat(os.path.join(kdir, "BL_DXGrp_label.mat"),
                {"BL_DXGrp_label": np.zeros((S - 3, 1), int)})
    findings, _ = doctor.check_adni874(mat_dir, knn=5)
    fails = _fails(findings)
    assert any("subject counts disagree" in m for m in fails)
    assert any("1..5" in m for m in fails)


def test_doctor_flags_multifusion_modality_gaps(mat_dir):
    findings, _ = doctor.check_adni874(mat_dir, knn=5, multi_fusion=True)
    missing = [m for m in _fails(findings) if "missing file" in m]
    assert len(missing) == 3      # MRI / FDG-PET / AV45-PET all absent
    # add one modality with a wrong subject count -> shape fail, not missing
    mdir = os.path.join(mat_dir, "MRI", "knn", "5")
    os.makedirs(mdir)
    sio.savemat(os.path.join(mdir, "corr_data.mat"),
                {"corr_data": np.zeros((S + 1, 12, 12))})
    findings, _ = doctor.check_adni874(mat_dir, knn=5, multi_fusion=True)
    assert any("MRI" in m and "subjects" in m for m in _fails(findings))


def test_doctor_go_sources_and_width_crosscheck(mat_dir):
    findings, topo = doctor.check_go_sources(*GO_ARGS)
    assert topo is not None and not _fails(findings)
    # the committed GO fixture has a tiny SNP panel, the cohort 54 -> FAIL
    assert _fails(doctor.check_snps_width(topo, SNPS))
    assert not _fails(doctor.check_snps_width(topo, topo.num_snps))
    # end-to-end through the CLI: layout ok but widths disagree -> exit 1
    rc = doctor.main(["--data_path", mat_dir,
                      "--json_path", GO_ARGS[0],
                      "--go_connection_path", GO_ARGS[1],
                      "--snps_to_gene_path", GO_ARGS[2]])
    assert rc == 1


def test_doctor_go_sources_unparseable(tmp_path):
    bad = tmp_path / "analysis.json"
    bad.write_text("{not json")
    for name in ("go_root_connection.txt", "snps_to_gene.txt"):
        (tmp_path / name).write_text("")
    findings, topo = doctor.check_go_sources(
        str(bad), str(tmp_path / "go_root_connection.txt"),
        str(tmp_path / "snps_to_gene.txt"))
    assert topo is None and any("do not parse" in m for m in _fails(findings))


def test_doctor_snps_csv(tmp_path):
    base = tmp_path / "data_AH"
    base.mkdir()
    (base / "snp.csv").write_text("a,b\n1,2\n0,1\n2,0\n")
    (base / "dia.csv").write_text("dia\n0\n1\n1\n")
    assert not _fails(doctor.check_snps_csv(str(tmp_path), 0))
    # row-count mismatch
    (base / "dia.csv").write_text("dia\n0\n1\n")
    assert any("labels" in m for m in _fails(
        doctor.check_snps_csv(str(tmp_path), 0)))
    # non-binary labels
    (base / "dia.csv").write_text("dia\n0\n2\n1\n")
    assert any("binary" in m for m in _fails(
        doctor.check_snps_csv(str(tmp_path), 0)))
    # absent task dir
    assert _fails(doctor.check_snps_csv(str(tmp_path), 1))


def test_doctor_csv_layout(tmp_path):
    """The per-task CSV/mat layout check (--csv_layout / load_adni_csv):
    binary labels required, subject counts cross-checked vs snp.csv."""
    base = tmp_path / "data_AH"
    kdir = base / "knn" / "5"
    kdir.mkdir(parents=True)
    n, s = 6, 4
    rng = np.random.default_rng(3)
    (base / "snp.csv").write_text(
        "a,b,c\n" + "\n".join("1,0,2" for _ in range(s)) + "\n")
    sio.savemat(str(kdir / "BL_DXGrp_label.mat"),
                {"BL_DXGrp_label": np.array([0, 1] * (s // 2)).reshape(-1, 1)})
    sio.savemat(str(kdir / "corr_data.mat"),
                {"corr_data": np.abs(rng.normal(size=(s, n, n)))})
    sio.savemat(str(kdir / "imgData_mat_normalized_fix.mat"),
                {"imgData_mat_normalized": rng.normal(size=(s, n, 3))})
    findings, info = doctor.check_adni_csv(str(tmp_path), disease_id=0, knn=5)
    assert not _fails(findings) and info["snp_width"] == 3
    assert doctor.main(["--data_path", str(tmp_path), "--csv_layout"]) == 0
    # raw 1..5 labels are WRONG for this layout (binary required)
    sio.savemat(str(kdir / "BL_DXGrp_label.mat"),
                {"BL_DXGrp_label": np.array([1, 5] * (s // 2)).reshape(-1, 1)})
    assert any("binary" in m for m in _fails(
        doctor.check_adni_csv(str(tmp_path), 0, knn=5)[0]))
    # subject-count disagreement with snp.csv
    sio.savemat(str(kdir / "BL_DXGrp_label.mat"),
                {"BL_DXGrp_label": np.zeros((s + 2, 1), int)})
    assert any("disagree" in m for m in _fails(
        doctor.check_adni_csv(str(tmp_path), 0, knn=5)[0]))


def test_main_cli_points_at_doctor_on_malformed_real_data(tmp_path, capsys):
    """A data dir that EXISTS but is malformed must print the doctor hint
    before re-raising (a missing dir falls back to the synthetic cohort
    instead and is not this path; the original traceback is preserved so
    code bugs stay diagnosable)."""
    import main as main_mod

    bad = tmp_path / "pre"
    (bad / "knn" / "5").mkdir(parents=True)
    (bad / "knn" / "5" / "sbjID_int.mat").write_bytes(b"not a mat file")
    import shutil

    with pytest.raises(Exception, match="truncated"):
        main_mod.main(["--data_path", str(bad), "--no-search",
                       "--epochs", "1", "--cohort_cache_dir", "",
                       "--save_appendix", "_doctorhint"])
    assert "iggcn_tpu.tools.doctor" in capsys.readouterr().err
    # the reproducibility manifest is written before data loading, so even
    # this failed run records its environment
    res = os.path.join(os.getcwd(), "results", "ADNI_doctorhint")
    env = open(os.path.join(res, "env.txt")).read()
    assert "jax " in env and "backend " in env
    shutil.rmtree(res, ignore_errors=True)


def test_doctor_cli_requires_a_target():
    with pytest.raises(SystemExit):
        doctor.main([])
    with pytest.raises(SystemExit):   # partial GO args are a usage error
        doctor.main(["--json_path", "x.json"])


def test_doctor_tu_dataset_ok_on_fixture(capsys):
    rc = doctor.main(["--tu_root", "tests/fixtures", "--tu_name", "TUTEST"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "10 graphs" in out and "2 classes" in out


def test_doctor_tu_dataset_failures(tmp_path, capsys):
    # missing dataset
    rc = doctor.main(["--tu_root", str(tmp_path), "--tu_name", "NOPE"])
    assert rc == 1
    assert "NOPE_A.txt" in capsys.readouterr().out

    # structurally broken: 0-based indicator + label-count mismatch
    import shutil
    d = tmp_path / "BROKEN"
    shutil.copytree("tests/fixtures/TUTEST", d)
    for f in d.iterdir():  # fixture files are TUTEST_*.txt; rename
        f.rename(d / f.name.replace("TUTEST", "BROKEN"))
    ind = np.loadtxt(d / "BROKEN_graph_indicator.txt", dtype=np.int64)
    np.savetxt(d / "BROKEN_graph_indicator.txt", ind - 1, fmt="%d")
    rc = doctor.main(["--tu_root", str(tmp_path), "--tu_name", "BROKEN"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "1-based" in out
