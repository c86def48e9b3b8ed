"""CLI end-to-end on REAL-format data: a scipy.io-written .mat cohort
(reference layout, `sgcn_data.py:113-176`) plus a PANTHER-style GO JSON +
connection + snps_to_gene fixture drive `main.py` through the full fused
experiment — the real-data route the unit loaders (`test_real_loaders.py`,
`test_go_graph.py`) only cover piecewise. Also pins the adni874
cohort-cache path: a second identical run loads from cache (recursive
source fingerprint) and reproduces log.txt byte-identically, and an edited
source .mat invalidates the key.
"""
import json
import os

import numpy as np
import scipy.io as sio

from tests.test_real_loaders import _write_mat_cohort

S = 24      # subjects; labels alternate HC/AD so disease_id 0 keeps all
ROIS = 90   # the reference's hardcoded N (sgcn_hyperparameters.py:7)


def _term(goid, level, genes):
    return {"term": {"id": goid, "level": level},
            "input_list": {"fdr": 0.01,
                           "mapped_id_list": {"mapped_id": genes}}}


def _write_go_fixture(tmp_path):
    """Tiny GO DAG whose snps_to_gene has the full 54 SNP rows (the fused
    model's num_snps is the reference-fixed 54)."""
    data = {"overrepresentation": {"group": [
        {"result": [_term("GO:0000001", 1, ["g1"]),
                    _term("GO:0000002", 2, ["g2"]),
                    _term("GO:0000003", 3, ["g3", "g4"])]},
        {"result": [_term("GO:0000004", 1, ["g5"]),
                    _term("GO:0000005", 2, ["g1", "g5"])]},
    ]}}
    jp = tmp_path / "analysis.json"
    jp.write_text(json.dumps(data))
    cp = tmp_path / "go_root_connection.txt"
    cp.write_text("0008150.0000001.0000002.0000003\n"
                  "0008150.0000004.0000005\n")
    sg = tmp_path / "snps_to_gene.txt"
    lines = ["g1;g2", "g3", "g5", "g4"] + [f"gx{i}" for i in range(50)]
    sg.write_text("\n".join(lines) + "\n")
    return str(jp), str(cp), str(sg)


def test_cli_real_mat_cohort_end_to_end(tmp_path, monkeypatch, capsys):
    import main as cli

    base = str(tmp_path / "preprocessing") + os.sep
    os.makedirs(base)
    _write_mat_cohort(base, np.random.default_rng(3), s=S, n=ROIS)
    jp, cp, sg = _write_go_fixture(tmp_path)
    monkeypatch.chdir(tmp_path)

    def argv(appendix):
        return ["--data_path", base, "--json_path", jp,
                "--go_connection_path", cp, "--snps_to_gene_path", sg,
                "--knn", "5", "--epochs", "2", "--fold", "3",
                "--batch_size", "8", "--disease_id", "0", "--no-search",
                "--save_appendix", appendix]

    cli.main(argv("_real1"))
    out1 = capsys.readouterr().out
    assert "cohort loaded from cache" not in out1
    log1 = (tmp_path / "results" / "ADNI_real1" / "log.txt").read_text()
    assert "Result -" in log1
    # the reference artifact set exists for the real route too
    art = os.listdir(tmp_path / "results" / "ADNI_real1")
    assert any(a.startswith("node_importance_") for a in art)
    assert any(a.startswith("gcn_state_dict_") for a in art)

    # second run: adni874 cache hit, byte-identical experiment
    cli.main(argv("_real2"))
    out2 = capsys.readouterr().out
    assert "cohort loaded from cache (adni874-" in out2
    log2 = (tmp_path / "results" / "ADNI_real2" / "log.txt").read_text()
    assert log2 == log1

    # editing a nested source file invalidates the key (recursive
    # fingerprint): the third run must NOT hit the cache
    kdir = os.path.join(base, "knn", "5")
    snps = sio.loadmat(os.path.join(kdir, "SNPS_data.mat"))["SNPS_data"]
    sio.savemat(os.path.join(kdir, "SNPS_data.mat"),
                {"SNPS_data": np.ascontiguousarray(snps[:, ::-1])})
    cli.main(argv("_real3"))
    out3 = capsys.readouterr().out
    assert "cohort loaded from cache" not in out3
