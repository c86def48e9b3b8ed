"""GO graph construction: tiny synthetic PANTHER JSON + connection file ->
check edges, BFS levels, leaves-first sort, pool_dim, GO x SNP incidence."""
import json

import numpy as np
import pytest

from iggcn_tpu.data import go_graph


def _term(goid, level, genes):
    return {"term": {"id": goid, "level": level},
            "input_list": {"fdr": 0.01,
                           "mapped_id_list": {"mapped_id": genes}}}


@pytest.fixture
def files(tmp_path):
    # one pathway: A(level0) > B(level1) > C(level2); second pathway D>E
    data = {"overrepresentation": {"group": [
        {"result": [_term("GO:0000001", 1, ["g1"]),
                    _term("GO:0000002", 2, ["g2"]),
                    _term("GO:0000003", 3, ["g3", "g4"])]},
        {"result": [_term("GO:0000004", 1, ["g5"]),
                    _term("GO:0000005", 2, ["g1", "g5"])]},
    ]}}
    jp = tmp_path / "analysis.json"
    jp.write_text(json.dumps(data))
    # CTD-style chains root -> ... -> term; every term needs a chain so BFS
    # assigns finite levels (mirrors the real go_root_connection.txt coverage)
    cp = tmp_path / "go_root_connection.txt"
    cp.write_text("0008150.0000001.0000002.0000003\n"
                  "0008150.0000004.0000005\n")
    sg = tmp_path / "snps_to_gene.txt"
    sg.write_text("g1;g2\ng3\ng5\n")  # 3 SNPs
    return str(jp), str(cp), str(sg)


def test_parse_go_json_structure(files):
    jp, cp, sg = files
    topo = go_graph.parse_go_json(jp, cp, sg)
    n = topo.n
    assert "GO:0008150" in topo.go_ids
    # root is sorted last (level 0, descending level sort)
    assert topo.go_ids[-1] == "GO:0008150"
    assert topo.go_level[-1] == 0
    # levels descending
    assert all(topo.go_level[i] >= topo.go_level[i + 1] for i in range(n - 1))
    # pool covers all nodes across 5 levels
    assert sum(topo.pool) == n
    # root row of incidence is all ones
    root_idx = topo.go_ids.index("GO:0008150")
    assert topo.go_snps.shape[1] == 3
    assert np.all(topo.go_snps[root_idx] == 1)
    # GO:0000003 has genes g3,g4 -> SNP 1 (g3) only (plus whatever overlaps)
    i3 = topo.go_ids.index("GO:0000003")
    np.testing.assert_array_equal(topo.go_snps[i3], [0, 1, 0])
    # JSON edge (child row -> parent col): 0000003's nearest kept shallower
    # predecessor in its pathway is 0000001 (0000002 is filtered from the
    # subgraph pass and only re-enters via the connection file)
    i1 = topo.go_ids.index("GO:0000001")
    ic = topo.go_ids.index("GO:0000003")
    assert topo.adj_child_parent[ic, i1] == 1
    # connection-file edge (parent row -> child col): root -> 0000001
    assert topo.adj_child_parent[root_idx, i1] == 1


def test_encoder_decoder_masks_consistent(files):
    jp, cp, sg = files
    topo = go_graph.parse_go_json(jp, cp, sg)
    n_l = 2
    enc = topo.encoder_masks(n_l)
    dec = topo.decoder_masks(n_l)
    n = topo.n
    assert enc[0].shape == (n, n)
    s1 = sum(topo.pool[:1])
    assert enc[1].shape == (n - s1, n - s1)
    # decoder layer jj: rows grow from sum(pool[n_l:]) back to full size
    m0 = sum(topo.pool[:n_l - 1])
    c0 = sum(topo.pool[:n_l])
    assert dec[0].shape == (n - m0, n - c0)
    assert dec[1].shape == (n, n - m0)


def test_synthetic_topology_valid():
    topo = go_graph.synthetic_topology(np.random.default_rng(0))
    assert sum(topo.pool) == topo.n
    # every non-root node has at least one parent at a shallower level
    a = topo.adj_child_parent
    for i in range(topo.n - 1):
        parents = np.nonzero(a[i])[0]
        assert len(parents) > 0
        assert all(topo.go_level[p] < topo.go_level[i] for p in parents)
    # root all-ones incidence row
    assert np.all(topo.go_snps[-1] == 1)
