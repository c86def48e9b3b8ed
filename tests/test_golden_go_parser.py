"""Reference-pinned golden test for the GO JSON parser pipeline.

The committed fixture (tests/fixtures/go/) is a PANTHER-style JSON crafted to
hit every branch of the reference's two-pass parse (`snps_graph.py:28-175`):
way A (4 terms, levels 0-1-2-1) exercises the backwards
nearest-shallower-parent edge search, the current_root handoff, and the
mid-way/last-term subgraph additions; way B is a single DICT result (the
non-list branch); way C a one-element list. The connection file's last chain
has 5 segments, hitting the `2 < idx < len-1` skip of
`snps_get_root_go_by_html.py:77-78`. Every expected value below was derived
BY HAND from the reference control flow — not from running this repo's code —
so a misreading of the parse semantics fails here.

Hand trace (see comments inline): pass 1 keeps subgraph ids
{1, 3, 4, 5, 6}; pass 2 therefore drops GO:0000002 entirely; the connection
file adds the root, two real intermediates and one 5-chain whose 4th segment
(GO:0000104) is skipped.
"""
import os

import numpy as np

from iggcn_tpu.data.go_graph import parse_go_json

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "go")

# level-sorted (descending, stable) expected node order:
# pre-sort ids [1, 3, 4, 5, 6, 8150, 101, 102, 103] get BFS levels
# [1, 2, 2, 1, 3, 0, 1, 1, 2] -> argsort(-level, stable) = [4,1,2,8,0,3,6,7,5]
EXPECTED_IDS = ["GO:0000006", "GO:0000003", "GO:0000004", "GO:0000103",
                "GO:0000001", "GO:0000005", "GO:0000101", "GO:0000102",
                "GO:0008150"]
EXPECTED_LEVELS = [3, 2, 2, 2, 1, 1, 1, 1, 0]
EXPECTED_POOL = [0, 1, 3, 4, 1]          # counts of levels 4,3,2,1,0

# pre-sort edges: JSON child->parent (1,0), (2,0); connection parent->child
# (5,0), (5,6), (6,1), (6,2), (5,3), (5,7), (7,8), (8,4); remapped through
# the sort permutation (old->new: 4->0, 1->1, 2->2, 8->3, 0->4, 3->5, 6->6,
# 7->7, 5->8):
EXPECTED_EDGES = {(1, 4), (2, 4), (8, 4), (8, 6), (6, 1), (6, 2),
                  (8, 5), (8, 7), (7, 3), (3, 0)}


def test_parser_golden():
    topo = parse_go_json(os.path.join(FIX, "analysis.json"),
                         os.path.join(FIX, "go_root_connection.txt"),
                         os.path.join(FIX, "snps_to_gene.txt"))
    assert topo.go_ids == EXPECTED_IDS
    assert "GO:0000002" not in topo.go_ids, \
        "non-root mid-way terms must be dropped by the subgraph filter"
    assert "GO:0000104" not in topo.go_ids, \
        "chain positions 2 < idx < len-1 must be skipped"
    np.testing.assert_array_equal(topo.go_level,
                                  np.asarray(EXPECTED_LEVELS, float))
    assert topo.pool == EXPECTED_POOL
    assert topo.n_l == 4

    rows, cols = np.nonzero(topo.adj_child_parent)
    assert set(zip(rows.tolist(), cols.tolist())) == EXPECTED_EDGES

    # gene lists follow the sort; connection-file terms have none
    assert topo.go_genes == [["G6"], ["G3"], ["G4"], [], ["G1"],
                             ["G1", "G5"], [], [], []]

    # GO x SNP incidence: snp0={G1,G9}, snp1={G3}, snp2={G6,G5}; root row
    # forced to ones (snps_graph.py:247-248)
    expected_inc = np.zeros((9, 3))
    expected_inc[4, 0] = 1          # GO:0000001 has G1
    expected_inc[5, 0] = 1          # GO:0000005 has G1
    expected_inc[1, 1] = 1          # GO:0000003 has G3
    expected_inc[0, 2] = 1          # GO:0000006 has G6
    expected_inc[5, 2] = 1          # GO:0000005 has G5
    expected_inc[8, :] = 1          # root row
    np.testing.assert_array_equal(topo.go_snps, expected_inc)
