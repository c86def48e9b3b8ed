"""Nested-GNN subgraph path: extraction, pooling, and model forward."""
import jax
import jax.numpy as jnp
import numpy as np

from iggcn_tpu.data.nested import (create_nested_dataset, k_hop_subgraph,
                                   resistance_distance, return_prob)
from iggcn_tpu.data.tu import synthetic_tu_dataset
from iggcn_tpu.models.nested import (NestedGCN, NestedGIN0, NestedGNN,
                                     subgraph_mean_pool)
from iggcn_tpu.train.generic_cv import cross_validation_generic


def _tiny_dataset():
    rng = np.random.default_rng(3)
    return synthetic_tu_dataset(rng, num_graphs=24, n_min=5, n_max=8,
                                num_classes=2)


def test_k_hop_subgraph_bfs():
    # path graph 0-1-2-3-4
    adj = np.zeros((5, 5), np.float32)
    for i in range(4):
        adj[i, i + 1] = adj[i + 1, i] = 1.0
    nodes, hops = k_hop_subgraph(2, 1, adj)
    assert set(nodes.tolist()) == {1, 2, 3}
    assert nodes[0] == 2 and hops[0] == 0
    nodes2, hops2 = k_hop_subgraph(0, 2, adj)
    assert set(nodes2.tolist()) == {0, 1, 2}
    assert dict(zip(nodes2.tolist(), hops2.tolist())) == {0: 0, 1: 1, 2: 2}


def test_return_prob_and_rd():
    adj = np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]], np.float32)
    rp = return_prob(adj, steps=4)
    assert rp.shape == (3, 4)
    # triangle: P^2 return prob = 1/2 for every node
    np.testing.assert_allclose(rp[:, 1], 0.5, atol=1e-6)
    rd = resistance_distance(adj, np.array([0, 1, 2]))
    assert rd[0, 0] == 0.0 and (rd[1:] > 0).all()


def test_create_nested_dataset_shapes():
    ds = _tiny_dataset()
    nested = create_nested_dataset(ds, h=1, use_rd=True)
    s, m, f = nested.x.shape
    assert s == len(ds) and f == ds.num_features
    assert nested.adj.shape == (s, m, m)
    assert nested.z is not None and nested.rd.shape == (s, m, 1)
    # every original node roots one subgraph: ids cover [0, n)
    for g in range(3):
        n = int(ds.mask[g].sum())
        valid = nested.assign[g][nested.mask[g]]
        assert set(valid.tolist()) == set(range(n))
        # root node of each subgraph carries hop label 0
        roots = nested.z[g][nested.mask[g]][np.r_[True,
                                                  np.diff(valid) != 0]]
        assert (roots == 0).all()
    # union adjacency is block-diagonal: symmetric, no cross-subgraph edges
    a = nested.adj[0]
    asg = nested.assign[0]
    r, c = np.nonzero(a)
    assert (asg[r] == asg[c]).all()


def test_subgraph_mean_pool_matches_numpy():
    rng = np.random.default_rng(0)
    h = rng.normal(size=(2, 7, 3)).astype(np.float32)
    assign = np.array([[0, 0, 1, 1, 1, 2, 0], [0, 1, 1, 2, 2, 2, 0]])
    mask = np.ones((2, 7), bool)
    mask[1, 6] = False
    out = np.asarray(subgraph_mean_pool(jnp.asarray(h), jnp.asarray(assign),
                                        jnp.asarray(mask), 4))
    for b in range(2):
        for s in range(4):
            sel = (assign[b] == s) & mask[b]
            expect = h[b][sel].mean(0) if sel.any() else np.zeros(3)
            np.testing.assert_allclose(out[b, s], expect, rtol=1e-5,
                                       atol=1e-6)


def test_nested_models_forward():
    ds = _tiny_dataset()
    nested = create_nested_dataset(ds, h=1, use_rd=True)
    n_sub = nested.num_subgraphs
    batch = (jnp.asarray(nested.x[:4]), jnp.asarray(nested.adj[:4]),
             jnp.asarray(nested.mask[:4]), jnp.asarray(nested.assign[:4]))
    for make in (NestedGCN, NestedGIN0):
        model = make(num_layers=2, hidden=8, num_classes=2,
                     num_subgraphs=n_sub, use_z=True, use_rd=True)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), *batch, z=jnp.asarray(nested.z[:4]),
            rd=jnp.asarray(nested.rd[:4]))
        out = model.apply(variables, *batch, z=jnp.asarray(nested.z[:4]),
                          rd=jnp.asarray(nested.rd[:4]))
        assert out.shape == (4, 2)
        np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0,
                                   rtol=1e-5)


def test_nested_gcn_trains_via_generic_cv():
    ds = _tiny_dataset()
    nested = create_nested_dataset(ds, h=1)
    model = NestedGNN(conv="gcn", num_layers=2, hidden=8, num_classes=2,
                      num_subgraphs=nested.num_subgraphs)
    res = cross_validation_generic(nested, model, folds=3, epochs=2,
                                   batch_size=8, needs_mask=True,
                                   needs_assign=True)
    assert np.isfinite(res.mean_loss)
    assert res.accs.shape == (3, 2)


def test_spd_drnl_labels():
    from iggcn_tpu.data.nested import drnl_labels, spd_labels

    # path 0-1-2-3-4, root 2, h=2 -> whole path
    adj = np.zeros((5, 5), np.float32)
    for i in range(4):
        adj[i, i + 1] = adj[i + 1, i] = 1.0
    nodes, _ = k_hop_subgraph(2, 2, adj)
    spd = spd_labels(nodes, adj, 2)
    by_node = dict(zip(nodes.tolist(), spd.tolist()))
    assert by_node[2][0] == 0          # root distance 0
    assert by_node[1][0] == 1 and by_node[3][0] == 1
    assert by_node[0][0] == 2 and by_node[4][0] == 2
    # node 2 is revisited at hop 2 via 1->2/3->2 -> second distance recorded
    assert by_node[2][1] == 2
    drnl = drnl_labels(nodes, adj, 2)
    by_node_d = dict(zip(nodes.tolist(), drnl[:, 0].tolist()))
    assert by_node_d[2] == 0 * 3 + 2   # dist1*(h+1)+dist2
    assert by_node_d[0] == 2           # single distance kept as-is


def test_nested_dataset_node_labels():
    ds = _tiny_dataset()
    for label, zdim in (("hop", 1), ("spd", 2), ("spd3", 3), ("drnl", 1)):
        nested = create_nested_dataset(ds, h=1, node_label=label)
        assert nested.z.shape[2] == zdim
    model = NestedGNN(conv="gcn", num_layers=1, hidden=4, num_classes=2,
                      num_subgraphs=nested.num_subgraphs, use_z=True)
    batch = (jnp.asarray(nested.x[:2]), jnp.asarray(nested.adj[:2]),
             jnp.asarray(nested.mask[:2]), jnp.asarray(nested.assign[:2]))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *batch,
                                    z=jnp.asarray(nested.z[:2]))
    out = model.apply(variables, *batch, z=jnp.asarray(nested.z[:2]))
    assert out.shape == (2, 2)
