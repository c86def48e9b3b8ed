"""Baseline zoo + pooling ops: masked-op correctness and model smoke runs on
variable-size synthetic TU graphs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iggcn_tpu.data.tu import synthetic_tu_dataset
from iggcn_tpu.models import baselines as B
from iggcn_tpu.ops import pool as P


@pytest.fixture(scope="module")
def tu():
    return synthetic_tu_dataset(np.random.default_rng(3), num_graphs=40)


def test_masked_pools_match_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 7, 4)).astype(np.float32)
    mask = np.zeros((3, 7), bool)
    mask[0, :5] = mask[1, :7] = mask[2, :2] = True
    xm = jnp.asarray(x)
    mm = jnp.asarray(mask)
    for b in range(3):
        valid = x[b][mask[b]]
        np.testing.assert_allclose(np.asarray(P.mean_pool(xm, mm))[b],
                                   valid.mean(0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(P.max_pool(xm, mm))[b],
                                   valid.max(0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(P.add_pool(xm, mm))[b],
                                   valid.sum(0), rtol=1e-5, atol=1e-5)


def test_topk_pool_keeps_ratio():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))
    adj = jnp.asarray((rng.random((2, 10, 10)) < 0.3).astype(np.float32))
    mask = jnp.asarray(np.array([[True] * 10, [True] * 6 + [False] * 4]))
    w = jnp.asarray(rng.normal(size=4).astype(np.float32))
    res = P.topk_pool(x, adj, mask, w, ratio=0.5)
    kept = np.asarray(res.mask).sum(axis=1)
    assert kept[0] == 5 and kept[1] == 3
    # removed nodes have zero features and no edges
    removed = ~np.asarray(res.mask)
    assert np.all(np.asarray(res.x)[removed] == 0)


def test_sort_pool_order():
    x = jnp.asarray(np.stack([np.arange(6, dtype=np.float32)[:, None]
                              .repeat(3, 1)]))
    mask = jnp.asarray(np.array([[True] * 6]))
    out = np.asarray(P.sort_pool(x, mask, k=3))
    np.testing.assert_allclose(out[0, :, -1], [5, 4, 3])
    # k > N: PyG global_sort_pool zero-pads the node axis to k (a
    # downstream Conv1d depends on the fixed length)
    out = np.asarray(P.sort_pool(x, mask, k=9))
    assert out.shape == (1, 9, 3)
    np.testing.assert_allclose(out[0, :6, -1], [5, 4, 3, 2, 1, 0])
    np.testing.assert_allclose(out[0, 6:], 0.0)


def test_greedy_matching_covers_all_nodes():
    rng = np.random.default_rng(2)
    a = (rng.random((9, 9)) < 0.3).astype(float)
    a = np.triu(a, 1)
    a = a + a.T
    c = P.greedy_matching(a)
    assert c.min() >= 0
    _, counts = np.unique(c, return_counts=True)
    assert counts.max() <= 2


def test_diff_pool_shapes():
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.normal(size=(2, 8, 5)).astype(np.float32))
    adj = jnp.asarray((rng.random((2, 8, 8)) < 0.4).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32))
    mask = jnp.ones((2, 8), bool)
    xn, an, link, ent = P.diff_pool(z, adj, s, mask)
    assert xn.shape == (2, 3, 5) and an.shape == (2, 3, 3)
    assert np.isfinite(float(link)) and np.isfinite(float(ent))


MODELS = [
    ("gin", lambda nc: B.GIN(num_layers=2, hidden=8, num_classes=nc), True, False),
    ("gin0", lambda nc: B.GIN(num_layers=2, hidden=8, num_classes=nc,
                              train_eps=False), True, False),
    ("sage", lambda nc: B.GraphSAGE(num_layers=2, hidden=8, num_classes=nc), True, False),
    ("sage_nojk", lambda nc: B.GraphSAGE(num_layers=2, hidden=8,
                                         num_classes=nc, jk=False), True, False),
    ("topk", lambda nc: B.TopK(num_layers=3, hidden=8, num_classes=nc), True, False),
    ("sortpool", lambda nc: B.SortPool(num_layers=2, hidden=8,
                                       num_classes=nc, k=10), True, False),
    ("set2set", lambda nc: B.Set2SetNet(num_layers=2, hidden=8,
                                        num_classes=nc), True, False),
    ("glob_att", lambda nc: B.GlobalAttentionNet(num_layers=2, hidden=8,
                                                 num_classes=nc), True, False),
    ("graclus", lambda nc: B.Graclus(num_layers=3, hidden=8,
                                     num_classes=nc), True, True),
]


@pytest.mark.parametrize("name,factory,needs_mask,needs_assign",
                         MODELS, ids=[m[0] for m in MODELS])
def test_baseline_models_forward(tu, name, factory, needs_mask, needs_assign):
    model = factory(tu.num_classes)
    n = 6
    args = [jnp.asarray(tu.x[:n]), jnp.asarray(tu.adj[:n]),
            jnp.asarray(tu.mask[:n])]
    if needs_assign:
        args.append(jnp.asarray(tu.assign[:n]))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    out = jax.jit(model.apply)(variables, *args)
    assert out.shape == (n, tu.num_classes)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0,
                               rtol=1e-4)


def test_diffpool_model(tu):
    model = B.DiffPool(max_nodes=tu.x.shape[1], hidden=8,
                       num_classes=tu.num_classes)
    n = 6
    args = [jnp.asarray(tu.x[:n]), jnp.asarray(tu.adj[:n]),
            jnp.asarray(tu.mask[:n])]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    logp, link, ent = jax.jit(model.apply)(variables, *args)
    assert logp.shape == (n, tu.num_classes)
    assert np.isfinite(float(link)) and np.isfinite(float(ent))


def test_flat_models(cohort):
    x = jnp.asarray(cohort.x[:4])
    adj = jnp.asarray(cohort.adj[:4])
    for model in [B.GCNFlat(num_layers=2, hidden=8),
                  B.GATFlat(num_layers=2, hidden=8)]:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, adj)
        out = jax.jit(model.apply)(variables, x, adj)
        assert out.shape == (4, 2)


def test_cnn_mlp_models(cohort):
    cnn = B.CNNModel()
    v = jax.jit(cnn.init)(jax.random.PRNGKey(0),
                          jnp.asarray(cohort.raw_adj[:4]))
    out = jax.jit(cnn.apply)(v, jnp.asarray(cohort.raw_adj[:4]))
    assert out.shape == (4, 2)
    mlp = B.MLPModel()
    v = jax.jit(mlp.init)(jax.random.PRNGKey(0), jnp.asarray(cohort.snps[:4]))
    out = jax.jit(mlp.apply)(v, jnp.asarray(cohort.snps[:4]))
    assert out.shape == (4, 1)
    assert 0 <= float(out.min()) and float(out.max()) <= 1
