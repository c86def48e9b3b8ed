"""Epoch tail-padding exactness: zero-weight duplicate rows must not leak
into cross-sample statistics (BatchNorm batches, DiffPool aux losses) — the
padded batch must train identically to the reference's smaller real batch."""
import jax
import jax.numpy as jnp
import numpy as np

from iggcn_tpu.models import baselines as B
from iggcn_tpu.ops import pool as P


def _toy(n_graphs, n=7, f=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n_graphs, n, f)).astype(np.float32)
    adj = (rng.random((n_graphs, n, n)) < 0.4).astype(np.float32)
    mask = np.ones((n_graphs, n), bool)
    mask[:, n - 2:] = False
    return jnp.asarray(x), jnp.asarray(adj), jnp.asarray(mask)


def test_gin_bn_stats_ignore_padding_rows():
    x, adj, mask = _toy(2)
    # padded batch: the 2 real rows + 2 duplicates of row 0 with w=0
    xp = jnp.concatenate([x, x[:1], x[:1]])
    ap = jnp.concatenate([adj, adj[:1], adj[:1]])
    mp = jnp.concatenate([mask, mask[:1], mask[:1]])
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])

    model = B.GIN(num_layers=2, hidden=8, num_classes=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, adj, mask)

    _, mut_real = model.apply(variables, x, adj, mask, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)},
                              mutable=["batch_stats"])
    _, mut_pad = model.apply(variables, xp, ap, mp, train=True,
                             sample_weight=w,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        mut_real["batch_stats"], mut_pad["batch_stats"])


def test_diff_pool_aux_ignores_padding_rows():
    x, adj, mask = _toy(3, seed=1)
    rng = np.random.default_rng(2)
    s = jnp.asarray(rng.normal(size=(3, 7, 3)).astype(np.float32))
    _, _, link_real, ent_real = P.diff_pool(x, adj, s, mask)

    xp = jnp.concatenate([x, x[:1]])
    ap = jnp.concatenate([adj, adj[:1]])
    sp = jnp.concatenate([s, s[:1]])
    mp = jnp.concatenate([mask, mask[:1]])
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    _, _, link_pad, ent_pad = P.diff_pool(xp, ap, sp, mp, sample_weight=w)
    np.testing.assert_allclose(float(link_pad), float(link_real), rtol=1e-6)
    np.testing.assert_allclose(float(ent_pad), float(ent_real), rtol=1e-6)

    # without the weight the duplicates DO shift the means (the bug this
    # guards against)
    _, _, link_bug, _ = P.diff_pool(xp, ap, sp, mp)
    assert not np.isclose(float(link_bug), float(link_real), rtol=1e-6)


def test_snps_go_bn_stats_ignore_padding_rows():
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.go_network import GeneOntologyNetwork

    topo = synthetic_topology(np.random.default_rng(0),
                              level_sizes=[6, 4, 2, 1], num_levels=4, n_l=2)
    model = GeneOntologyNetwork(topo=topo, in_f_dim=2, n_l=2, f_dim=(4, 4),
                                l_dim=4)
    rng = np.random.default_rng(3)
    snps = jnp.asarray(rng.random((3, 54)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), snps)

    _, mut_real = model.apply(variables, snps, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)},
                              mutable=["batch_stats"])
    snps_p = jnp.concatenate([snps, snps[:1]])
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    _, mut_pad = model.apply(variables, snps_p, train=True, sample_weight=w,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        mut_real["batch_stats"], mut_pad["batch_stats"])


def test_all_padding_batch_is_a_complete_noop():
    """Fold-size equalization in fold-parallel mode can produce batches
    that are 100% padding (w == 0 everywhere). The data losses vanish
    under the mask, but the PARAM-ONLY sparsity penalties do not — without
    `make_train_step(gate_padding=True)`'s no-op gate, smaller folds would
    take extra Adam steps on penalty gradients and the LR-driving step
    counter would advance. The fold-parallel == sequential equivalence
    tests cannot catch this: stratified fold sizes differ by at most the
    class count, so all-padding batches never arise there (found by the
    mutation audit's coverage probing)."""
    import pytest

    from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
    from iggcn_tpu.data.adni import synthetic_cohort
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.fused_sgcn import FusedSGCN
    from iggcn_tpu.train.steps import (TrainState, make_optimizer,
                                       make_train_step)
    from tests.conftest import device_batch

    topo = synthetic_topology(np.random.default_rng(0))
    cohort = synthetic_cohort(np.random.default_rng(1), num_subjects=8)
    mcfg = ModelConfig(num_layers=1, hidden=4, hidden_linear=8, l_dim=8)
    tcfg = TrainConfig(epochs=1, batch_size=8, fold_parallel=True,
                       loss=LossWeights(disease=1.0, prob=0.5))
    batch = device_batch(cohort, 8)
    batch["w"] = jnp.zeros((8,), jnp.float32)      # 100% padding

    model = FusedSGCN(cfg=mcfg, topo=topo)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["x"],
                                    batch["adj"], batch["snps"])
    optimizer = make_optimizer(tcfg)
    state = TrainState.create(variables, optimizer, steps_per_epoch=1)

    gated = jax.jit(make_train_step(model, mcfg, tcfg, optimizer))
    s1, _ = gated(state, batch, jax.random.PRNGKey(3))
    for a, b in zip(jax.tree_util.tree_leaves(
                        (state.params, state.batch_stats, state.step)),
                    jax.tree_util.tree_leaves(
                        (s1.params, s1.batch_stats, s1.step))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # without the gate the sparsity-penalty gradients DO step Adam — the
    # bug the gate exists to prevent (and what the gate-removal mutation
    # reintroduces)
    state = TrainState.create(variables, optimizer, steps_per_epoch=1)
    ungated = jax.jit(make_train_step(model, mcfg, tcfg, optimizer,
                                      gate_padding=False))
    s2, _ = ungated(state, batch, jax.random.PRNGKey(3))
    moved = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(jax.tree_util.tree_leaves(state.params),
                                jax.tree_util.tree_leaves(s2.params)))
    assert moved > 1e-5, "expected the ungated step to move the params"
    with pytest.raises(AssertionError):
        np.testing.assert_array_equal(np.asarray(state.step),
                                      np.asarray(s2.step))


def test_loss_terms_ignore_padding_rows():
    """The w-masked loss reductions themselves (nll/mse means, consistency,
    orthogonality) on a padded batch must equal the unpadded means — found
    MISSING by the mutation audit: `padding_weights_ignored` survived the
    stats-only pins above."""
    from iggcn_tpu.train import losses

    rng = np.random.default_rng(5)
    lp = jnp.asarray(np.log(rng.dirichlet(np.ones(2), size=6)
                            ).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 2, size=6))
    pred = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    sim = jnp.asarray(rng.random((8, 8)).astype(np.float32))

    pad = lambda a: jnp.concatenate([a, a[:2]])  # noqa: E731
    w = jnp.asarray([1.0] * 6 + [0.0] * 2)

    np.testing.assert_allclose(
        float(losses.nll_loss(pad(lp), pad(y), w)),
        float(losses.nll_loss(lp, y)), rtol=1e-6)
    np.testing.assert_allclose(
        float(losses.mse_loss(pad(pred), pad(tgt), w)),
        float(losses.mse_loss(pred, tgt)), rtol=1e-6)
    np.testing.assert_allclose(
        float(losses.consistency_loss(pad(s), sim, w)),
        float(losses.consistency_loss(s, sim[:6, :6])), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.orthogonal_loss(pad(s), w)),
        float(losses.orthogonal_loss(s)), rtol=1e-5)
    # and the duplicates DO shift an unweighted mean (the guarded bug)
    assert not np.isclose(float(losses.nll_loss(pad(lp), pad(y))),
                          float(losses.nll_loss(lp, y)), rtol=1e-6)


def test_sgcn_ori_bn_stats_ignore_padding_rows():
    """SGCNOri (the one BN-bearing image-only model) must honor the mask:
    its objective trains on padded batches whose extra rows duplicate row 0
    with w=0 (cv.py padded_idx) — bn1/bn2 statistics must not see them."""
    from iggcn_tpu.models.sgcn_image import SGCNOri

    x, adj, _ = _toy(3, n=10, f=3, seed=4)
    model = SGCNOri(rois=10, num_classes=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, adj)

    _, mut_real = model.apply(variables, x, adj, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)},
                              mutable=["batch_stats"])
    xp = jnp.concatenate([x, x[:1]])
    ap = jnp.concatenate([adj, adj[:1]])
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    _, mut_pad = model.apply(variables, xp, ap, train=True, sample_weight=w,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        mut_real["batch_stats"], mut_pad["batch_stats"])
    # without the weight the duplicate row DOES shift the stats (the bug)
    _, mut_bug = model.apply(variables, xp, ap, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
    bug_mean = np.asarray(mut_bug["batch_stats"]["bn1"]["mean"])
    real_mean = np.asarray(mut_real["batch_stats"]["bn1"]["mean"])
    assert not np.allclose(bug_mean, real_mean, rtol=1e-6)
