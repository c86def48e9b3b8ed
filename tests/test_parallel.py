"""Multi-chip data parallelism on the 8-virtual-device CPU mesh: the DP
train step must be numerically equivalent to the single-device step."""
import jax
import numpy as np

from iggcn_tpu.config import ModelConfig, TrainConfig
from iggcn_tpu.models.fused_sgcn import FusedSGCN
from iggcn_tpu.parallel.mesh import (make_dp_train_step, make_mesh,
                                     replicate_tree, shard_batch_tree)
from iggcn_tpu.train.steps import TrainState, make_optimizer, make_train_step


def _setup(cohort, topo, b=16):
    mcfg = ModelConfig(num_layers=2, hidden=8, hidden_linear=16, l_dim=8)
    tcfg = TrainConfig(epochs=1, batch_size=b)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    from tests.conftest import device_batch
    batch = device_batch(cohort, b)
    optimizer = make_optimizer(tcfg, 1)
    train_step = make_train_step(model, mcfg, tcfg, optimizer)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["x"],
                                    batch["adj"], batch["snps"])
    state = TrainState.create(variables, optimizer, steps_per_epoch=1)
    return train_step, state, batch


def test_dp_step_matches_single_device(cohort, topo):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    train_step, state, batch = _setup(cohort, topo)
    rng = jax.random.PRNGKey(3)

    single = jax.jit(train_step)
    s1, loss1 = single(state, batch, rng)

    mesh = make_mesh(8)
    dp_step = make_dp_train_step(train_step, mesh)
    s2, loss2 = dp_step(replicate_tree(mesh, state),
                        shard_batch_tree(mesh, batch), rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    # sharded gradient reductions reorder float sums; Adam then maps the
    # epsilon-level gradient differences to ~lr-scaled parameter jitter, so
    # compare with an absolute tolerance well below the update magnitude
    for a, b2 in zip(jax.tree_util.tree_leaves(s1.params),
                     jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=1e-4)


def test_dp_step_output_sharding(cohort, topo):
    train_step, state, batch = _setup(cohort, topo)
    mesh = make_mesh(8)
    dp_step = make_dp_train_step(train_step, mesh)
    s2, loss = dp_step(replicate_tree(mesh, state),
                       shard_batch_tree(mesh, batch), jax.random.PRNGKey(0))
    # params stay replicated across all 8 devices
    leaf = jax.tree_util.tree_leaves(s2.params)[0]
    assert len(leaf.sharding.device_set) == 8
    assert leaf.sharding.is_fully_replicated


def test_fold_parallel_matches_sequential(cohort, topo):
    """tcfg.fold_parallel shards folds over the mesh; results must match the
    sequential fold-scan path (identical perms + dropout streams)."""
    import dataclasses as dc

    from iggcn_tpu.config import LossWeights
    from iggcn_tpu.train.cv import cross_validation

    mcfg = ModelConfig(num_layers=2, hidden=4, rois=90, feat_dim=3,
                       num_classes=2, num_regr=3, hidden_linear=8, l_dim=8)
    tcfg = TrainConfig(epochs=2, batch_size=8, lr=1e-3, folds=4, seed=7,
                       loss=LossWeights(disease=0.0, regr=1.0, prob=0.5,
                                        reco=1.5e-6, simi=0.1, orth=0.0))
    res_seq = cross_validation(cohort, topo, mcfg, tcfg, res_dir=None,
                               verbose=False)
    res_par = cross_validation(
        cohort, topo, mcfg, dc.replace(tcfg, fold_parallel=True),
        res_dir=None, verbose=False)
    np.testing.assert_allclose(res_par.mean_test_loss, res_seq.mean_test_loss,
                               rtol=1e-3)
    np.testing.assert_allclose(res_par.score_result, res_seq.score_result,
                               rtol=1e-3, atol=2e-3)


def test_fold_parallel_unequal_folds_matches_sequential(cohort, topo):
    """Same equivalence with folds=5 and batch_size=4 on the 48-subject
    cohort, so the folds' BATCH-ROUNDED sizes are unequal and the stacked
    path's padding machinery actually runs (row-0-content padding rows
    under w=0, identity-extended epoch permutations). The 4-fold variant
    above divides 48 evenly, and even unequal RAW fold sizes can round up
    to one common ceil(n/b)*b — the r4 mutation audit proved both
    `gather_rows`'s w-mask and `extend_perms`'s identity base could
    silently break while every equivalence test stayed green."""
    import dataclasses as dc

    from iggcn_tpu.config import LossWeights
    from iggcn_tpu.train.cv import cross_validation

    mcfg = ModelConfig(num_layers=2, hidden=4, rois=90, feat_dim=3,
                       num_classes=2, num_regr=3, hidden_linear=8, l_dim=8)
    tcfg = TrainConfig(epochs=2, batch_size=4, lr=1e-3, folds=5, seed=7,
                       loss=LossWeights(disease=0.0, regr=1.0, prob=0.5,
                                        reco=1.5e-6, simi=0.1, orth=0.0))
    res_seq = cross_validation(cohort, topo, mcfg, tcfg, res_dir=None,
                               verbose=False)
    res_par = cross_validation(
        cohort, topo, mcfg, dc.replace(tcfg, fold_parallel=True),
        res_dir=None, verbose=False)
    np.testing.assert_allclose(res_par.mean_test_loss, res_seq.mean_test_loss,
                               rtol=1e-3)
    np.testing.assert_allclose(res_par.score_result, res_seq.score_result,
                               rtol=1e-3, atol=2e-3)


def test_dp_sharding_actually_partitions_work(cohort, topo):
    """Scaling must be real partitioning, not silent replication (a program
    that replicates the batch would still run and still match numerically —
    and scale to nothing on real chips). Two attestations XLA can give
    without multi-chip hardware:

      1. the sharded batch's addressable shards are disjoint 1/n slices of
         the global batch, one per device, in device order;
      2. the PER-DEVICE compiled cost of the DP train step SHRINKS as the
         mesh grows: batch-proportional FLOPs shard away while the
         replicated param-side work (Adam chains, weight-shaped penalties)
         stays, so the drop is sub-linear but must be large. Measured on
         this model at B=16: 302 MFLOP/device on a 1-mesh vs 57 on an
         8-mesh (~5.3x); the bounds below leave headroom for XLA drift.
    """
    train_step, state, batch = _setup(cohort, topo)
    rng = jax.random.PRNGKey(0)

    from iggcn_tpu.parallel.mesh import batch_sharding, replicated

    def per_device_cost(n):
        mesh = make_mesh(n)
        rep, bsh = replicated(mesh), batch_sharding(mesh)
        rs = replicate_tree(mesh, state)
        sb = shard_batch_tree(mesh, batch)
        jitted = jax.jit(
            train_step,
            in_shardings=(jax.tree_util.tree_map(lambda _: rep, rs),
                          {k: bsh for k in sb}, rep),
            out_shardings=(jax.tree_util.tree_map(lambda _: rep, rs), rep))
        ca = jitted.lower(rs, sb, rng).compile().cost_analysis()
        if isinstance(ca, list):  # older jax returns one dict per device
            ca = ca[0]
        return sb, float(ca["flops"]), float(ca["bytes accessed"])

    sb8, flops8, bytes8 = per_device_cost(8)
    b = batch["y"].shape[0]
    x = np.asarray(batch["x"])
    shards = sorted(sb8["x"].addressable_shards, key=lambda s: s.device.id)
    assert len(shards) == 8
    for i, s in enumerate(shards):
        assert s.data.shape[0] == b // 8          # a 1/8 slice, not a copy
        np.testing.assert_array_equal(             # THE i-th slice, disjoint
            np.asarray(s.data), x[i * (b // 8):(i + 1) * (b // 8)])

    _, flops1, bytes1 = per_device_cost(1)
    assert flops8 < 0.30 * flops1, (flops8, flops1)
    assert bytes8 < 0.80 * bytes1, (bytes8, bytes1)


def test_fold_stacked_specs_partition_fold_and_sample_axes():
    """stacked_data_specs on a (fold=4, data=2) mesh must give each device a
    (1, S/2, ...) block — fold axis over the fold mesh axis, sample axis over
    the data axis — so every device holds 1/8 of the stacked cohort."""
    import jax.numpy as jnp

    from iggcn_tpu.train.fold_parallel import fold_mesh, stacked_data_specs

    mesh = fold_mesh(4)           # 8 virtual devices -> (fold=4, data=2)
    tree = {"x": np.arange(4 * 16 * 3, dtype=np.float32).reshape(4, 16, 3),
            "y": np.zeros((4, 16), dtype=np.int32)}
    specs = stacked_data_specs(mesh, tree)
    placed = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(jnp.asarray(a), s), tree, specs)
    xs = placed["x"].addressable_shards
    assert len(xs) == 8
    assert all(s.data.shape == (1, 8, 3) for s in xs)
    # shards tile the array exactly once (disjoint cover, no replication)
    seen = sorted(s.index for s in xs)
    assert len(set(seen)) == 8


def test_fold_mesh_composes_fold_and_data_axes():
    """Devices beyond the fold count extend a second data axis: 4 folds on
    8 devices -> (fold=4, data=2); each fold's sample axis is sharded over
    the data axis (within-fold data parallelism)."""
    from iggcn_tpu.train.fold_parallel import fold_mesh

    mesh = fold_mesh(4)
    assert mesh.axis_names == ("fold", "data")
    assert mesh.shape["fold"] == 4 and mesh.shape["data"] == 2
    mesh8 = fold_mesh(8)
    assert mesh8.shape["fold"] == 8 and mesh8.shape["data"] == 1
    mesh3 = fold_mesh(3)   # 3 folds, 8 devices -> fold=3, data=2 (6 used)
    assert mesh3.shape["fold"] == 3 and mesh3.shape["data"] == 2


def test_make_mesh_rejects_oversubscription():
    """Requesting more devices than visible must fail loudly — a silently
    truncated mesh would falsely 'verify' multichip execution (the round-1
    dryrun failure mode)."""
    import pytest
    with pytest.raises(ValueError, match="device"):
        make_mesh(10_000)


def test_fold_parallel_no_val_matches_sequential(cohort, topo):
    """no-val fold-parallel: the stacked val split is an ALIAS of the test
    buffers (no duplicate gather/upload — the runner tracks best on test and
    never reads val); results must still match the sequential no-val path."""
    import dataclasses as dc

    from iggcn_tpu.config import LossWeights
    from iggcn_tpu.train.cv import cross_validation

    mcfg = ModelConfig(num_layers=2, hidden=4, rois=90, feat_dim=3,
                       num_classes=2, num_regr=3, hidden_linear=8, l_dim=8)
    tcfg = TrainConfig(epochs=2, batch_size=8, lr=1e-3, folds=4, seed=7,
                       no_val=True,
                       loss=LossWeights(disease=0.0, regr=1.0, prob=0.5,
                                        reco=1.5e-6, simi=0.1, orth=0.0))
    res_seq = cross_validation(cohort, topo, mcfg, tcfg, res_dir=None,
                               verbose=False)
    res_par = cross_validation(
        cohort, topo, mcfg, dc.replace(tcfg, fold_parallel=True),
        res_dir=None, verbose=False)
    np.testing.assert_allclose(res_par.mean_test_loss, res_seq.mean_test_loss,
                               rtol=1e-3)
    np.testing.assert_allclose(res_par.score_result, res_seq.score_result,
                               rtol=1e-3, atol=2e-3)


def test_fold_parallel_requires_fold_scan(cohort, topo):
    """fold_parallel without use_fold_scan must raise, not silently run the
    sequential python-epoch path (the CLI rejects the combination too)."""
    import dataclasses as dc

    import pytest as _pytest

    from iggcn_tpu.train.cv import cross_validation

    mcfg = ModelConfig(num_layers=2, hidden=4, rois=90, feat_dim=3,
                       num_classes=2, num_regr=3, hidden_linear=8, l_dim=8)
    tcfg = TrainConfig(epochs=1, batch_size=8, folds=2, fold_parallel=True,
                       use_fold_scan=False)
    with _pytest.raises(ValueError, match="fold_parallel requires"):
        cross_validation(cohort, topo, mcfg, tcfg, res_dir=None,
                         verbose=False)
