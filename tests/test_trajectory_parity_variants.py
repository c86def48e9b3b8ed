"""Multi-step training-trajectory parity for the remaining trainer families.

`test_trajectory_parity.py` pins the fused flagship and
`test_trajectory_parity_snps.py` the two SNP-only families; together with the
four tests here every CLI-reachable training family has the same end-to-end
hot-loop guarantee: SIX real optimizer steps in both frameworks from identical
weights on identical data — bare Adam (the reference call sites pass
weight_decay=0, `main.py:216`), two StepLR boundary crossings, live BatchNorm
batch statistics — asserting the per-step loss trajectory, final parameters,
and running-stat evolution.

  * gcn_fusion   — GCN_IMGSNP single-forward objective
                   (`kernel/train_eval_gcn_img_snps.py:448-483`)
  * clusterlabel — dual-pass two-head objective
                   (`kernel/train_eval_sgcn_clusterlabel.py:365-399`)
  * guide        — Gumbel-ST autoencoder objective
                   (`kernel/train_eval_guide_img_snps.py:450-489`), run in
                   the deterministic `gumbel_zero` parity mode
  * sgcn_image   — image-only SGCN dual-pass objective
                   (`kernel/train_eval_sgcn.py:296-313`), 6 steps on the
                   no-BN SGCN_GCN variant; SGCNOri additionally gets a
                   one-step pin (its relu->BN head makes multi-step
                   trajectories model-intrinsically chaotic — see the test)

Dropout is zeroed on BOTH sides (framework PRNGs cannot be aligned), and the
guide test additionally zeroes the Gumbel noise on both sides for the same
reason; everything else runs in true train mode.
"""
import jax
import numpy as np
import torch
import torch.nn.functional as F

from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
from iggcn_tpu.models.clusterlabel import ClusterLabelSGCN
from iggcn_tpu.models.fused_sgcn import FusedSGCN
from iggcn_tpu.models.guide import GuideImgSnp
from iggcn_tpu.models.sgcn_image import SGCNOri
from iggcn_tpu.oracle.torch_ref import (TorchClusterLabel, TorchFused,
                                        TorchGuide, TorchSgcnOri,
                                        iter_clusterlabel_param_pairs,
                                        iter_fused_param_pairs,
                                        iter_guide_param_pairs,
                                        iter_sgcn_ori_param_pairs,
                                        load_clusterlabel_params,
                                        load_fused_params, load_guide_params,
                                        load_sgcn_ori_params)
from iggcn_tpu.train.steps import (TrainState, clusterlabel_objective,
                                   gcn_fusion_objective, guide_objective,
                                   make_optimizer, make_train_step,
                                   sgcn_image_objective)

from tests.conftest import device_batch
# the training window (and therefore every measured tolerance in this file)
# is SHARED with the fused suite — import its constants so retuning one
# suite cannot silently invalidate the other's calibration
from iggcn_tpu.oracle.torch_losses import (clusterlabel_loss,
                                           gcn_fusion_loss, guide_loss,
                                           sgcn_image_loss)
from tests.test_trajectory_parity import B, DECAY_EVERY, FACTOR, LR, STEPS

# Adam noise-walk bound for gradient-degenerate leaves (see the fused test's
# analysis: true-zero gradients become full-lr steps of arbitrary sign under
# Adam's m/sqrt(v) normalization — in BOTH frameworks)
LR_WALK = 1.5 * sum(LR * FACTOR ** (e // DECAY_EVERY) for e in range(STEPS))


def _zero_dropout_cfg(**kw):
    return ModelConfig(num_layers=2, hidden=16, dropout_lin=0.0,
                       dropout_regr=0.0, dropout_go=0.0, dropout_readout=0.0,
                       **kw)


def _tcfg(lw):
    return TrainConfig(epochs=STEPS, batch_size=B, lr=LR, weight_decay=0.0,
                       lr_decay_factor=FACTOR, lr_decay_step_size=DECAY_EVERY,
                       loss=lw)


def _torch_batch(batch):
    return {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
            batch.items()}


def _run_jax(model, mcfg, tcfg, objective, batch, init_key):
    """Six make_train_step steps; returns (losses, init_params, final_params,
    step1_stats, final_stats)."""
    variables = jax.jit(model.init)(init_key, batch["x"], batch["adj"],
                                    batch["snps"])
    optimizer = make_optimizer(tcfg)
    train_step = jax.jit(make_train_step(model, mcfg, tcfg, optimizer,
                                         objective))
    state = TrainState.create(variables, optimizer, steps_per_epoch=1)
    losses, step1_stats = [], None
    rng = jax.random.PRNGKey(99)   # consumed by rate-0 dropout only
    for _ in range(STEPS):
        rng, erng = jax.random.split(rng)
        state, loss_sum = train_step(state, batch, erng)
        losses.append(float(loss_sum) / B)
        if step1_stats is None:
            step1_stats = jax.device_get(state.batch_stats)
    return (losses, jax.device_get(variables["params"]),
            jax.device_get(state.params), step1_stats,
            jax.device_get(state.batch_stats))


def _run_torch(tmodel, loss_fn):
    """Six torch Adam steps with the reference's in-place StepLR; returns
    (losses, step1_bn_snapshotter_result) via the caller's snapshot fn."""
    opt = torch.optim.Adam(tmodel.parameters(), lr=LR)
    losses = []
    for epoch in range(1, STEPS + 1):
        opt.zero_grad()
        loss = loss_fn()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        yield epoch, losses
        if epoch % DECAY_EVERY == 0:
            for g in opt.param_groups:
                g["lr"] = g["lr"] * FACTOR


def _assert_params(pairs, degenerate=()):
    """Strict elementwise final-param agreement (degenerate leaves take the
    Adam-walk bound instead — see the fused test's analysis)."""
    for name, t, a in pairs:
        a, tn = np.asarray(a), t.detach().numpy()
        if name in degenerate:
            assert np.abs(a - tn).max() < LR_WALK, \
                f"{name} exceeded the Adam noise-walk bound"
            continue
        np.testing.assert_allclose(
            a, tn, rtol=2e-3, atol=2.5e-4,
            err_msg=f"param {name} diverged after {STEPS} steps")


def _assert_params_envelope(pairs, tight_frac=0.99):
    """Envelope final-param agreement, for models whose gradient-degenerate
    leaves noise-walk AND feed back into downstream weights (clusterlabel:
    the mha key-bias walk perturbs scattered elements of lin1_*/GO weights
    by up to lr-scale by step 6). Two guarantees:

      1. EVERY element of EVERY parameter stays inside the Adam-walk
         envelope |delta| < LR_WALK — trajectories cannot separate faster
         than Adam's bounded steps allow;
      2. >= tight_frac of ALL elements (pooled over the tree) also meet the
         strict elementwise tolerance (measured: ~99.4% at step 6).

    A systematic optimizer-semantics bug (wrong lr / betas / decay order /
    coupled-vs-decoupled decay) moves essentially every gradient-bearing
    element past the strict tolerance and fails criterion 2."""
    total = tight = 0
    for name, t, a in pairs:
        a, tn = np.asarray(a), t.detach().numpy()
        assert np.abs(a - tn).max() < LR_WALK, \
            f"param {name} left the Adam-walk envelope"
        ok = np.isclose(a, tn, rtol=2e-3, atol=2.5e-4)
        total += ok.size
        tight += ok.sum()
    assert tight / total >= tight_frac, \
        (f"only {tight / total:.2%} of parameter elements tightly agree "
         f"after {STEPS} steps (need {tight_frac:.0%})")


def _assert_bn(jstats, tstats, rtol, label, atol=1e-5):
    # the "final" checks pass atol=2e-3: after 6 steps the stats compound the
    # degenerate leaves' Adam noise-walks, so near-zero elements carry O(1e-3)
    # absolute drift — the loose final check guards against runaway/NaN
    # evolution (O(0.1+) discrepancies), not elementwise agreement (same
    # rationale as the fused test)
    for bn_name, (t_mean, t_var) in tstats.items():
        np.testing.assert_allclose(
            np.asarray(jstats[bn_name]["mean"]), t_mean, rtol=rtol, atol=atol,
            err_msg=f"{bn_name} running mean diverged ({label})")
        np.testing.assert_allclose(
            np.asarray(jstats[bn_name]["var"]), t_var, rtol=rtol, atol=atol,
            err_msg=f"{bn_name} running var diverged ({label})")


def _go_bn_stats(tgo):
    return {name: (getattr(tgo, name).running_mean.numpy().copy(),
                   getattr(tgo, name).running_var.numpy().copy())
            for name in ["bn_atten", "bn_b", "bn_b_d", "bn_latent1",
                         "bn_latent2"]}


def test_gcn_fusion_trajectory_matches_torch(topo, cohort):
    """GCN_IMGSNP: single forward, loss = CE + regr-MSE + recon + consist +
    orth (`kernel/train_eval_gcn_img_snps.py:448-483`)."""
    lw = LossWeights(disease=1.0, regr=1.0, prob=0.5, reco=1.5e-6,
                     simi=0.1, orth=0.1)
    mcfg = _zero_dropout_cfg()
    tcfg = _tcfg(lw)
    batch = device_batch(cohort, B)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    (losses_jax, init_params, final_params, step1_stats,
     final_stats) = _run_jax(model, mcfg, tcfg, gcn_fusion_objective, batch,
                             jax.random.PRNGKey(21))

    tm = TorchFused(topo, num_layers=mcfg.num_layers, hidden=mcfg.hidden)
    load_fused_params(tm, init_params)
    tm.drop_lin = tm.drop_regr = 0.0
    tm.go.drop_gcn = tm.go.drop_readout = 0.0
    tm.train()
    tb = _torch_batch(batch)
    y = tb["y"].long()

    def loss_fn():
        return gcn_fusion_loss(tm, tb["x"], tb["adj"], tb["snps"], y,
                               tb["clini"], tb["tsne"], lw)

    losses_torch = None
    step1_bn = None
    for epoch, losses_torch in _run_torch(tm, loss_fn):
        if epoch == 1:
            step1_bn = _go_bn_stats(tm.go)

    np.testing.assert_allclose(losses_jax, losses_torch, rtol=2e-4,
                               err_msg="per-step gcn_fusion losses diverged")
    assert abs(losses_jax[0] - losses_jax[-1]) > 1e-3

    # mha.in_proj_bias's key slice is gradient-degenerate (constant key shift
    # cancels in the softmax); the final decoder LayerNorm bias only feeds the
    # 1.5e-6-weighted recon term — both are Adam noise-walks (see the fused
    # test's analysis), so they take the bound check via the slice trick below
    e_dim = mcfg.jk_dim
    last_dec = f"go.g_b_d_{mcfg.go_n_l - 1}.b"
    pairs = []
    for name, t, a in iter_fused_param_pairs(tm, final_params):
        if name == "mha.in_proj_bias":
            a = np.asarray(a).copy()
            tn = t.detach().numpy()
            assert np.abs(a - tn)[e_dim:2 * e_dim].max() < LR_WALK
            a[e_dim:2 * e_dim] = tn[e_dim:2 * e_dim]
            pairs.append((name, torch.from_numpy(tn.copy()), a))
        else:
            pairs.append((name, t, a))
    _assert_params(pairs, degenerate={last_dec})

    _assert_bn(step1_stats["go_network"], step1_bn, 2e-3, "step1")
    _assert_bn(final_stats["go_network"], _go_bn_stats(tm.go), 0.1, "final",
               atol=2e-3)


def test_clusterlabel_trajectory_matches_torch(topo, cohort):
    """SGCN_GCN_CLUSTERLABEL: dual sequential pass, averaged disease/cluster
    CE + sparsity + recon (`kernel/train_eval_sgcn_clusterlabel.py:365-399`)."""
    lw = LossWeights(disease=1.0, regr=0.0, prob=0.5, reco=1.5e-6,
                     simi=0.0, orth=0.0)
    mcfg = _zero_dropout_cfg(is_predict_cluster=True)
    tcfg = _tcfg(lw)
    batch = device_batch(cohort, B)
    model = ClusterLabelSGCN(cfg=mcfg, topo=topo)
    (losses_jax, init_params, final_params, step1_stats,
     final_stats) = _run_jax(model, mcfg, tcfg, clusterlabel_objective,
                             batch, jax.random.PRNGKey(23))

    tm = TorchClusterLabel(topo, num_layers=mcfg.num_layers,
                           hidden=mcfg.hidden)
    load_clusterlabel_params(tm, init_params)
    tm.drop_head = 0.0
    tm.go.drop_gcn = tm.go.drop_readout = 0.0
    tm.train()
    tb = _torch_batch(batch)
    y = tb["y"].long()
    cy = tb["clust_y"].long()

    def loss_fn():
        # clusterlabel applies the sparsity penalty UNWEIGHTED
        # (kernel/train_eval_sgcn_clusterlabel.py:365-399)
        return clusterlabel_loss(tm, tb["x"], tb["adj"], tb["snps"], y, cy,
                                 lw)

    losses_torch = None
    step1_bn = None
    for epoch, losses_torch in _run_torch(tm, loss_fn):
        if epoch == 1:
            step1_bn = _go_bn_stats(tm.go)

    # rtol is looser than the fused test's 2e-4: the two gradient-degenerate
    # leaves (mha key bias, final decoder LN bias) noise-walk at full lr in
    # both frameworks and their feedback into this model's two-head loss is
    # stronger than in the fused model (measured drift reaches ~4e-4 of the
    # loss by step 6; steps 1-2, before the walks accumulate, agree to 1e-6)
    np.testing.assert_allclose(losses_jax, losses_torch, rtol=1e-3,
                               err_msg="per-step clusterlabel losses diverged")
    np.testing.assert_allclose(losses_jax[:2], losses_torch[:2], rtol=2e-4,
                               err_msg="early clusterlabel losses diverged")
    assert abs(losses_jax[0] - losses_jax[-1]) > 1e-3

    # This model's degenerate-walk feedback spreads past the two walking
    # leaves themselves (measured at step 6: snps_prob 43% loose but within
    # walk scale, lin1_cluster.weight 1.25%, lin1_classify.weight 0.02%,
    # scattered GO elements) — the cluster head's error signal is weakest at
    # init, so chaos covers more of its inputs. The envelope check holds
    # EVERY element to the Adam-walk bound and >=99% of all elements to the
    # strict tolerance.
    _assert_params_envelope(iter_clusterlabel_param_pairs(tm, final_params))

    _assert_bn(step1_stats["go_network"], step1_bn, 2e-3, "step1")
    _assert_bn(final_stats["go_network"], _go_bn_stats(tm.go), 0.1, "final",
               atol=2e-3)


def test_guide_trajectory_matches_torch(topo, cohort):
    """GUIDE_IMGSNP: Gumbel-ST autoencoder objective
    (`kernel/train_eval_guide_img_snps.py:450-489`) in the deterministic
    gumbel_zero parity mode; PReLU GO branch (guide_go_model)."""
    lw = LossWeights(disease=1.0, regr=1.0, prob=1e-4, reco=1e-3,
                     simi=0.1, orth=0.0)
    mcfg = _zero_dropout_cfg()
    tcfg = _tcfg(lw)
    batch = device_batch(cohort, B)
    model = GuideImgSnp(cfg=mcfg, topo=topo, gumbel_zero=True)
    (losses_jax, init_params, final_params, step1_stats,
     final_stats) = _run_jax(model, mcfg, tcfg, guide_objective, batch,
                             jax.random.PRNGKey(29))

    tm = TorchGuide(topo, go_hidden=mcfg.hidden, gumbel_zero=True)
    load_guide_params(tm, init_params)
    tm.drop_enc = tm.drop_dec = tm.drop_lin = tm.drop_regr = 0.0
    tm.go.drop_gcn = tm.go.drop_readout = 0.0
    tm.train()
    tb = _torch_batch(batch)
    y = tb["y"].long()

    def loss_fn():
        return guide_loss(tm, tb["x"], tb["adj"], tb["snps"], y, tb["clini"],
                          lw, temperature=tcfg.temperature)

    def guide_bn_stats():
        stats = {name: (getattr(tm.go, name).running_mean.numpy().copy(),
                        getattr(tm.go, name).running_var.numpy().copy())
                 for name in ["bn_atten", "bn_b", "bn_b_d", "bn_latent1"]}
        for name in ["dec_bn1", "dec_bn2"]:
            bn = getattr(tm, name)
            stats[name] = (bn.running_mean.numpy().copy(),
                           bn.running_var.numpy().copy())
        return stats

    losses_torch = None
    step1_bn = None
    for epoch, losses_torch in _run_torch(tm, loss_fn):
        if epoch == 1:
            step1_bn = guide_bn_stats()

    np.testing.assert_allclose(losses_jax, losses_torch, rtol=2e-4,
                               err_msg="per-step guide losses diverged")
    assert abs(losses_jax[0] - losses_jax[-1]) > 1e-3

    last_dec = f"go.g_b_d_{mcfg.go_n_l - 1}.b"
    _assert_params(iter_guide_param_pairs(tm, final_params),
                   degenerate={last_dec})

    def jax_bn(stats):
        out = {name: stats["go_network"][name]
               for name in ["bn_atten", "bn_b", "bn_b_d", "bn_latent1"]}
        out["dec_bn1"] = stats["dec_bn1"]
        out["dec_bn2"] = stats["dec_bn2"]
        return out

    _assert_bn(jax_bn(step1_stats), step1_bn, 2e-3, "step1")
    _assert_bn(jax_bn(final_stats), guide_bn_stats(), 0.1, "final",
               atol=2e-3)


def test_sgcn_image_trajectory_matches_torch(cohort):
    """SGCN_GCN image-only family: dual sequential pass, loss = lamda_ce*CE +
    loss_probability + lamda_mi*CE_masked (`kernel/train_eval_sgcn.py:296-313`).

    SGCNImage has no batch norms, hence no gradient-degenerate head biases —
    every parameter holds elementwise over the full 6-step window. (SGCNOri's
    relu->BN head makes fc1/fc2 biases noise-walk; see the 1-step test
    below.)"""
    from iggcn_tpu.models.sgcn_image import SGCNImage
    from iggcn_tpu.oracle.torch_ref import (TorchSgcnImage,
                                            iter_sgcn_image_param_pairs,
                                            load_sgcn_image_params)

    mcfg = _zero_dropout_cfg()
    tcfg = _tcfg(LossWeights(disease=1.0))
    batch = device_batch(cohort, B)
    model = SGCNImage(num_layers=2, hidden=16, dropout_lin=0.0)

    variables = jax.jit(model.init)(jax.random.PRNGKey(37), batch["x"],
                                    batch["adj"])
    init_params = jax.device_get(variables["params"])
    optimizer = make_optimizer(tcfg)
    train_step = jax.jit(make_train_step(model, mcfg, tcfg, optimizer,
                                         sgcn_image_objective))
    state = TrainState.create(variables, optimizer, steps_per_epoch=1)
    losses_jax = []
    rng = jax.random.PRNGKey(99)
    for _ in range(STEPS):
        rng, erng = jax.random.split(rng)
        state, loss_sum = train_step(state, batch, erng)
        losses_jax.append(float(loss_sum) / B)
    final_params = jax.device_get(state.params)

    tm = TorchSgcnImage(num_layers=2, hidden=16)
    load_sgcn_image_params(tm, init_params)
    tm.drop = 0.0
    tm.train()
    tb = _torch_batch(batch)
    y = tb["y"].long()

    def loss_fn():
        return sgcn_image_loss(tm, tb["x"], tb["adj"], y)

    losses_torch = None
    for _, losses_torch in _run_torch(tm, loss_fn):
        pass

    np.testing.assert_allclose(losses_jax, losses_torch, rtol=2e-4,
                               err_msg="per-step sgcn_image losses diverged")
    assert abs(losses_jax[0] - losses_jax[-1]) > 1e-3
    _assert_params(iter_sgcn_image_param_pairs(tm, final_params))


def test_sgcn_ori_one_step_matches_torch(cohort):
    """SGCN_Ori: ONE full optimizer step — loss value, gradients-through-Adam,
    and BatchNorm running-stat update all pinned at shared weights.

    Why not 6 steps like every other family: SGCNOri's head is
    fc -> relu -> BatchNorm (`kernel/sgcn.py:128-140`), so any fc-bias element
    whose relu pattern is batch-uniform has an EXACTLY-ZERO gradient (the
    constant shift is cancelled by the BN), which Adam amplifies into full-lr
    noise-walk steps of arbitrary sign in BOTH frameworks; once a walked bias
    crosses a relu boundary the trajectories separate chaotically (measured:
    two runs differ by ~0.08 in loss at step 2). That is a property of the
    reference model, not of this rebuild — two torch runs with epsilon
    gradient noise diverge the same way."""
    mcfg = _zero_dropout_cfg()
    tcfg = _tcfg(LossWeights(disease=1.0))
    batch = device_batch(cohort, B)
    model = SGCNOri(dropout1=0.0, dropout2=0.0)

    variables = jax.jit(model.init)(jax.random.PRNGKey(31), batch["x"],
                                    batch["adj"])
    init_params = jax.device_get(variables["params"])
    optimizer = make_optimizer(tcfg)
    train_step = jax.jit(make_train_step(model, mcfg, tcfg, optimizer,
                                         sgcn_image_objective))
    state = TrainState.create(variables, optimizer, steps_per_epoch=1)
    state, loss_sum = train_step(state, batch, jax.random.PRNGKey(99))
    loss_jax = float(loss_sum) / B
    step1_params = jax.device_get(state.params)
    step1_stats = jax.device_get(state.batch_stats)

    tm = TorchSgcnOri()
    load_sgcn_ori_params(tm, init_params)
    tm.drop1 = tm.drop2 = 0.0
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=LR)
    tb = _torch_batch(batch)
    y = tb["y"].long()
    opt.zero_grad()
    loss = sgcn_image_loss(tm, tb["x"], tb["adj"], y)
    loss.backward()
    opt.step()

    np.testing.assert_allclose(loss_jax, float(loss.detach()), rtol=2e-4)
    # one Adam step moves each framework by at most lr per element, so the
    # degenerate fc biases can differ by at most 2*lr (opposite signs)
    one_step_walk = 2.2 * LR
    for name, t, a in iter_sgcn_ori_param_pairs(tm, step1_params):
        a, tn = np.asarray(a), t.detach().numpy()
        if name in ("fc1.bias", "fc2.bias"):
            assert np.abs(a - tn).max() < one_step_walk, \
                f"{name} exceeded the one-step Adam bound"
            continue
        np.testing.assert_allclose(
            a, tn, rtol=2e-3, atol=2.5e-4,
            err_msg=f"param {name} diverged after 1 step")

    _assert_bn(step1_stats,
               {n: (getattr(tm, n).running_mean.numpy().copy(),
                    getattr(tm, n).running_var.numpy().copy())
                for n in ["bn1", "bn2"]}, 2e-3, "step1")


def test_generic_zoo_trajectory_matches_torch(cohort):
    """The LAST trainer family: the generic zoo driver
    (`kernel/train_eval.py:278-314`, plain NLL) — six steps of the exact
    production step (`generic_cv.build_generic_steps`, hoisted like
    `snps_trainer.build_snps_steps`) on the GCNFlat baseline vs a torch
    replica. GCNFlat has no batch norms, so every parameter holds
    elementwise, and the ragged-batch `w` mask is exercised with one
    zero-weight padding row (the torch side trains on the REAL rows only —
    the framework's padded math must equal the smaller torch batch)."""
    import optax

    from iggcn_tpu.models.baselines import GCNFlat
    from iggcn_tpu.oracle.torch_ref import (TorchGcnFlat,
                                            iter_gcn_flat_param_pairs,
                                            load_gcn_flat_params)
    from iggcn_tpu.train.generic_cv import build_generic_steps
    from iggcn_tpu.train.steps import steplr_host

    batch = device_batch(cohort, B)
    # last row = padding: w=0, garbage-but-finite content
    w = np.ones((B,), np.float32)
    w[-1] = 0.0
    batch["w"] = jax.numpy.asarray(w)

    model = GCNFlat(num_layers=2, hidden=16, dropout_lin=0.0)
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(41), batch["x"],
                                         batch["adj"]))
    init_params = jax.device_get(variables["params"])
    optimizer = optax.scale_by_adam(b1=0.9, b2=0.999)
    train_step, eval_batch = build_generic_steps(
        model, optimizer, needs_mask=False, needs_assign=False,
        adj_only=False, aux_loss=False, takes_weight=False, has_stats=False)
    opt_state = optimizer.init(variables["params"])

    losses_jax = []
    rng = jax.random.PRNGKey(99)
    for epoch in range(STEPS):
        lr_t = jax.numpy.float32(steplr_host(LR, FACTOR, DECAY_EVERY, epoch))
        rng, srng = jax.random.split(rng)
        variables, opt_state, loss = train_step(variables, opt_state, batch,
                                                srng, lr_t)
        losses_jax.append(float(loss))
    final_params = jax.device_get(variables["params"])

    tm = TorchGcnFlat(num_layers=2, hidden=16)
    load_gcn_flat_params(tm, init_params)
    tm.drop = 0.0   # dropout zeroed on both sides (PRNGs cannot align)
    tm.train()
    import torch as _torch
    x_t = _torch.from_numpy(np.asarray(batch["x"])[:-1].copy())
    adj_t = _torch.from_numpy(np.asarray(batch["adj"])[:-1].copy())
    y_t = _torch.from_numpy(np.asarray(batch["y"])[:-1].copy()).long()
    opt = _torch.optim.Adam(tm.parameters(), lr=LR)
    losses_torch = []
    for epoch in range(STEPS):
        for g in opt.param_groups:
            g["lr"] = steplr_host(LR, FACTOR, DECAY_EVERY, epoch)
        opt.zero_grad()
        loss = F.nll_loss(tm(x_t, adj_t), y_t)
        loss.backward()
        opt.step()
        losses_torch.append(float(loss.detach()))

    np.testing.assert_allclose(losses_jax, losses_torch, rtol=2e-4,
                               err_msg="per-step generic-zoo losses diverged")
    assert abs(losses_jax[0] - losses_jax[-1]) > 1e-3
    _assert_params(iter_gcn_flat_param_pairs(tm, final_params))
