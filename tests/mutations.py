"""Named plausible misimplementations for the test-sensitivity audit.

A test suite that never fails proves nothing about its own sensitivity.
Each entry here re-introduces a REALISTIC semantic drift — the kind of bug
a porter actually writes (several were real bugs caught during this build:
the biased running variance was found by the trajectory suite in round 3)
— as a runtime monkeypatch. `scripts/mutation_audit.py` runs the pinned
target test under each mutation (via the `IGGCN_MUTATION` env var, applied
by `tests/conftest.py` before any test module imports) and asserts the
test FAILS, i.e. the suite would have caught the bug.

Patches target module-level names looked up at call/trace time, so the
framework code under test picks them up without modification.
"""
import jax.numpy as jnp
import numpy as np


def _steplr_off_by_one():
    """Decay the LR one epoch EARLY — the classic StepLR boundary
    misreading (the reference decays in-place AFTER epoch % step_size == 0,
    `kernel/train_eval_sgcn_img_snps.py:169-171`)."""
    from iggcn_tpu.train import steps
    orig = steps.lr_at_step

    def mutated(tcfg, step, steps_per_epoch):
        return orig(tcfg, step + steps_per_epoch, steps_per_epoch)

    steps.lr_at_step = mutated


def _bn_biased_running_var():
    """Store the BIASED batch variance in running_var (drop Bessel's
    correction) — the real round-3 bug the trajectory suite caught."""
    from iggcn_tpu.models import nn_compat
    nn_compat.unbiased_var_factor = lambda n_red: 1.0


def _adam_decoupled_decay():
    """AdamW-style decoupled weight decay instead of torch's coupled L2
    (decay added to the gradients BEFORE the Adam transform)."""
    import optax

    from iggcn_tpu.train import steps

    def mutated(weight_decay=0.0):
        if weight_decay:
            return optax.chain(optax.scale_by_adam(),
                               optax.add_decayed_weights(weight_decay))
        return optax.scale_by_adam()

    steps.adam_transform = mutated


def _gcn_no_self_loops():
    """Drop the self-loop insertion from gcn_norm — a plausible reading of
    'symmetric normalization' that diverges from PyG's gcn_norm."""
    from iggcn_tpu.ops import gcn
    orig = gcn.gcn_propagation_matrix

    def mutated(adj, *, add_self_loops=True, **kw):
        del add_self_loops
        return orig(adj, add_self_loops=False, **kw)

    gcn.gcn_propagation_matrix = mutated


def _sparsity_entropy_dropped():
    """Omit the binary-entropy half of the sparsity penalty (keep only the
    L1 half) — an easy term to lose in `kernel/sgcn_img_snp.py:153-181`."""
    from iggcn_tpu.train import losses
    losses._binary_entropy = lambda p, eps=1e-6: jnp.zeros_like(p)


def _consistency_unnormalized():
    """Drop the 1/n^2 normalization from the similarity-consistency term
    (`kernel/train_eval_sgcn_img_snps.py:529-535` divides by n^2)."""
    from iggcn_tpu.train import losses
    orig = losses.consistency_loss

    def mutated(s, weight_matrix, sample_weight=None):
        n = s.shape[0]
        return orig(s, weight_matrix, sample_weight) * (n * n)

    losses.consistency_loss = mutated


def _fold_padding_gate_removed():
    """Drop the all-padding-batch no-op gate from the train step — the
    param-only sparsity penalties then step Adam (and advance the LR step
    counter) on batches that are 100% fold-equalization padding."""
    from iggcn_tpu.train import steps
    orig = steps.make_train_step

    def mutated(model, mcfg, tcfg, optimizer, objective=None, *,
                gate_padding=None):
        del gate_padding
        if objective is None:
            return orig(model, mcfg, tcfg, optimizer, gate_padding=False)
        return orig(model, mcfg, tcfg, optimizer, objective,
                    gate_padding=False)

    steps.make_train_step = mutated


def _impute_fit_on_all_splits():
    """Fit the KNN imputer on train+val+test TOGETHER — the classic
    cross-validation leakage bug (the reference fits on the train fold
    only, `util/tool.py:22-73`). Written out as the full alternative
    implementation a leaky port would contain."""
    import numpy as np

    from iggcn_tpu.data import impute
    from iggcn_tpu.data.adni import CLINICAL_SELECT_INDEX

    def mutated(demographics_splits, scaler4score,
                clinical_score_index=-1, k=3):
        from sklearn.impute import KNNImputer
        imputer = KNNImputer(n_neighbors=k)
        imputer.fit(np.vstack(demographics_splits))
        imputed = [imputer.transform(d) for d in demographics_splits]
        scaled = [scaler4score.transform(d) for d in imputed]
        sel = (CLINICAL_SELECT_INDEX if clinical_score_index == -1
               else np.array([clinical_score_index]))
        return [s[:, sel].astype(np.float32) for s in scaled]

    impute.knn_impute_scores = mutated


def _padding_weights_ignored():
    """Average data losses over ALL rows instead of w-masked real rows —
    zero-weight epoch-padding rows silently enter every loss term (the
    invariant that makes padded dense batches bit-match the reference's
    ragged final batch)."""
    from iggcn_tpu.train import losses

    def mutated(values, sample_weight=None):
        del sample_weight
        return jnp.mean(values)

    losses.weighted_mean = mutated


def _kfold_val_is_next():
    """Take the NEXT test fold as the validation fold instead of the
    previous one — the reference's `val_indices = [test_indices[i-1]]`
    (`kernel/train_eval_sgcn_img_snps.py:467-483`) reads equally plausibly
    either way; the CV drivers' internal A/B tests would drift in lockstep
    and stay green."""
    from iggcn_tpu.data import splits
    orig = splits.k_fold

    def mutated(y, folds, seed):
        tests = [te for _, te, _ in orig(y, folds, seed)]
        out = []
        for i in range(folds):
            val = tests[(i + 1) % folds]
            mask = np.ones(len(y), dtype=bool)
            mask[tests[i]] = False
            mask[val] = False
            out.append((np.nonzero(mask)[0], tests[i], val))
        return out

    splits.k_fold = mutated


def _ppr_row_normalized():
    """Random-walk normalization D^-1 A in the PPR matrix instead of the
    reference's symmetric D^-1/2 A D^-1/2 (`util_gdc.py:7-14`) — the three
    diffusion implementations are cross-pinned against each other, so only
    a hand-derived golden value catches a shared misreading."""
    from iggcn_tpu.data import diffusion

    def mutated(adj, alpha=0.05):
        n = adj.shape[0]
        h = adj / adj.sum(axis=1, keepdims=True)
        return alpha * np.linalg.inv(np.eye(n) - (1 - alpha) * h)

    diffusion.get_ppr_matrix = mutated


def _topk_per_row():
    """Sparsify the diffusion matrix by keeping top-k per ROW (then
    row-normalizing) instead of the reference's per-COLUMN rule
    (`util_gdc.py:25-31` argsorts axis=0 and divides by column sums)."""
    from iggcn_tpu.data import diffusion
    orig = diffusion.get_top_k_matrix

    def mutated(a, k=5):
        return np.ascontiguousarray(orig(np.ascontiguousarray(a.T), k).T)

    diffusion.get_top_k_matrix = mutated


def _dp_batch_replicated():
    """Replicate the batch across the DP mesh instead of sharding it — the
    classic silent-parallelism bug: every device computes the FULL batch,
    XLA's all-reduce averages identical gradients, every numeric
    equivalence test stays green, and the mesh scales to nothing. Only a
    partitioning-reality check (per-device compiled cost shrinking with
    mesh size) can catch it."""
    from iggcn_tpu.parallel import mesh as mesh_mod

    def mutated(mesh, axis_name="data"):
        del axis_name
        return mesh_mod.replicated(mesh)

    mesh_mod.batch_sharding = mutated


def _dp_gather_w_dropped():
    """Drop the w-mask from the device-side fold gather — fold-equalization
    padding rows (row-0 content) silently become real subjects in every
    loss/metric of the stacked fold-parallel path."""
    import jax.numpy as jnp_

    from iggcn_tpu.train import cv

    orig = cv.gather_rows

    def mutated(full_d, idx, clini, w):
        out = orig(full_d, idx, clini, w)
        out["w"] = jnp_.ones_like(out["w"])
        return out

    cv.gather_rows = mutated


def _fold_perms_pad_from_zero():
    """Pad the stacked epoch permutations with indices 0..pad instead of
    the identity over the NEW padding rows — an off-by-base that makes the
    padded slots re-sample REAL subjects (w=1), double-counting them in
    the padded folds' training batches."""
    import numpy as np_

    from iggcn_tpu.train import fold_parallel

    def mutated(perms, target):
        e, s = perms.shape
        if s == target:
            return perms
        extra = np_.broadcast_to(np_.arange(0, target - s,
                                            dtype=perms.dtype),
                                 (e, target - s))
        return np_.concatenate([perms, extra], axis=1)

    fold_parallel.extend_perms = mutated


def _gin_mlp_variant_swapped():
    """Give GIN (train_eps=True) GIN0's two-BN MLP — the exact conflation
    this build shipped until r4 (upstream GIN and GIN0 differ in eps AND
    MLP shape AND readout, `kernel/gin.py:190-196` vs `:124-131`); only a
    value-level oracle can see it."""
    from iggcn_tpu.models import baselines
    baselines._GINMLPLateBN = baselines._GINMLP


def _gat_self_loop_fill_one():
    """Add GAT self-loops with weight 1.0 instead of PyG's
    fill_value='mean' (the per-target mean incoming edge weight) — the
    exact drift a porter writes by taking add_self_loops' DEFAULT fill
    (`fill_value=1.`) instead of the `'mean'` the reference's GATConv
    passes implicitly via PyG defaults for weighted graphs
    (`kernel/sgcn.py:160-166`, `kernel/gcn_img_snp.py:32-47`). Changes
    every self-loop attention logit, so the GAT forward goldens and both
    GAT trajectories must go red."""
    import jax.numpy as jnp

    from iggcn_tpu.ops import gat

    gat._self_loop_fill = lambda w_off, mask_off: jnp.ones_like(
        jnp.sum(w_off, axis=1))


def _gat_leaky_slope_dropped():
    """Score GAT attention logits with relu instead of
    leaky_relu(slope=0.2) — the silently-dropped negative_slope a port
    loses when swapping activation helpers. Negative logits (about half,
    at glorot init) stop separating, so softmax weights and their
    GRADIENTS change; the six-step GAT trajectories are the pinned
    catch (a forward golden sees it too, but the gradient path through
    the kink is the training-time risk)."""
    from iggcn_tpu.ops import gat

    orig = gat.gat_conv

    def mutated(x, adj, p, negative_slope=0.2):
        return orig(x, adj, p, negative_slope=0.0)

    gat.gat_conv = mutated


MUTATIONS = {
    "steplr_off_by_one": _steplr_off_by_one,
    "bn_biased_running_var": _bn_biased_running_var,
    "adam_decoupled_decay": _adam_decoupled_decay,
    "gcn_no_self_loops": _gcn_no_self_loops,
    "sparsity_entropy_dropped": _sparsity_entropy_dropped,
    "consistency_unnormalized": _consistency_unnormalized,
    "impute_fit_on_all_splits": _impute_fit_on_all_splits,
    "padding_weights_ignored": _padding_weights_ignored,
    "fold_padding_gate_removed": _fold_padding_gate_removed,
    "kfold_val_is_next": _kfold_val_is_next,
    "ppr_row_normalized": _ppr_row_normalized,
    "topk_per_row": _topk_per_row,
    "dp_batch_replicated": _dp_batch_replicated,
    "dp_gather_w_dropped": _dp_gather_w_dropped,
    "fold_perms_pad_from_zero": _fold_perms_pad_from_zero,
    "gin_mlp_variant_swapped": _gin_mlp_variant_swapped,
    "gat_self_loop_fill_one": _gat_self_loop_fill_one,
    "gat_leaky_slope_dropped": _gat_leaky_slope_dropped,
}

# the test (file) pinned to catch each mutation — used by the audit script
TARGETS = {
    "steplr_off_by_one": "tests/test_lr_schedule.py",
    "bn_biased_running_var": "tests/test_trajectory_parity.py",
    "adam_decoupled_decay": "tests/test_trajectory_parity.py",
    "gcn_no_self_loops": "tests/test_conv_parity.py",
    "sparsity_entropy_dropped": "tests/test_losses_golden.py",
    "consistency_unnormalized": "tests/test_losses_golden.py",
    "impute_fit_on_all_splits": "tests/test_data_units.py",
    "padding_weights_ignored": "tests/test_padding_exactness.py",
    "fold_padding_gate_removed": "tests/test_padding_exactness.py",
    "kfold_val_is_next": "tests/test_splits.py",
    "ppr_row_normalized": "tests/test_diffusion_golden.py",
    "topk_per_row": "tests/test_diffusion_golden.py",
    "dp_batch_replicated": "tests/test_parallel.py",
    "dp_gather_w_dropped": "tests/test_parallel.py",
    "fold_perms_pad_from_zero": "tests/test_parallel.py",
    "gin_mlp_variant_swapped": "tests/test_zoo_golden.py",
    "gat_self_loop_fill_one": "tests/test_zoo_golden.py",
    "gat_leaky_slope_dropped": "tests/test_zoo_golden.py",
}


def apply_mutation(name: str) -> None:
    try:
        MUTATIONS[name]()
    except KeyError:
        raise SystemExit(
            f"unknown IGGCN_MUTATION {name!r}; known: {sorted(MUTATIONS)}")
