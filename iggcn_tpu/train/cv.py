"""Stratified k-fold cross-validation driver for the fused model.

Re-design of `cross_validation_with_val_set` / `cross_validation_without_val_set`
(`kernel/train_eval_sgcn_img_snps.py:35-244,247-438`):

  * Per fold, the whole (train/val/test) data lives on device as dense padded
    arrays; one jitted `lax.scan` runs the entire fold (train epochs + val/test
    evals + best-val tracking) in a single dispatch (`fold_scan.py`).
  * `tcfg.fold_parallel` runs ALL folds simultaneously: the fold runner is
    vmapped over a fold axis sharded across the device mesh
    (`fold_parallel.py`) — the reference's entire k-fold experiment becomes
    one SPMD program.
  * Best-val-epoch checkpointing, importance artifacts, per-epoch score
    matrix, hidden/subid/linear dumps, pooled regression metrics: all parity.
  * Fold selection logic: with-val keeps the val fold out of training; the
    no-val variant folds it into training and tracks best *test* loss
    (parity `:301,371`).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from iggcn_tpu.config import ModelConfig, TrainConfig
from iggcn_tpu.data.adni import (SCORE_NAMES_ALL, SCORE_NAMES_DEFAULT,
                                 AdniCohort)
from iggcn_tpu.data.batching import (cohort_batch_arrays, pad_to_batches,
                                     to_device)
from iggcn_tpu.data.impute import knn_impute_scores
from iggcn_tpu.data.splits import k_fold
from iggcn_tpu.models.fused_sgcn import FusedSGCN
from iggcn_tpu.train import artifacts, metrics
from iggcn_tpu.train.checkpoint import save_checkpoint
from iggcn_tpu.train.fold_parallel import (extend_perms, fold_mesh,
                                           index_tree, pad_fold_data,
                                           run_folds_parallel,
                                           stacked_data_specs)
from iggcn_tpu.train.fold_scan import make_epoch_fns, make_fold_runner
from iggcn_tpu.train.records import config_fingerprint
from iggcn_tpu.train.steps import (OBJECTIVES, TrainState,
                                   make_optimizer)
from iggcn_tpu.utils.fetch import device_get_tree


def gather_rows(full_d, idx, clini, w):
    """Device-side fold assembly: gather a fold's rows out of the uploaded
    cohort; `idx` may be (T,) (sequential path) or (folds, T) (fold-parallel
    stacked path) — padding rows carry row-0 content under w=0. ONE body for
    both paths so the device-gather contract cannot drift between them."""
    out = {k: jnp.take(v, idx, axis=0) for k, v in full_d.items()}
    out["clini"] = clini
    out["w"] = w
    return out


@dataclasses.dataclass
class CVResult:
    mean_test_loss: float
    best_acc: float
    best_acc_std: float
    score_result: np.ndarray        # (folds, epochs, 5): acc/auc/f1/sen/spe
    durations: List[float]
    throughput_graphs_per_sec: float
    regression_summary: Dict[str, Dict[str, float]]


def _build_fused(mcfg, topo):
    return FusedSGCN(cfg=mcfg, topo=topo)


def _build_guide(mcfg, topo):
    from iggcn_tpu.models.guide import GuideImgSnp
    return GuideImgSnp(cfg=mcfg, topo=topo)


def _build_clusterlabel(mcfg, topo):
    from iggcn_tpu.models.clusterlabel import ClusterLabelSGCN
    return ClusterLabelSGCN(cfg=mcfg, topo=topo)


def _build_sgcn_image(mcfg, topo):
    from iggcn_tpu.models.sgcn_image import SGCNImage
    return SGCNImage(num_layers=mcfg.num_layers, hidden=mcfg.hidden,
                     rois=mcfg.rois, feat_dim=mcfg.feat_dim,
                     num_classes=mcfg.num_classes,
                     hidden_linear=mcfg.hidden_linear,
                     use_gat=mcfg.use_gat)


def _build_sgcn_ori(mcfg, topo):
    # fixed conv1->conv3 architecture (parity kernel/sgcn.py:11-151);
    # num_layers/hidden are architecture constants there, not flags
    from iggcn_tpu.models.sgcn_image import SGCNOri
    return SGCNOri(h0=mcfg.feat_dim, rois=mcfg.rois,
                   num_classes=mcfg.num_classes)


# single registry tying each model kind to its builder and init signature;
# the objective comes from steps.OBJECTIVES under the same key (checked below
# so the two tables cannot drift apart)
MODEL_FAMILIES = {
    # kind: (build(mcfg, topo), takes_snps)
    "sgcn_imgsnp": (_build_fused, True),
    "gcn_imgsnp": (_build_fused, True),
    "guide_imgsnp": (_build_guide, True),
    "clusterlabel": (_build_clusterlabel, True),
    "sgcn_image": (_build_sgcn_image, False),
    "sgcn_ori": (_build_sgcn_ori, False),
}
if set(MODEL_FAMILIES) != set(OBJECTIVES):  # not assert: survives python -O
    raise RuntimeError(
        "MODEL_FAMILIES and steps.OBJECTIVES must list the same model kinds")


def _epoch_fns(model, mcfg: ModelConfig, tcfg: TrainConfig, optimizer,
               objective=None):
    """Jitted per-epoch train/eval for the python-epoch debug path — thin
    wrappers over the single shared implementation in
    `fold_scan.make_epoch_fns` (also the body of the whole-fold scan)."""
    if objective is None:
        objective = OBJECTIVES["sgcn_imgsnp"]
    train_one_epoch, eval_set = make_epoch_fns(model, mcfg, tcfg, optimizer,
                                               objective)
    # donate the state: the per-epoch loop always rebinds it to the output
    return (jax.jit(train_one_epoch, donate_argnums=(0,)),
            jax.jit(eval_set))


def _impute_fold(cohort, external_test, use_val, clinical_score_index,
                 train_idx, test_idx, val_idx):
    """Leakage-safe per-fold imputation (parity util/tool.py:22-111);
    returns (train_idx possibly merged with val, tr/val/te scores). ONE
    body shared by the sequential closure and the fold-parallel batch
    paths so the imputation contract cannot drift between them."""
    if not use_val:
        train_idx = np.concatenate([train_idx, val_idx])
    demo = cohort.demographics
    test_demo = (external_test.demographics if external_test is not None
                 else demo[test_idx])
    if use_val:
        tr_scores, val_scores, te_scores = knn_impute_scores(
            [demo[train_idx], demo[val_idx], test_demo],
            cohort.scaler4score, clinical_score_index)
    else:
        tr_scores, te_scores = knn_impute_scores(
            [demo[train_idx], test_demo],
            cohort.scaler4score, clinical_score_index)
        val_scores = None
    return train_idx, tr_scores, val_scores, te_scores


def _fold_perms(seed, epochs, fold, n_train, total_padded):
    """Pre-drawn epoch permutations over the fold's padded size (identity
    over the pad rows) — one stream per fold, identical between the host
    and device-assembly paths and across permutation-batch seeds."""
    shuffler = np.random.default_rng(seed * 1000 + fold)
    return np.stack([
        np.concatenate([shuffler.permutation(n_train),
                        np.arange(n_train, total_padded)])
        for _ in range(epochs)]).astype(np.int32)


def _fold_parallel_gather_host(cohort, full, splits, tcfg, use_val,
                               clinical_score_index, shared_perms=None):
    """Host half of the device-side fold assembly (fold-parallel path):
    per-fold leakage-safe imputation + epoch perms, then the stacked
    (folds, T) index/weight/clini/label arrays per split kind. Only tiny
    vectors are materialized host-side — the padded fold tensors are
    gathered ON DEVICE by `_fold_parallel_gather_device`.

    `shared_perms`: the already-extended per-fold epoch permutations from a
    sibling call. The streams are deterministic in (tcfg.seed, fold, sizes)
    and sizes derive from the splits alone, so permutation-batch seeds
    (identical splits) share one set instead of redrawing
    folds x epochs x train_size streams per seed."""
    b = tcfg.batch_size
    k = len(splits)
    imputed, n_trains, real_spes, perms_list = [], [], [], []
    for f, (train_idx, test_idx, val_idx) in enumerate(splits):
        tri, tr_s, va_s, te_s = _impute_fold(
            cohort, None, use_val, clinical_score_index,
            train_idx, test_idx, val_idx)
        own_total = -(-len(tri) // b) * b
        imputed.append({"train": (tri, tr_s),
                        "val": ((val_idx, va_s) if use_val
                                else (test_idx, te_s)),
                        "test": (test_idx, te_s)})
        n_trains.append(len(tri))
        real_spes.append(own_total // b)
        if shared_perms is None:
            perms_list.append(_fold_perms(tcfg.seed, tcfg.epochs, f,
                                          len(tri), own_total))
    targets = {kind: max(-(-len(d[kind][0]) // b) * b for d in imputed)
               for kind in ("train", "val", "test")}
    if shared_perms is None:
        perms_list = [extend_perms(p, targets["train"]) for p in perms_list]
    else:
        perms_list = list(shared_perms)

    def stacked_kind(kind):
        t = targets[kind]
        nregr = imputed[0]["train"][1].shape[1]
        idx = np.zeros((k, t), np.int32)
        w = np.zeros((k, t), np.float32)
        clini = np.zeros((k, t, nregr), np.float32)
        yh = np.zeros((k, t), np.int32)
        for i, d in enumerate(imputed):
            ids, scores = d[kind]
            n = len(ids)
            idx[i, :n] = ids
            w[i, :n] = 1.0
            clini[i, :n] = scores
            yh[i, :n] = full["y"][ids]
        return idx, w, clini, yh

    kinds = {"train": stacked_kind("train"), "test": stacked_kind("test")}
    if use_val:
        kinds["val"] = stacked_kind("val")
    return {"kinds": kinds, "perms_list": perms_list, "real_spes": real_spes,
            "n": {"train": n_trains,
                  "val": [len(d["val"][0]) for d in imputed],
                  "test": [len(d["test"][0]) for d in imputed]},
            "test_ids": [d["test"][0] for d in imputed],
            "targets": targets}


def _fold_parallel_gather_device(full, kinds_host, mesh, use_val):
    """Device half of the fold assembly: upload the cohort ONCE, gather each
    entry's rows with the (fold, data) mesh output sharding. `kinds_host`
    maps split kind -> the stacked (idx, w, clini, yh) host arrays; in
    no-val mode the runner never reads val_data, so it aliases the test
    buffers instead of gathering a duplicate into HBM."""
    gkeys = ("x", "adj", "snps", "y", "clust_y", "tsne")
    full_dev = {kk: jnp.asarray(full[kk]) for kk in gkeys}
    stacked_dev = {}
    for kind in ("train", "test", "val"):
        if kind == "val" and not use_val:
            stacked_dev["val"] = stacked_dev["test"]
            continue
        idx, w, clini, _yh = kinds_host[kind]
        args = (full_dev, jnp.asarray(idx), jnp.asarray(clini),
                jnp.asarray(w))
        out_spec = stacked_data_specs(
            mesh, jax.eval_shape(gather_rows, *args))
        stacked_dev[kind] = jax.jit(
            gather_rows, out_shardings=out_spec)(*args)
    return stacked_dev["train"], stacked_dev["val"], stacked_dev["test"]


def _fold_parallel_prepped_shims(full, host):
    """Small host-side per-fold views for the metric/bookkeeping loop —
    same keys the sequential host path exposes via the padded dicts."""
    k = len(host["perms_list"])
    prepped = []
    for f in range(k):
        d = {}
        for kind in ("train", "val", "test"):
            src = kind if kind in host["kinds"] else "test"
            _idx, w, clini, yh = host["kinds"][src]
            d[kind + "_data"] = {"w": w[f], "clini": clini[f], "y": yh[f]}
        d["test_subids"] = full["sbj_id"][host["test_ids"][f]]
        d["n_train"] = host["n"]["train"][f]
        d["n_test"] = host["n"]["test"][f]
        d["n_val"] = host["n"]["val"][f]
        d["perms"] = host["perms_list"][f]
        prepped.append(d)
    return prepped


def _apply_warm_start(variables, warm):
    """Replace a fresh init's params/batch_stats with externally supplied
    trees (e.g. a converted reference checkpoint, `tools/import_torch`).
    Tree structure and every leaf shape must match the model exactly;
    dtypes are coerced to the init's."""
    out = dict(variables)
    for name, tree in (("params", warm[0]), ("batch_stats", warm[1])):
        if tree is None:
            continue
        cur = variables.get(name)
        if cur is None:
            raise ValueError(f"warm start supplies {name!r} but the model "
                             f"has no such collection")
        want = jax.tree_util.tree_structure(jax.device_get(cur))
        got = jax.tree_util.tree_structure(tree)
        if want != got:
            raise ValueError(
                f"warm-start {name} tree does not match the model's: "
                f"supplied {got}, model has {want} — was the checkpoint "
                f"trained with a different architecture?")

        def _chk(a, b):
            if tuple(np.shape(a)) != tuple(np.shape(b)):
                raise ValueError(
                    f"warm-start {name} leaf shape {np.shape(b)} does not "
                    f"match the model's {np.shape(a)}")
            return np.asarray(b, np.asarray(a).dtype)

        out[name] = jax.tree_util.tree_map(_chk, jax.device_get(cur), tree)
    return out


def _init_fold_state(model, optimizer, takes_snps, mcfg, b, seed, fold,
                     steps_per_epoch, warm=None):
    """Fresh model per fold (parity :101-107); returns (state, rng).
    `steps_per_epoch` = the fold's REAL train batches per epoch, carried in
    the state so the per-epoch LR decay is exact per fold. Deterministic in
    (seed, fold) only — permutation-batch seeds share identical inits, as
    standalone runs would. `warm`: optional (params, batch_stats) trees
    that replace the fresh init (every fold then starts from the same
    externally trained weights; the optimizer state still starts fresh)."""
    rng = jax.random.PRNGKey(seed + fold)
    init_rng, rng = jax.random.split(rng)
    # host zeros: jnp.zeros would be 3 eager device ops per fold, each a
    # tunnel round trip on a remote backend
    dummy = (np.zeros((b, mcfg.rois, mcfg.feat_dim), np.float32),
             np.zeros((b, mcfg.rois, mcfg.rois), np.float32))
    if takes_snps:
        dummy = dummy + (np.zeros((b, mcfg.num_snps), np.float32),)
    variables = jax.jit(model.init)(init_rng, *dummy)
    if warm is not None:
        variables = _apply_warm_start(variables, warm)
    state = TrainState.create(variables, optimizer, steps_per_epoch)
    return state, rng


def cross_validation(cohort: AdniCohort, topo, mcfg: ModelConfig,
                     tcfg: TrainConfig, *,
                     res_dir: Optional[str] = None,
                     result_file_name: str = "result",
                     clinical_score_index: Optional[int] = None,
                     logger: Optional[Callable[[str], None]] = None,
                     model_kind: str = "sgcn_imgsnp",
                     external_test: Optional[AdniCohort] = None,
                     verbose: bool = True,
                     export_bundle: bool = False,
                     resume: bool = False,
                     warm_start=None,
                     _injected=None) -> CVResult:
    """Run the full CV experiment. `tcfg.no_val` selects the without-val
    variant; `model_kind` selects the model family and its objective
    (sgcn_imgsnp | gcn_imgsnp | guide_imgsnp | clusterlabel | sgcn_image |
    sgcn_ori).

    `external_test`: held-out generalization cohort (e.g. a held-out ADNI
    acquisition type via `data.adni.separate_data_adnitype`) used as the
    test set of every fold instead of the test fold — parity
    `kernel/train_eval_sgcn.py:138-157` (`isTestAdnitype`,
    `isShowValResult=False`).

    `export_bundle`: additionally write a self-contained serving bundle
    (`tools/serve.save_bundle`: config + GO topology + best-val params) per
    fold, for deployment hosts without the training data. Only for model
    families that carry a GO topology (the fused/SNP families).

    `resume`: skip folds whose `fold_result_*_fold_<k>.npz` already exists
    in `res_dir` (written atomically after each completed fold), so an
    interrupted k-fold experiment restarts at the first unfinished fold
    with identical final aggregates. New capability — the reference loses
    everything on a crash (its per-fold results live only in process
    memory until the end, `kernel/train_eval_sgcn_img_snps.py:440-470`).
    Saved folds are validated against (epochs, folds, seed, batch_size);
    mismatches are discarded loudly and retrained. Under `fold_parallel`
    all folds train in ONE program, so a partial set of saved folds
    retrains everything (only a fully-complete set is skippable).

    `warm_start`: optional `(params, batch_stats, tag)` — every fold starts
    from these externally trained collections instead of a fresh random
    init (optimizer state still starts fresh; the reference has no
    equivalent — its checkpoints are write-only). Used by
    `main.py --init_from_torch` with a converted reference checkpoint
    (`tools/import_torch`). `tag` (checkpoint name + content hash) enters
    the resume fingerprint so warm and fresh runs never mix records.

    `_injected`: private — `(parallel_out, prepped, parallel_dt)` from
    `cross_validation_permut_batch`, whose single seeds x folds SPMD
    program already trained this run's folds; training is skipped and the
    post-processing (metrics, artifacts, records, summaries) runs
    unchanged on the injected outputs."""
    use_val = not tcfg.no_val
    if clinical_score_index is None:
        # default to the config field — a separate kwarg default would let
        # TrainConfig(clinical_score_index=...) silently drift from what
        # imputation/score_names actually use
        clinical_score_index = tcfg.clinical_score_index
    if tcfg.fold_parallel and not tcfg.use_fold_scan:
        raise ValueError(
            "fold_parallel requires use_fold_scan: the fold axis is vmapped "
            "over whole-fold scan programs (the CLI rejects this combination "
            "too; silently falling back to sequential folds would contradict "
            "the config)")
    if model_kind not in MODEL_FAMILIES:
        raise ValueError(f"unknown model_kind {model_kind}; "
                         f"one of {sorted(MODEL_FAMILIES)}")
    build, takes_snps = MODEL_FAMILIES[model_kind]
    model = build(mcfg, topo)
    objective = OBJECTIVES[model_kind]
    b = tcfg.batch_size
    splits = k_fold(cohort.y, tcfg.folds, tcfg.seed)
    # injected runs (permut batch) never touch the cohort tensors — their
    # folds trained in the caller's SPMD program and `prepped` is injected;
    # skip the cohort-sized array assembly per replayed seed
    full = cohort_batch_arrays(cohort) if _injected is None else None
    ext_full = (cohort_batch_arrays(external_test)
                if external_test is not None else None)

    score_names = (SCORE_NAMES_DEFAULT if clinical_score_index == -1
                   else [SCORE_NAMES_ALL[clinical_score_index]])

    def init_state(fold, steps_per_epoch):
        return _init_fold_state(model, optimizer, takes_snps, mcfg, b,
                                tcfg.seed, fold, steps_per_epoch,
                                warm=(warm_start[:2] if warm_start is not None
                                      else None))

    def impute_fold(train_idx, test_idx, val_idx):
        return _impute_fold(cohort, external_test, use_val,
                            clinical_score_index, train_idx, test_idx,
                            val_idx)

    def fold_perms(fold, n_train, total_padded):
        return _fold_perms(tcfg.seed, tcfg.epochs, fold, n_train,
                           total_padded)

    def prep_fold(fold, train_idx, test_idx, val_idx):
        """Host-side data prep for one fold: leakage-safe imputation
        (parity util/tool.py:22-111), padded dense arrays, pre-drawn epoch
        permutations. All numpy — device placement happens at dispatch."""
        train_idx, tr_scores, val_scores, te_scores = impute_fold(
            train_idx, test_idx, val_idx)

        def fold_arrays(idx, clini):
            arrs = {k: v[idx] for k, v in full.items() if k != "sbj_id"}
            arrs["clini"] = clini
            return arrs

        train_data = pad_to_batches(fold_arrays(train_idx, tr_scores), b)
        if external_test is not None:
            ext_arrs = {k: v for k, v in ext_full.items() if k != "sbj_id"}
            ext_arrs["clini"] = te_scores
            test_data = pad_to_batches(ext_arrs, b)
            test_subids = ext_full["sbj_id"]
            n_test = len(external_test)
        else:
            test_data = pad_to_batches(fold_arrays(test_idx, te_scores), b)
            test_subids = full["sbj_id"][test_idx]
            n_test = len(test_idx)
        val_data = (pad_to_batches(fold_arrays(val_idx, val_scores), b)
                    if use_val else test_data)

        n_train = len(train_idx)
        perms = fold_perms(fold, n_train, train_data["y"].shape[0])

        def padded_idx(idx, data):
            total = data["y"].shape[0]
            return np.concatenate([idx, np.zeros(total - len(idx),
                                                 idx.dtype)]).astype(np.int32)

        gathers = dict(
            train=padded_idx(train_idx, train_data),
            val=(padded_idx(val_idx, val_data) if use_val else None),
            test=(None if external_test is not None
                  else padded_idx(test_idx, test_data)))
        return dict(train_data=train_data, val_data=val_data,
                    test_data=test_data, test_subids=test_subids,
                    n_train=n_train, n_test=n_test,
                    n_val=len(val_idx) if use_val else n_test, perms=perms,
                    gathers=gathers)

    dev_cache: Dict[str, Any] = {}
    _gather = jax.jit(gather_rows)

    def fold_to_device(p):
        """Place one fold's arrays on device. With `tcfg.device_gather` the
        cohort is uploaded ONCE and each fold's rows are gathered on device
        (one jitted dispatch, only the small clini/w vectors cross the
        host->device link); otherwise plain per-fold upload."""
        if not tcfg.device_gather:
            return (to_device(p["train_data"]), to_device(p["val_data"]),
                    to_device(p["test_data"]))
        if "full" not in dev_cache:
            dev_cache["full"] = to_device(
                {k: v for k, v in full.items() if k != "sbj_id"})
        fd = dev_cache["full"]

        def one(kind, data):
            idx = p["gathers"][kind]
            if idx is None:
                # external test cohort is not part of `full`; its clini is
                # re-imputed per fold, so upload (arrays are test-size small)
                return to_device(data)
            return _gather(fd, jnp.asarray(idx), jnp.asarray(data["clini"]),
                           jnp.asarray(data["w"]))

        train_dev = one("train", p["train_data"])
        test_dev = one("test", p["test_data"])
        val_dev = one("val", p["val_data"]) if use_val else test_dev
        return train_dev, val_dev, test_dev

    all_score_results = []
    test_losses: List[float] = []
    accs: List[float] = []
    durations: List[float] = []
    best_hidden, best_subids, best_linear = [], [], []
    best_true_scores, best_true_labels, best_pred_scores = [], [], []
    fold_graphs: List[int] = []
    fold_cold: List[bool] = []      # fold triggered a fresh XLA compile
    seen_shapes: set = set()
    optimizer = None
    train_epoch = eval_epoch = None
    fold_runner = None
    prepped = None
    parallel_out = None
    parallel_dt = 0.0

    def fold_result_path(fold: int) -> str:
        return os.path.join(
            res_dir, f"fold_result_{result_file_name}_fold_{fold}.npz")

    # resume: load completed folds (validated against the run config)
    done_folds: Dict[int, Dict[str, np.ndarray]] = {}
    # the guard covers every config axis that changes the saved surface but
    # not the record FILENAME (the tag already encodes layers/hidden/h):
    # the explicit ints give a readable mismatch message; the fingerprint
    # covers everything else — model family, lr, loss/sparsity weights,
    # temperature, clinical_score_index (a review pass found the old
    # int-only meta silently mixed guide-trained folds into a gcn run).
    # Execution-strategy knobs whose results are identical (fold_scan /
    # fold_parallel / device_gather / dual_pass_vmap / scan_unroll) are
    # excluded so a resume may switch them.
    run_identity = dataclasses.asdict(tcfg)
    for _k in ("use_fold_scan", "fold_parallel", "device_gather",
               "dual_pass_vmap", "scan_unroll"):
        run_identity.pop(_k)
    if warm_start is not None:
        # warm-started folds are a different run identity than fresh-init
        # ones; the tag (checkpoint name + content hash) keeps resumes from
        # mixing the two
        run_identity["warm_start"] = str(warm_start[2])
    want_meta = np.asarray(
        [tcfg.epochs, tcfg.folds, tcfg.seed, tcfg.batch_size,
         int(tcfg.no_val), int(tcfg.is_permut_test),
         int(external_test is not None),
         config_fingerprint(model_kind=model_kind, mcfg=mcfg,
                            **run_identity)], np.int64)
    if resume and res_dir is not None:
        for f in range(tcfg.folds):
            path = fold_result_path(f)
            if not os.path.exists(path):
                continue
            try:
                with np.load(path) as zf:
                    if not np.array_equal(zf["meta"], want_meta):
                        print(f"[resume] {path} was written by a different "
                              f"config (meta {zf['meta'].tolist()} vs "
                              f"{want_meta.tolist()}); retraining fold {f}")
                        continue
                    done_folds[f] = {k: zf[k] for k in zf.files}
            except Exception as e:
                print(f"[resume] ignoring unreadable {path} ({e}); "
                      f"retraining fold {f}")
        if done_folds and tcfg.fold_parallel and len(done_folds) < tcfg.folds:
            print(f"[resume] fold_parallel trains all folds in one program; "
                  f"{len(done_folds)}/{tcfg.folds} saved folds is not a "
                  "complete set — retraining everything (drop "
                  "--fold_parallel to resume fold-by-fold)")
            done_folds = {}

    if _injected is not None:
        parallel_out, prepped, parallel_dt = _injected
    elif (tcfg.fold_parallel and tcfg.use_fold_scan
            and len(done_folds) < tcfg.folds):
        # ---- all folds in ONE sharded device program --------------------
        optimizer = make_optimizer(tcfg)
        fold_runner = make_fold_runner(
            model, mcfg, tcfg, optimizer, objective,
            track_best_on="val" if use_val else "test")
        if external_test is None and tcfg.device_gather:
            # Device-side fold assembly (r3): on this host a fresh page
            # costs ~0.1 s/MB (slow first-touch faults), so materializing
            # every fold's padded (S, 90, 90) arrays host-side dominated
            # prep. Instead the cohort is uploaded ONCE and each fold's
            # rows are gathered/padded ON DEVICE, already laid out with the
            # (fold, data) mesh sharding; only tiny index/clini/w arrays
            # are built on host. Padding rows carry row-0 content under
            # w=0 (same contract as the sequential device_gather path).
            # (Bodies shared with `cross_validation_permut_batch`, which
            # runs the same assembly over a seeds x folds entry axis.)
            host = _fold_parallel_gather_host(
                cohort, full, splits, tcfg, use_val, clinical_score_index)
            real_spes = host["real_spes"]
            perms_list = host["perms_list"]
            mesh = fold_mesh(tcfg.folds)
            trains, vals, tests = _fold_parallel_gather_device(
                full, host["kinds"], mesh, use_val)
            prepped = _fold_parallel_prepped_shims(full, host)
        else:
            mesh = None
            prepped = [prep_fold(f, *split) for f, split in enumerate(splits)]
            # each fold's REAL steps/epoch, before cross-fold equalization —
            # drives that fold's LR decay inside the vmapped program
            real_spes = [p["train_data"]["y"].shape[0] // b for p in prepped]
            # equalize shapes across folds (zero-weight padding)
            trains = pad_fold_data([p["train_data"] for p in prepped])
            tests = pad_fold_data([p["test_data"] for p in prepped])
            # no-val mode: prep_fold aliases val_data=test_data per fold;
            # alias the stacked copy too instead of re-stacking ~test-split
            # bytes the runner never reads
            vals = (pad_fold_data([p["val_data"] for p in prepped])
                    if use_val else tests)
            target = trains[0]["y"].shape[0]
            perms_list = [extend_perms(p["perms"], target) for p in prepped]
            for p, tr, va, te, pe in zip(prepped, trains, vals, tests,
                                         perms_list):
                p["train_data"], p["val_data"], p["test_data"] = tr, va, te
                p["perms"] = pe
        states, rngs = zip(*(init_state(f, real_spes[f])
                             for f in range(tcfg.folds)))
        *parallel_out, parallel_dt = run_folds_parallel(
            fold_runner, states, trains, vals, tests, perms_list, rngs,
            mesh=mesh)
        parallel_out = tuple(parallel_out)

    for fold, (train_idx, test_idx, val_idx) in enumerate(splits):
        if fold in done_folds:
            d = done_folds[fold]
            test_losses.extend(d["test_losses"].tolist())
            accs.extend(d["accs"].tolist())
            all_score_results.append(d["score_result_epoch"])
            for dst, key in ((best_hidden, "hidden"),
                             (best_subids, "subid"),
                             (best_linear, "linear"),
                             (best_true_scores, "true_scores"),
                             (best_true_labels, "true_labels"),
                             (best_pred_scores, "pred_scores")):
                dst.append(d[key])
            # nothing trained: excluded from steady-state throughput
            durations.append(0.0)
            fold_graphs.append(0)
            fold_cold.append(True)
            msg = (f"[resume] fold {fold} restored from "
                   f"{fold_result_path(fold)} (training skipped)")
            if verbose:
                print(msg)
            if logger is not None:
                logger(msg)
            continue
        p = prepped[fold] if prepped is not None else prep_fold(
            fold, train_idx, test_idx, val_idx)
        n_train, n_test, n_val = p["n_train"], p["n_test"], p["n_val"]
        test_subids = p["test_subids"]

        fold_spe = p["train_data"]["y"].shape[0] // b
        # parallel_out set (fold-parallel or injected): folds already
        # trained in one program — the sequential runner is never called
        if optimizer is None and parallel_out is None:
            optimizer = make_optimizer(tcfg)
            if tcfg.use_fold_scan:
                fold_runner = make_fold_runner(
                    model, mcfg, tcfg, optimizer, objective,
                    track_best_on="val" if use_val else "test")
            else:
                train_epoch, eval_epoch = _epoch_fns(model, mcfg, tcfg,
                                                     optimizer, objective)

        t_start = time.perf_counter()
        best_loss = np.inf
        best_bundle = None
        score_result_epoch = []
        fold_test_losses, fold_accs = [], []
        wmask = np.asarray(p["test_data"]["w"]) > 0
        y_true = np.asarray(p["test_data"]["y"])[wmask]
        clini_true = np.asarray(p["test_data"]["clini"])[wmask]
        zeros = np.zeros((int(wmask.sum()), 1), np.float32)

        def epoch_metrics(fold, epoch, train_loss, val_loss, test_loss,
                          log_probs_e, pred_e, reg_pred, has_regr):
            cm = metrics.classification_metrics(
                y_true, pred_e, log_probs_e[:, 1] if log_probs_e.shape[1] > 1
                else log_probs_e[:, 0], cohort.num_classes)
            corr, r2s, mses = metrics.regression_metrics(clini_true, reg_pred)
            fold_test_losses.append(test_loss)
            fold_accs.append(cm["acc"])
            score_result_epoch.append([cm["acc"], cm["auc"], cm["f1"],
                                       cm["sen"], cm["spe"]])
            if verbose:
                msg = (f"Fold: {fold}, epoch:{epoch}, train_loss: {train_loss:.4f},"
                       f" val_loss: {val_loss:.4f}, test_loss: {test_loss:.4f},"
                       f" acc: {cm['acc']:.4f}, auc: {cm['auc']:.4f}")
                if has_regr:
                    for i, nm in enumerate(score_names):
                        msg += (f"; {nm} corr: {corr[i]:.5f}, r2: {r2s[i]:.5f},"
                                f" mse: {mses[i]:.5f}")
                print(msg)
                if logger is not None:
                    logger(msg)

        if tcfg.use_fold_scan:
            if parallel_out is not None:
                per_epoch_all, best_all, states_all = parallel_out
                per_epoch = index_tree(per_epoch_all, fold)
                best = index_tree(best_all, fold)
                state = index_tree(states_all, fold)
            else:
                # one device dispatch for the entire fold (fold_scan.py);
                # pass rng whole: fold_fn splits once per epoch, mirroring
                # the python path's per-epoch split — identical streams.
                state, rng = init_state(fold, fold_spe)
                train_dev, val_dev, test_dev = fold_to_device(p)
                per_epoch, best, state = fold_runner(
                    state, train_dev, val_dev, test_dev,
                    jnp.asarray(p["perms"]), rng)
                # overlapped fetch (utils/fetch.py): per_epoch + best are
                # ~100 leaves; leaf-by-leaf device_get pays a tunnel round
                # trip per leaf
                per_epoch, best = device_get_tree((per_epoch, best))
            has_regr = "our_reg" in per_epoch
            for e in range(tcfg.epochs):
                reg_pred = (per_epoch["our_reg"][e][wmask] if has_regr
                            else np.zeros_like(clini_true))
                epoch_metrics(
                    fold, e + 1,
                    float(per_epoch["train_loss_sum"][e]) / n_train,
                    float(per_epoch["val_loss_sum"][e]) / n_val,
                    float(per_epoch["test_loss_sum"][e]) / n_test,
                    per_epoch["log_probs"][e][wmask],
                    per_epoch["pred"][e][wmask], reg_pred, has_regr)
            if tcfg.is_permut_test:
                # parity `:176-185`: permutation test keeps the LAST epoch
                best_test = {k: v[-1] for k, v in per_epoch.items()
                             if k not in ("train_loss_sum", "val_loss_sum",
                                          "test_loss_sum")}
                best_params, best_stats = device_get_tree(
                    (state.params, state.batch_stats))
            else:
                best_test, best_params, best_stats = device_get_tree(
                    (best["test"], best["params"], best["batch_stats"]))
            best_bundle = {
                "hidden": (best_test["out_lin"][wmask]
                           if "out_lin" in best_test else zeros),
                "linear": (best_test["linear_outf"][wmask]
                           if "linear_outf" in best_test else zeros),
                "subid": test_subids,
                "true_scores": clini_true,
                "true_labels": y_true,
                "pred_scores": (best_test["our_reg"][wmask] if has_regr
                                else np.zeros_like(clini_true)),
                "params": best_params,
                "batch_stats": best_stats,
            }
            if res_dir is not None and not tcfg.is_permut_test:
                save_checkpoint(
                    f"{res_dir}/gcn_state_dict_{result_file_name}_fold_{fold}.msgpack",
                    best_params, best_stats)
        else:
          state, rng = init_state(fold, fold_spe)
          train_data, val_data, test_data = fold_to_device(p)
          for epoch in range(1, tcfg.epochs + 1):
            perm = p["perms"][epoch - 1]
            rng, erng = jax.random.split(rng)
            state, train_loss_sum = train_epoch(state, train_data,
                                                jnp.asarray(perm), erng)
            train_loss = float(train_loss_sum) / n_train

            test_out = eval_epoch(state.params, state.batch_stats, test_data)
            test_loss = float(test_out["loss_sum"]) / n_test
            if use_val:
                val_out = eval_epoch(state.params, state.batch_stats, val_data)
                val_loss = float(val_out["loss_sum"]) / n_val
            else:
                val_loss = test_loss

            log_probs = np.asarray(test_out["log_probs"])[wmask]
            y_pred = np.asarray(test_out["pred"])[wmask]
            has_regr = "our_reg" in test_out
            if has_regr:
                reg_pred = np.asarray(test_out["our_reg"])[wmask]
            else:
                reg_pred = np.zeros_like(clini_true)
            epoch_metrics(fold, epoch, train_loss, val_loss, test_loss,
                          log_probs, y_pred, reg_pred, has_regr)

            track_loss = val_loss if use_val else test_loss
            # `best_bundle is None` keeps epoch 1 when every loss is NaN
            # (divergent run): the fold still contributes artifacts, same
            # fallback the fold-scan path has (fold_scan.py init bundle)
            if (best_bundle is None or track_loss < best_loss
                    or (tcfg.is_permut_test and epoch == tcfg.epochs)):
                best_loss = min(best_loss, track_loss)
                best_bundle = {
                    "hidden": (np.asarray(test_out["out_lin"])[wmask]
                               if "out_lin" in test_out else zeros),
                    "linear": (np.asarray(test_out["linear_outf"])[wmask]
                               if "linear_outf" in test_out else zeros),
                    "subid": test_subids,
                    "true_scores": clini_true,
                    "true_labels": y_true,
                    "pred_scores": reg_pred,
                    "params": device_get_tree(state.params),
                    "batch_stats": device_get_tree(state.batch_stats),
                }
                if res_dir is not None and not tcfg.is_permut_test:
                    save_checkpoint(
                        f"{res_dir}/gcn_state_dict_{result_file_name}_fold_{fold}.msgpack",
                        state.params, state.batch_stats)

        durations.append(parallel_dt / tcfg.folds if parallel_out is not None
                         else time.perf_counter() - t_start)
        fold_graphs.append(n_train * tcfg.epochs)
        # a fold with data shapes unseen so far compiles a fresh program
        shape_key = tuple(p[k]["y"].shape[0]
                          for k in ("train_data", "val_data", "test_data"))
        fold_cold.append(parallel_out is None and shape_key not in seen_shapes)
        seen_shapes.add(shape_key)
        test_losses.extend(fold_test_losses)
        accs.extend(fold_accs)
        all_score_results.append(score_result_epoch)

        # Parity quirk, matched deliberately: for GCN_IMGSNP the reference
        # model registers prob/prob_bias/snps_prob it never uses
        # (kernel/gcn_img_snp.py:92-101 — no cal_probability call) yet its
        # trainer still exports them (train_eval_gcn_img_snps.py:314), so
        # that family's importance npys hold UNTRAINED init values there and
        # here. The trained-importance guarantees live with the families
        # that optimize them (tests/test_interpretability.py).
        if res_dir is not None and "prob" in state.params:
            pr = device_get_tree(state.params)
            artifacts.output_importance(
                res_dir, result_file_name, fold, np.asarray(pr["prob"]),
                (np.asarray(pr["snps_prob"]) if "snps_prob" in pr else None),
                np.asarray(pr["prob_bias"]),
                is_permut_test=tcfg.is_permut_test)
        elif res_dir is not None and "bias_n" in state.params:
            # guide family: its interpretability tensor is the Gumbel mask
            # logits (see artifacts.output_mask_importance for why the
            # reference has no working equivalent of this export)
            artifacts.output_mask_importance(
                res_dir, result_file_name, fold,
                np.asarray(jax.device_get(state.params["bias_n"])),
                is_permut_test=tcfg.is_permut_test)

        if (export_bundle and best_bundle is not None and res_dir is not None
                and not tcfg.is_permut_test
                and getattr(model, "topo", None) is not None):
            # one bundle write per fold, from the best-val params both code
            # paths stash in best_bundle (a per-improvement write would
            # re-serialize the invariant GO topology arrays every epoch)
            from iggcn_tpu.tools.serve import save_bundle
            save_bundle(
                f"{res_dir}/serving_bundle_{result_file_name}_fold_{fold}.npz",
                model, best_bundle["params"], best_bundle["batch_stats"])

        if best_bundle is not None:
            best_hidden.append(best_bundle["hidden"])
            best_subids.append(best_bundle["subid"])
            best_linear.append(best_bundle["linear"])
            best_true_scores.append(best_bundle["true_scores"])
            best_true_labels.append(best_bundle["true_labels"])
            best_pred_scores.append(best_bundle["pred_scores"])
            if res_dir is not None:
                # atomic per-fold result record: everything the final
                # aggregation needs, so `resume=True` can skip this fold
                # after an interruption (params live in the checkpoint
                # written above; this stays small)
                path = fold_result_path(fold)
                tmp = path + ".tmp.npz"   # savez appends .npz when absent
                np.savez(
                    tmp,
                    score_result_epoch=np.asarray(score_result_epoch,
                                                  np.float64),
                    test_losses=np.asarray(fold_test_losses, np.float64),
                    accs=np.asarray(fold_accs, np.float64),
                    hidden=best_bundle["hidden"],
                    linear=best_bundle["linear"],
                    subid=best_bundle["subid"],
                    true_scores=best_bundle["true_scores"],
                    true_labels=best_bundle["true_labels"],
                    pred_scores=best_bundle["pred_scores"],
                    score_names=np.asarray(score_names),
                    meta=want_meta)
                os.replace(tmp, path)

    # aggregate (parity :209-213: max over epochs of fold-mean accuracy)
    loss_arr = np.asarray(test_losses).reshape(tcfg.folds, tcfg.epochs)
    acc_arr = np.asarray(accs).reshape(tcfg.folds, tcfg.epochs)
    acc_mean = acc_arr.mean(axis=0)
    argmax = int(acc_mean.argmax())
    score_result = np.asarray(all_score_results)

    if res_dir is not None:
        ipt = tcfg.is_permut_test
        artifacts.output_npy(f"{res_dir}/{result_file_name}.npy", score_result,
                             is_permut_test=ipt)
        artifacts.output_npy(f"{res_dir}/hidden_{result_file_name}.npy",
                             np.concatenate(best_hidden), is_permut_test=ipt)
        artifacts.output_npy(f"{res_dir}/subids_{result_file_name}.npy",
                             np.concatenate(best_subids), is_permut_test=ipt)
        artifacts.output_npy(f"{res_dir}/linear_out_{result_file_name}.npy",
                             np.concatenate(best_linear), is_permut_test=ipt)

    # pooled regression metrics over best epochs (parity :440-464)
    ts = np.concatenate(best_true_scores)
    ps = np.concatenate(best_pred_scores)
    tl = np.concatenate(best_true_labels)
    corr, r2s, mses = metrics.regression_metrics(ts, ps)
    regression_summary = {nm: {"corr": corr[i], "r2": r2s[i], "rmse": mses[i]}
                          for i, nm in enumerate(score_names)}
    if res_dir is not None:
        artifacts.output_regression(res_dir, result_file_name, score_names,
                                    ts, tl, ps, is_permut_test=tcfg.is_permut_test)
        for nm, vals in regression_summary.items():
            msg = (f"Regression for all clinical score {nm}: correlation:"
                   f" {vals['corr']:.5f}, r2: {vals['r2']:.5f}, mse:"
                   f" {vals['rmse']:.5f}")
            print(msg)
            if logger is not None:
                logger(msg)

    # steady-state throughput: exclude folds whose data shapes forced a
    # fresh XLA compile (the fold-parallel path already measures execution
    # only — its program is AOT-compiled inside run_folds_parallel)
    warm = [(g, d) for g, d, cold in zip(fold_graphs, durations, fold_cold)
            if not cold]
    if not warm:
        warm = list(zip(fold_graphs, durations))
    throughput = (sum(g for g, _ in warm)
                  / max(sum(d for _, d in warm), 1e-9))
    return CVResult(
        mean_test_loss=float(loss_arr.mean()),
        best_acc=float(acc_mean[argmax]),
        best_acc_std=float(acc_arr[:, argmax].std(ddof=1)
                           if acc_arr.shape[0] > 1 else 0.0),
        score_result=score_result, durations=durations,
        throughput_graphs_per_sec=float(throughput),
        regression_summary=regression_summary)


def cross_validation_seed_batch(cohort: AdniCohort, seeds, topo,
                                mcfg: ModelConfig, tcfg: TrainConfig, *,
                                res_dirs,
                                result_file_name: str = "result",
                                clinical_score_index: Optional[int] = None,
                                loggers=None,
                                model_kind: str = "sgcn_imgsnp",
                                export_bundle: bool = False,
                                verbose: bool = True) -> List[CVResult]:
    """Replicate the SAME experiment across N CV seeds as one SPMD program.

    The replication question a reviewer always asks — "is the result robust
    to the analysis seed?" — costs the reference N full processes. Here each
    seed changes only the stratified splits, the per-fold imputation, the
    parameter inits and the epoch shuffling (the cohort tensors are
    seed-invariant), and StratifiedKFold's per-fold-index sizes depend only
    on the label multiset and k, NOT on the shuffle seed — so all
    seeds x folds entries share one device cohort and identical shapes, and
    the whole grid trains as ONE `fold_mesh(S*k)` program, exactly like the
    permutation-null batch (`cross_validation_permut_batch`) but with
    per-seed splits/perms/inits instead of per-seed score pairings.

    Each entry's outputs match a standalone fold-parallel run with
    `tcfg.seed = s` on the same cohort — bit-for-bit on one device;
    ~1-ulp float reduction-order drift when `fold_mesh(S*k)` and
    `fold_mesh(k)` factorize (fold, data) differently (same tolerance story
    as the permutation batch, pinned in tests/test_seed_batch.py).
    """
    if not (tcfg.fold_parallel and tcfg.use_fold_scan):
        raise ValueError("cross_validation_seed_batch requires "
                         "fold_parallel + use_fold_scan")
    if not tcfg.device_gather:
        raise ValueError("cross_validation_seed_batch requires "
                         "device_gather (the batched fold assembly)")
    if tcfg.is_permut_test:
        raise ValueError("seed replication shuffles nothing; combine with "
                         "--permut_seeds (per-seed null batch) instead of "
                         "is_permut_test")
    if clinical_score_index is None:
        clinical_score_index = tcfg.clinical_score_index
    seeds = list(seeds)
    n_seeds = len(seeds)
    if len(res_dirs) != n_seeds:
        raise ValueError("one res_dir per seed required")
    use_val = not tcfg.no_val

    build, takes_snps = MODEL_FAMILIES[model_kind]
    model = build(mcfg, topo)
    objective = OBJECTIVES[model_kind]
    k = tcfg.folds
    tcfgs = [dataclasses.replace(tcfg, seed=s) for s in seeds]
    splits_by_seed = [k_fold(cohort.y, k, s) for s in seeds]
    full = cohort_batch_arrays(cohort)

    # per-seed host prep: per-seed splits -> per-seed imputation, gather
    # indices and epoch-permutation streams (deterministic in the seed)
    hosts = [_fold_parallel_gather_host(cohort, full, sp, tc, use_val,
                                        clinical_score_index)
             for sp, tc in zip(splits_by_seed, tcfgs)]
    if any(h["targets"] != hosts[0]["targets"] for h in hosts[1:]):
        # cannot happen for StratifiedKFold (sizes are seed-invariant);
        # guard loudly rather than train misaligned stacked shapes
        raise AssertionError(
            "seed-batch entries disagree on padded fold sizes "
            f"({[h['targets'] for h in hosts]}); splits must be "
            "size-invariant across seeds")
    kinds = {}
    for kind in hosts[0]["kinds"]:
        parts = zip(*[h["kinds"][kind] for h in hosts])
        kinds[kind] = tuple(np.concatenate(p, axis=0) for p in parts)

    mesh = fold_mesh(n_seeds * k)
    trains, vals, tests = _fold_parallel_gather_device(full, kinds, mesh,
                                                       use_val)

    optimizer = make_optimizer(tcfg)
    fold_runner = make_fold_runner(
        model, mcfg, tcfg, optimizer, objective,
        track_best_on="val" if use_val else "test")
    # per-entry inits: deterministic in (seed, fold) — each entry draws
    # exactly what its standalone run would
    states, rngs = [], []
    for s, h in enumerate(hosts):
        for f in range(k):
            st, r = _init_fold_state(model, optimizer, takes_snps, mcfg,
                                     tcfg.batch_size, seeds[s], f,
                                     h["real_spes"][f])
            states.append(st)
            rngs.append(r)
    perms_list = [p for h in hosts for p in h["perms_list"]]

    *parallel_out, parallel_dt = run_folds_parallel(
        fold_runner, states, trains, vals, tests, perms_list, rngs,
        mesh=mesh)
    parallel_out = tuple(parallel_out)

    results = []
    for s, seed in enumerate(seeds):
        sl = jax.tree_util.tree_map(lambda x: x[s * k:(s + 1) * k],
                                    parallel_out)
        results.append(cross_validation(
            cohort, topo, mcfg, tcfgs[s], res_dir=res_dirs[s],
            result_file_name=result_file_name,
            clinical_score_index=clinical_score_index,
            logger=(loggers[s] if loggers is not None else None),
            model_kind=model_kind, verbose=verbose,
            export_bundle=export_bundle,
            _injected=(sl, _fold_parallel_prepped_shims(full, hosts[s]),
                       parallel_dt / n_seeds)))
    return results


def cross_validation_permut_batch(variants, topo, mcfg: ModelConfig,
                                  tcfg: TrainConfig, *,
                                  res_dirs,
                                  result_file_name: str = "result",
                                  clinical_score_index: Optional[int] = None,
                                  loggers=None,
                                  model_kind: str = "sgcn_imgsnp",
                                  verbose: bool = True) -> List[CVResult]:
    """Train an ENTIRE permutation null distribution as one SPMD program.

    `variants` is a list of (seed_label, cohort) pairs — the same subjects
    with per-seed shuffled subject->score pairings (the only thing the
    permutation test changes, `sgcn_data.py:205-208`). Since labels, fold
    splits, shapes and every non-score tensor are identical across seeds,
    the seeds x folds grid is embarrassingly parallel with ONE shared
    device cohort: this stacks all S*k fold entries (only the tiny imputed
    clini vectors differ per seed), runs `run_folds_parallel` once over a
    `fold_mesh(S*k)` — vmapped on one chip, sharded across a mesh on many —
    and then replays each seed's post-processing (metrics, fold records,
    log lines, aggregates) through `cross_validation`'s own loop via its
    `_injected` hook. Per-seed artifacts match a standalone fold-parallel
    `--isPermutTest --Seed4PermutTest <s>` run bit-for-bit on a single
    device (1-D mesh either way); on a multi-device mesh, `fold_mesh(S*k)`
    vs `fold_mesh(k)` may factorize (fold, data) differently, shifting
    float reduction order by ~1 ulp (pinned in
    tests/test_permut_batch_parallel.py).

    Requires `tcfg.fold_parallel` + `use_fold_scan` + `is_permut_test` and
    the device-gather assembly (the batched path IS the device-gather
    path). HBM scales with S*k gathered fold copies — at ADNI scale
    (~874 subjects, 5 folds) roughly 0.12 GB per seed.
    """
    if not (tcfg.fold_parallel and tcfg.use_fold_scan):
        raise ValueError("cross_validation_permut_batch requires "
                         "fold_parallel + use_fold_scan")
    if not tcfg.is_permut_test:
        raise ValueError("cross_validation_permut_batch is the permutation-"
                         "null batch; tcfg.is_permut_test must be True")
    if not tcfg.device_gather:
        raise ValueError("cross_validation_permut_batch requires "
                         "device_gather (the batched fold assembly)")
    if clinical_score_index is None:
        clinical_score_index = tcfg.clinical_score_index
    use_val = not tcfg.no_val
    cohorts = [c for _, c in variants]
    n_seeds = len(cohorts)
    if len(res_dirs) != n_seeds:
        raise ValueError("one res_dir per variant required")
    base = cohorts[0]
    # the batch shares ONE device cohort: variants must differ only in the
    # subject->score pairing (clini_score/demographics); anything else
    # differing would silently train seed 0's tensors for every seed
    for label, c in variants[1:]:
        for fname in ("x", "adj", "snps", "y", "clust_y", "tsne_fdim"):
            if not np.array_equal(np.asarray(getattr(base, fname)),
                                  np.asarray(getattr(c, fname))):
                raise ValueError(
                    f"permut-batch variant {label!r} disagrees with the "
                    f"first variant on cohort field {fname!r}; only the "
                    "subject->score pairing may differ across seeds")

    build, takes_snps = MODEL_FAMILIES[model_kind]
    model = build(mcfg, topo)
    objective = OBJECTIVES[model_kind]
    k = tcfg.folds
    splits = k_fold(base.y, k, tcfg.seed)
    full = cohort_batch_arrays(base)

    # per-seed host prep: identical geometry (same splits/sizes — targets
    # and perms derive from the shared `splits` alone, so the epoch
    # permutation streams are computed once and shared), per-seed imputed
    # clini vectors
    hosts = [_fold_parallel_gather_host(base, full, splits, tcfg, use_val,
                                        clinical_score_index)]
    hosts += [_fold_parallel_gather_host(c, full, splits, tcfg, use_val,
                                         clinical_score_index,
                                         shared_perms=hosts[0]["perms_list"])
              for c in cohorts[1:]]
    kinds = {}
    for kind in hosts[0]["kinds"]:
        parts = zip(*[h["kinds"][kind] for h in hosts])
        kinds[kind] = tuple(np.concatenate(p, axis=0) for p in parts)

    mesh = fold_mesh(n_seeds * k)
    trains, vals, tests = _fold_parallel_gather_device(full, kinds, mesh,
                                                       use_val)

    optimizer = make_optimizer(tcfg)
    fold_runner = make_fold_runner(
        model, mcfg, tcfg, optimizer, objective,
        track_best_on="val" if use_val else "test")
    # per-fold inits are deterministic in (tcfg.seed, fold) — identical
    # across permutation seeds, exactly as standalone runs would draw them;
    # run_folds_parallel's jitted stack copies, so repeating the references
    # per seed is safe under buffer donation
    per_fold = [_init_fold_state(model, optimizer, takes_snps, mcfg,
                                 tcfg.batch_size, tcfg.seed, f,
                                 hosts[0]["real_spes"][f])
                for f in range(k)]
    states = [st for _ in range(n_seeds) for st, _ in per_fold]
    rngs = [r for _ in range(n_seeds) for _, r in per_fold]
    perms_list = [p for h in hosts for p in h["perms_list"]]

    *parallel_out, parallel_dt = run_folds_parallel(
        fold_runner, states, trains, vals, tests, perms_list, rngs,
        mesh=mesh)
    parallel_out = tuple(parallel_out)

    results = []
    for s, (label, cohort_s) in enumerate(variants):
        sl = jax.tree_util.tree_map(lambda x: x[s * k:(s + 1) * k],
                                    parallel_out)
        results.append(cross_validation(
            cohort_s, topo, mcfg, tcfg, res_dir=res_dirs[s],
            result_file_name=result_file_name,
            clinical_score_index=clinical_score_index,
            logger=(loggers[s] if loggers is not None else None),
            model_kind=model_kind, verbose=verbose,
            _injected=(sl, _fold_parallel_prepped_shims(full, hosts[s]),
                       parallel_dt / n_seeds)))
    return results
