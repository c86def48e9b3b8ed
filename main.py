"""Experiment driver CLI (flag-parity with the reference `main.py:35-113`).

Runs the fused SGCN x GO cross-validation experiment over a hyperparameter
sweep; falls back to a synthetic ADNI-shaped cohort when the real data
directory is absent (pass --synthetic to force it).
"""
import argparse
import dataclasses
import os
import shlex
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native GNN for ADNI graphs")
    p.add_argument("--model", type=str, default="SGCN_GCN_IMGSNP",
                   help="model family by reference name (see the routing "
                        "tables in docs/cli.md; unknown names abort with "
                        "the full list)")
    p.add_argument("--isTestAdnitype", action="store_true", default=False,
                   help="train on CV folds, test on a held-out ADNI type")
    p.add_argument("--adnitype_id", type=int, default=0,
                   help="ADNI study-phase id held out as the external test "
                        "cohort under --isTestAdnitype")
    p.add_argument("--disease_id4Adnitype", type=int, default=0,
                   help="disease task filtering the TRAIN side of the "
                        "held-out-type split (labels binarized)")
    p.add_argument("--knn", type=int, default=5,
                   help="k of the preprocessed kNN layout: mats are read "
                        "under <data_path>/knn/<k>/")
    p.add_argument("--no_val", action="store_true", default=False,
                   help="train/test folds only (no validation split; "
                        "model selection falls back to max-over-epochs)")
    # reference quirk fixed deliberately: these were store_true with
    # default=True upstream (unreachable False); BooleanOptionalAction makes
    # --no-isPPr / --no-isTopK / ... reachable (heat-kernel diffusion,
    # cluster-mode consistency, no-prob4regr variants).
    p.add_argument("--isPPr", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="PPR graph-diffusion pre-transform "
                        "(--no-isPPr switches to the heat kernel)")
    p.add_argument("--isTopK", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="sparsify the diffused adjacency by per-row top-k "
                        "(--no-isTopK uses the epsilon threshold)")
    p.add_argument("--top_k", type=int, default=3,
                   help="k for the diffusion top-k sparsifier")
    p.add_argument("--disease_id", type=int, default=3,
                   help="diagnosis task over raw labels {HC,SMC,EMCI,LMCI,"
                        "AD}: 0=HC-vs-AD, 1=HC-vs-prodromal, 2=MCI-vs-AD "
                        "(binary), 3=HC/prodromal/AD 3-class")
    p.add_argument("--isCrossAtten", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="cross-modal multihead attention between the "
                        "imaging and GO branches in the fused models")
    p.add_argument("--use_pallas_gcn", action="store_true", default=False,
                   help="run the imaging GCN stack as a fused Pallas kernel")
    p.add_argument("--go_attention_impl", type=str, default="auto",
                   choices=("auto", "dense", "edge"),
                   help="GO-branch edge-attention aggregation: 'dense' "
                        "masked (n, n) matmuls, 'edge' gathered edge-list "
                        "scores, or 'auto' per traced batch size (crossover "
                        "at batch 64, attested by the bench attention_ab "
                        "leg)")
    p.add_argument("--no_fold_scan", action="store_true", default=False,
                   help="debug: per-epoch dispatch instead of whole-fold scan")
    p.add_argument("--fold_parallel", action="store_true", default=False,
                   help="run all CV folds at once, sharded over the device mesh")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of the experiment here "
                        "(view with TensorBoard / xprof)")
    p.add_argument("--export_bundle", action="store_true", default=False,
                   help="also write a self-contained serving bundle per fold "
                        "(config+topology+params; serve with "
                        "iggcn_tpu.tools.serve)")
    p.add_argument("--init_from_torch", type=str, default="",
                   help="warm-start every fold of a fused-family experiment "
                        "from a reference-trained torch checkpoint "
                        "(gcn_state_dict_*.pt, converted in-process by "
                        "iggcn_tpu.tools.import_torch; architecture must "
                        "match the run's --layers/--hiddens). Optimizer "
                        "state and data splits stay fresh")
    p.add_argument("--isSoftSimilarity", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="soft RBF subject-similarity consistency loss on "
                        "the embedding; --no-isSoftSimilarity uses hard "
                        "per-cluster membership consistency instead")
    p.add_argument("--isMultilModal4Similarity", action="store_true",
                   default=False,
                   help="use the precomputed multimodal similarity features "
                        "(multimodal_for_similarity.npy) instead of the PET "
                        "features")
    p.add_argument("--rbf_gamma", type=float, default=0.01,
                   help="RBF bandwidth of the subject-similarity weights")
    p.add_argument("--clinical_score_index", type=int, default=-1,
                   help="regress ONE clinical score by index (forces "
                        "--num_regr 1); -1 regresses all three")
    p.add_argument("--num_regr", type=int, default=None,
                   help="number of clinical-score regression targets "
                        "(default 3; must be 1 when --clinical_score_index "
                        "selects a single score)")
    p.add_argument("--model4eachregr", action="store_true", default=False,
                   help="one regression head per clinical score instead of "
                        "a shared multi-output head")
    p.add_argument("--isPermutTest", action="store_true", default=False,
                   help="permutation-test control: shuffle the subject-to-"
                        "score pairing (seed --Seed4PermutTest); results go "
                        "to results_permuttest/ and importance npys are "
                        "suppressed")
    p.add_argument("--permut_seeds", type=str, default=None,
                   help="run a BATCH of permutation-test null experiments "
                        "in one process (amortizes the per-process jax "
                        "init + compile + cohort build across the null "
                        "distribution): a comma list '1,2,3' or an "
                        "inclusive range '1:100'; implies --isPermutTest; "
                        "each seed writes its own dir "
                        "results_permuttest/ADNI<appendix>_permut<seed>, "
                        "aggregate with iggcn-report --permut_null. With "
                        "--fold_parallel (fused families) the whole "
                        "seeds x folds grid trains as ONE SPMD device "
                        "program sharded over the mesh (chunked per "
                        "--spmd_batch_entries)")
    p.add_argument("--cv_seeds", type=str, default=None,
                   help="REPLICATE the experiment across N CV seeds on one "
                        "fixed cohort (the robustness-to-analysis-seed "
                        "check; each seed redraws the stratified splits, "
                        "per-fold imputation, parameter inits and epoch "
                        "shuffling): a comma list '1,2,3' or an inclusive "
                        "range '1:5'; each seed writes its own dir "
                        "results/ADNI<appendix>_seed<seed> and an "
                        "across-seed mean +/- std summary is printed. "
                        "Supported by every model family: with "
                        "--fold_parallel the fused families train the whole "
                        "seeds x folds grid as ONE SPMD device program "
                        "sharded over the mesh (chunked per "
                        "--spmd_batch_entries); the zoo and SNP-only "
                        "families replicate sequentially in one process. "
                        "The dataset itself stays drawn from --seed")
    p.add_argument("--spmd_batch_entries", type=int, default=64,
                   help="SPMD seed batches (--permut_seeds / --cv_seeds "
                        "with --fold_parallel): max seeds x folds entries "
                        "per device program; larger batches are chunked "
                        "into ceil(entries/folds)-seed groups so HBM (the "
                        "gathered fold copies scale with entries) and "
                        "compile time stay bounded; 0 = unlimited")
    p.add_argument("--isMultiFusion", action="store_true", default=False,
                   help="fuse all three imaging modalities as one 270-node "
                        "graph (90 ROIs x {MRI, FDG-PET, AV45-PET})")
    p.add_argument("--isuseProb4Regr", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="append the importance-weighted raw ROI features to "
                        "the regression head input")
    p.add_argument("--temperature", type=float, default=0.1,
                   help="Gumbel/softmax temperature (GUIDE and fused models)")
    p.add_argument("--isImageOnly", action="store_true", default=False,
                   help="ablation: drop the GO/SNP branch from the fused "
                        "model (imaging features only)")
    p.add_argument("--isSNPsOnly", action="store_true", default=False,
                   help="ablation: drop the imaging branch from the fused "
                        "model (GO/SNP features only)")
    p.add_argument("--Seed4PermutTest", type=int, default=1,
                   help="seed of the label permutation under --isPermutTest "
                        "(vary it to build the null distribution)")
    p.add_argument("--lambda_disease", type=float, default=0.0,
                   help="weight of the diagnosis NLL loss term")
    p.add_argument("--lambda_regr", type=float, default=1.0,
                   help="weight of the clinical-score MSE loss term")
    p.add_argument("--lambda_prob", type=float, default=0.5,
                   help="weight of the importance-sparsity loss "
                        "(L1 + entropy over ROI/edge/SNP probabilities)")
    p.add_argument("--lambda_reco", type=float, default=0.0000015,
                   help="weight of the SNP autoencoder reconstruction loss")
    p.add_argument("--lambda_simi", type=float, default=0.1,
                   help="weight of the subject-similarity consistency loss")
    p.add_argument("--lambda_orth", type=float, default=0.0,
                   help="weight of the embedding orthogonality loss")
    p.add_argument("--data", type=str, default="ADNI",
                   help="dataset: ADNI (cohort experiments) or a TU "
                        "benchmark name under --tu_root (zoo models, "
                        "e.g. MUTAG)")
    p.add_argument("--layers", type=int, default=2,
                   help="GNN depth for the single configuration "
                        "(--no-search)")
    p.add_argument("--hiddens", type=int, default=5,
                   help="hidden width for the single configuration "
                        "(--no-search)")
    p.add_argument("--h", type=int, default=2,
                   help="hop count for Nested* subgraph extraction")
    # nested-GNN flags (reference main.py:54-57)
    p.add_argument("--node_label", type=str, default="hop",
                   choices=["hop", "spd", "spd2", "spd3", "drnl"],
                   help="structural node-label scheme for Nested* "
                        "subgraphs (hop distance, shortest-path distance, "
                        "or DRNL)")
    p.add_argument("--use_rd", action="store_true", default=False,
                   help="append resistance-distance features (Nested*)")
    p.add_argument("--use_rp", type=int, default=None,
                   help="random-walk return-probability feature steps")
    p.add_argument("--max_nodes_per_hop", type=int, default=None,
                   help="subsample each BFS frontier to this many nodes "
                        "during Nested* subgraph extraction")
    p.add_argument("--tu_root", type=str, default="./data",
                   help="root directory holding raw TU datasets "
                        "(<root>/<name>/<name>_A.txt ...)")
    p.add_argument("--weight_decay", type=float, default=0.0,
                   help="Adam coupled-L2 weight decay (torch semantics)")
    p.add_argument("--epochs", type=int, default=200,
                   help="training epochs per fold")
    p.add_argument("--batch_size", type=int, default=32,
                   help="graphs per training step (throughput peaks at 256 "
                        "on one chip; BASELINE.md batch sweep)")
    p.add_argument("--lr", type=float, default=1e-3,
                   help="Adam learning rate")
    p.add_argument("--lr_decay_factor", type=float, default=0.5,
                   help="StepLR multiplicative decay")
    p.add_argument("--lr_decay_step_size", type=int, default=50,
                   help="StepLR decay interval in epochs")
    p.add_argument("--fold", type=int, default=5,
                   help="number of stratified CV folds")
    p.add_argument("--seed", type=int, default=1000,
                   help="seed for splits, init, shuffling, and the "
                        "synthetic cohort")
    # reference parity: --search defaults to TRUE (reference main.py:103 is
    # store_true with default=True — an un-disablable always-search quirk);
    # BooleanOptionalAction makes --no-search reachable, so a bare reference
    # command line reproduces the reference's five-config sweep while a
    # single configuration stays one flag away.
    p.add_argument("--search", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="sweep the reference's (layers, hiddens, h) triples "
                        "(main.py:146-155); --no-search runs the single "
                        "(--layers, --hiddens, --h) configuration")
    # device-selection + dead flags, accepted for drop-in compatibility with
    # the reference README's exact command lines (`python main.py --epochs
    # 200 --lr 0.001 --search --cuda 0`). --cuda/--cpu are n/a under jax
    # placement (a notice is printed); --clean/--keep_old/--reprocess are
    # parsed but never consumed anywhere in the reference either
    # (main.py:82,107-112 — dead upstream, dead here).
    p.add_argument("--cuda", type=int, default=None,
                   help="ignored (reference compat): jax places on the "
                        "available TPU/CPU; use JAX_PLATFORMS to force")
    p.add_argument("--cpu", action="store_true", default=False,
                   help="ignored (reference compat): set JAX_PLATFORMS=cpu "
                        "instead")
    p.add_argument("--clean", action="store_true", default=False,
                   help="ignored (dead flag in the reference too)")
    p.add_argument("--keep_old", action="store_true", default=False,
                   help="ignored (dead flag in the reference too)")
    p.add_argument("--reprocess", action="store_true", default=False,
                   help="ignored (dead flag in the reference too)")
    p.add_argument("--save_appendix", default="",
                   help="suffix of the results dir "
                        "(results/ADNI<appendix>; default: a timestamp)")
    p.add_argument("--resume", action="store_true", default=False,
                   help="resume an interrupted experiment: folds with a "
                        "fold_result_*.npz already in the results dir are "
                        "restored instead of retrained (requires "
                        "--save_appendix of the interrupted run; all "
                        "model families)")
    p.add_argument("--synthetic", action="store_true", default=False,
                   help="use the synthetic ADNI-shaped cohort")
    p.add_argument("--synthetic_subjects", type=int, default=256,
                   help="subject count of the synthetic cohort")
    p.add_argument("--data_path", type=str,
                   default="./data/snps/data/preprocessing/",
                   help="ADNI preprocessing dir holding knn/<k>/ (falls "
                        "back to the synthetic cohort when absent; "
                        "validate with iggcn-doctor)")
    p.add_argument("--json_path", type=str, default="./data/snps/analysis.json",
                   help="PANTHER GO analysis json (GO term hierarchy)")
    p.add_argument("--go_connection_path", type=str,
                   default="./data/go_root_connection.txt",
                   help="scraped GO root-connection list "
                        "(build with iggcn_tpu.data.go_scraper)")
    p.add_argument("--snps_to_gene_path", type=str,
                   default="./data/snps_to_gene.txt",
                   help="SNP-to-gene mapping table")
    p.add_argument("--cohort_cache_dir", type=str, default="./cohort_cache",
                   help="directory for the processed-cohort npz cache "
                        "(parity: ADNIDataset caches its pre_transformed "
                        "tensors under ./<root>/processed/, "
                        "sgcn_data.py:307,332-338); '' disables caching")
    p.add_argument("--snps_csv_root", type=str, default="./data/snps/data",
                   help="root of the standalone SNP csv cohorts "
                        "(<root>/data_{AH,MH,AM}/{snp,dia}.csv) for the "
                        "SNP-only trainers; falls back to the imaging "
                        "cohort's SNP matrix when absent")
    p.add_argument("--batch_file", type=str, default=None,
                   help="run MANY experiments from one process: each "
                        "non-empty, non-# line of the file is a full "
                        "main.py command line (without 'python main.py'), "
                        "executed in order with the jax init, compile "
                        "cache, jit traces and processed-cohort cache all "
                        "shared (~22 s per-process fixed cost paid once "
                        "instead of per experiment); a failing line is "
                        "reported and the batch continues (exit 1 if any "
                        "line failed). Must be the only flag on the "
                        "command line")
    return p


# --model routing (replaces the reference's `eval(args.model)` at
# main.py:160, which crashed on unknown names and — despite appearances —
# always trained the fused model: `Net` is never passed to the trainer
# there). Here every family dispatches to its actual trainer; unknown names
# fail loudly with the full list.
FUSION_MODELS = {
    "SGCN_GCN_IMGSNP": "sgcn_imgsnp",
    "GCN_IMGSNP": "gcn_imgsnp",
    "GUIDE_IMGSNP": "guide_imgsnp",
    "SGCN_GCN_CLUSTERLABEL": "clusterlabel",
    "SGCN_GCN": "sgcn_image",
    "SGCN_GAT": "sgcn_image",
    "SGCN_Ori": "sgcn_ori",
}
ZOO_MODELS = ("GCN", "GAT", "GIN", "GIN0", "GraphSAGE",
              "GraphSAGEWithoutJK", "TopK", "DiffPool", "SortPool",
              "Set2Set", "GlobalAttention", "Graclus", "CNN_Model",
              "NestedGCN", "NestedGAT", "NestedGIN", "NestedGIN0",
              "NestedGraphSAGE")
SNP_MODELS = ("MLP_Model", "Gene_ontology_network")


def _build_zoo_model(name: str, num_layers: int, hidden: int, dataset):
    """Instantiate a zoo model by reference name; returns (model, cv_kwargs)
    for `cross_validation_generic`."""
    from iggcn_tpu.models import baselines as B
    from iggcn_tpu.models import nested as N
    nc = dataset.num_classes
    common = dict(num_layers=num_layers, hidden=hidden, num_classes=nc)
    mask = dict(needs_mask=True)
    if name == "GCN":
        return B.GCNFlat(**common), dict(needs_mask=False)
    if name == "GAT":
        return B.GATFlat(**common), dict(needs_mask=False)
    if name == "GIN":
        return B.GIN(**common), dict(needs_mask=True, takes_weight=True)
    if name == "GIN0":
        return (B.GIN(**common, train_eps=False),
                dict(needs_mask=True, takes_weight=True))
    if name == "GraphSAGE":
        return B.GraphSAGE(**common), mask
    if name == "GraphSAGEWithoutJK":
        return B.GraphSAGE(**common, jk=False), mask
    if name == "TopK":
        return B.TopK(**common), mask
    if name == "DiffPool":
        # the reference DISCARDS dense_diff_pool's link/entropy losses
        # (kernel/diff_pool.py:95,168: `x, adj, _, _ = ...`), so the default
        # objective is plain NLL; pass aux_loss=True to
        # cross_validation_generic for the canonical DiffPool objective.
        return (B.DiffPool(max_nodes=dataset.x.shape[1],
                           num_layers=num_layers, hidden=hidden,
                           num_classes=nc),
                dict(needs_mask=True, aux_loss=False, takes_weight=True))
    if name == "SortPool":
        # the reference hardcodes k=30 regardless of graph size
        # (kernel/sort_pool.py:27 `self.k = 30`); smaller graphs are
        # zero-padded to k, exactly as PyG's global_sort_pool does
        return B.SortPool(**common), mask
    if name == "Set2Set":
        return B.Set2SetNet(**common), mask
    if name == "GlobalAttention":
        return B.GlobalAttentionNet(**common), mask
    if name == "Graclus":
        return B.Graclus(**common), dict(needs_mask=True, needs_assign=True)
    if name == "CNN_Model":
        return (B.CNNModel(num_classes=nc, rois=dataset.x.shape[1]),
                dict(adj_only=True))
    if name.startswith("Nested"):
        factory = getattr(N, name)
        use_z = getattr(dataset, "z", None) is not None
        use_rd = getattr(dataset, "rd", None) is not None
        return (factory(**common, num_subgraphs=dataset.num_subgraphs,
                        use_z=use_z, use_rd=use_rd),
                dict(needs_mask=True, needs_assign=True, takes_weight=True))
    raise ValueError(name)


def _write_env_manifest(res_dir: str) -> None:
    """Reproducibility manifest alongside cmd_input.txt (exceeds the
    reference, which records only the command line): package versions,
    backend/device, and the repo commit, so any results dir states the
    environment that produced it. Best-effort — never fails the run."""
    import platform
    import subprocess
    try:
        import jax

        lines = [
            f"python {platform.python_version()} ({platform.platform()})",
            f"jax {jax.__version__}",
            f"numpy {np.__version__}",
            f"backend {jax.default_backend()} "
            f"({jax.devices()[0].device_kind} x{jax.device_count()})",
        ]
        try:
            sha = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True, text=True, timeout=5).stdout.strip()
            if sha:
                lines.append(f"commit {sha}")
        except Exception:
            pass
        with open(os.path.join(res_dir, "env.txt"), "a") as fh:
            fh.write("\n".join(lines) + "\n---\n")
    except Exception as e:  # pragma: no cover - never block the experiment
        print(f"[env] manifest skipped ({e})", file=sys.stderr)


def _parse_permut_seeds(spec: str, parser, flag="--permut_seeds") -> list:
    """'1,2,3' or inclusive 'A:B' -> list of distinct seeds."""
    try:
        if ":" in spec:
            lo_s, hi_s = spec.split(":", 1)
            lo, hi = int(lo_s), int(hi_s)
            if hi < lo:
                parser.error(f"{flag} range {spec!r} is empty "
                             "(end < start)")
            seeds = list(range(lo, hi + 1))
        else:
            seeds = [int(s) for s in spec.split(",") if s.strip()]
    except ValueError:
        parser.error(f"{flag} {spec!r}: expected a comma list "
                     "'1,2,3' or an inclusive range '1:100'")
    if not seeds:
        parser.error(f"{flag} named no seeds")
    if any(s < 0 for s in seeds):
        # np.random.default_rng / StratifiedKFold both require
        # non-negative seeds; fail at the parser instead of deep in a
        # trainer after minutes of setup
        parser.error(f"{flag} {spec!r}: seeds must be non-negative")
    if len(set(seeds)) != len(seeds):
        parser.error(f"{flag} {spec!r} repeats a seed; each "
                     "run must use a distinct seed")
    return seeds


def _profile_ctx(args):
    """`--profile_dir` jax.profiler trace context (nullcontext when off) —
    shared by every training route so the flag works for the zoo and
    SNP-only families too, not only the fused trainers."""
    import contextlib

    if not args.profile_dir:
        return contextlib.nullcontext()
    import jax
    return jax.profiler.trace(args.profile_dir)


def _seed_chunks(seeds, folds, max_entries):
    """Slices bounding seeds x folds entries per SPMD program (shared by
    the --permut_seeds and --cv_seeds batch routes)."""
    per_chunk = (len(seeds) if max_entries == 0
                 else max(1, max_entries // folds))
    return [slice(i, i + per_chunk)
            for i in range(0, len(seeds), per_chunk)], per_chunk


def _run_batch_file(path, argv, parser):
    """`--batch_file`: run every line of `path` as its own main.py command
    line IN THIS PROCESS. The reference's workflow for an experiment sweep
    is one process per run, each paying the full fixed cost (backend init,
    compile/AOT-load, data prep) before its first step; here runs 2..N
    reuse the warm jit trace cache (identical shapes skip even the AOT
    reload), the processed-cohort disk cache, and the initialized backend.
    Keep-going semantics: a failing line is reported with its error and the
    batch continues; the process exits 1 if any line failed."""
    import traceback

    given = [a for a in (argv if argv is not None else sys.argv[1:])
             if a != "--batch_file" and not a.startswith("--batch_file=")
             and a != path]
    if given:
        parser.error("--batch_file runs self-contained command lines; "
                     f"drop the extra arguments {given} (put them on the "
                     "file's lines instead)")
    try:
        with open(path) as fh:
            raw_lines = fh.readlines()
    except OSError as e:
        parser.error(f"--batch_file: cannot read {path!r} ({e})")
    jobs = []
    for lineno, line in enumerate(raw_lines, start=1):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        jobs.append((lineno, line))
    if not jobs:
        parser.error(f"--batch_file {path!r} has no runnable lines "
                     "(all empty or #-comments)")

    failures = []
    for i, (lineno, line) in enumerate(jobs):
        try:
            job_argv = shlex.split(line)
        except ValueError as e:
            print(f"[batch] line {lineno} does not tokenize ({e}): {line}",
                  file=sys.stderr)
            failures.append((lineno, line, f"shlex: {e}"))
            continue
        if any(a == "--batch_file" or a.startswith("--batch_file=")
               for a in job_argv):
            print(f"[batch] line {lineno}: --batch_file does not nest; "
                  "skipping", file=sys.stderr)
            failures.append((lineno, line, "nested --batch_file"))
            continue
        print(f"[batch] {i + 1}/{len(jobs)} (line {lineno}): {line}")
        try:
            main(job_argv)
        except SystemExit as e:
            if e.code not in (None, 0):
                failures.append((lineno, line, f"exit {e.code}"))
        except KeyboardInterrupt:
            raise
        except Exception as e:
            traceback.print_exc()
            failures.append((lineno, line, f"{type(e).__name__}: {e}"))
    print(f"[batch] {len(jobs) - len(failures)}/{len(jobs)} experiments "
          "succeeded")
    for lineno, line, why in failures:
        print(f"[batch] FAILED line {lineno} ({why}): {line}",
              file=sys.stderr)
    if failures:
        raise SystemExit(1)


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    # the argv this run was ACTUALLY given, for cmd_input.txt: a --batch_file
    # job must record its own line (the outer `--batch_file FILE` invocation
    # is not reproducible once the file changes or is deleted), and a direct
    # CLI run keeps recording sys.argv verbatim
    args._argv = list(argv) if argv is not None else None

    if args.batch_file is not None:
        _run_batch_file(args.batch_file, argv, parser)
        return

    known = (tuple(FUSION_MODELS) + ZOO_MODELS + SNP_MODELS)
    if args.model not in known:
        parser.error(f"unknown --model {args.model!r}; choose one of: "
                     + ", ".join(known))
    if args.fold_parallel and args.no_fold_scan:
        parser.error("--fold_parallel requires the whole-fold scan; drop "
                     "--no_fold_scan")
    if args.permut_seeds is not None:
        # a seed batch IS a permutation-test run; implying the flag keeps
        # every downstream guard (export-bundle refusal, results_permuttest/
        # routing, npy suppression) consistent with a single --isPermutTest
        args.isPermutTest = True
    if args.spmd_batch_entries < 0:
        parser.error("--spmd_batch_entries must be >= 0")
    if args.cv_seeds is not None and (args.permut_seeds is not None
                                      or args.isPermutTest):
        parser.error("--cv_seeds replicates the OBSERVED experiment; run "
                     "the permutation nulls separately (--permut_seeds)")
    if args.cv_seeds is not None and args.isTestAdnitype:
        parser.error("--cv_seeds does not combine with --isTestAdnitype; "
                     "loop --seed manually for the held-out-type analysis")
    if args.cuda is not None or args.cpu:
        print("[device] --cuda/--cpu are reference-compat no-ops: jax "
              "places on the available TPU/CPU (force with "
              "JAX_PLATFORMS=cpu)", file=sys.stderr)
    if args.export_bundle:
        # refuse up front rather than training for minutes and silently
        # writing no bundle (cv.py's guard would skip topo-less models)
        image_only = {m for m, k in FUSION_MODELS.items()
                      if k in ("sgcn_image", "sgcn_ori")}
        if args.model in ZOO_MODELS or args.model in image_only:
            parser.error(
                f"--export_bundle does not support --model {args.model}: "
                "serving bundles exist for the fused imaging-genetics "
                f"families ({', '.join(sorted(set(FUSION_MODELS) - image_only))}) "
                f"and the SNP-only families ({', '.join(SNP_MODELS)})")
        if args.isPermutTest:
            parser.error("--export_bundle with --isPermutTest: permutation "
                         "runs train on shuffled labels; refusing to export "
                         "serving bundles from them")
    if args.init_from_torch:
        # the reference's only checkpoint artifact is the fused
        # SGCN_GCN_IMGSNP state_dict; other families' trees cannot load it
        if FUSION_MODELS.get(args.model) != "sgcn_imgsnp":
            parser.error("--init_from_torch supports --model "
                         "SGCN_GCN_IMGSNP only (the one family the "
                         "reference writes checkpoints for)")
        if args.cv_seeds is not None or args.permut_seeds is not None:
            parser.error("--init_from_torch does not combine with the "
                         "--cv_seeds/--permut_seeds SPMD batch paths")
        if args.isTestAdnitype:
            # the held-out-type split binarizes labels AFTER warm-start
            # validation, so a checkpoint matching --disease_id's head
            # would pass the arch check and then fail the per-leaf shape
            # guard at fold init (and one matching the binarized head
            # would be falsely rejected up front). The combination is
            # ill-defined — the reference checkpoint was trained on a
            # different label space — so refuse it loudly.
            parser.error("--init_from_torch does not combine with "
                         "--isTestAdnitype: the held-out-ADNI-type split "
                         "re-binarizes the classifier head, so the "
                         "checkpoint's head cannot match the run's")
        if not os.path.exists(args.init_from_torch):
            parser.error(f"--init_from_torch: {args.init_from_torch} "
                         "does not exist")
    if args.resume and args.save_appendix == "":
        parser.error("--resume needs --save_appendix naming the results "
                     "dir of the interrupted run (a fresh timestamped "
                     "dir has nothing to resume from)")
    if args.clinical_score_index != -1:
        # a single selected clinical score means ONE regression target; a
        # 3-wide head against a (B, 1) target would broadcast silently in
        # the MSE and leave two heads unevaluated. Only an explicit 1 or an
        # unset default is accepted — an explicit 3 is just as wrong as 2
        # and is not silently overridden.
        if args.num_regr not in (None, 1):
            parser.error("--clinical_score_index selects a single score; "
                         "--num_regr must be 1 (or left unset)")
        args.num_regr = 1
    elif args.num_regr is None:
        args.num_regr = 3

    if args.save_appendix == "":
        args.save_appendix = "_" + time.strftime("%Y%m%d%H%M%S")

    if args.cv_seeds is not None:
        seeds = _parse_permut_seeds(args.cv_seeds, parser, flag="--cv_seeds")
        _run_cv_seed_batch(args, parser, seeds)
        return

    if args.permut_seeds is not None:
        # null-distribution batch: N permutation runs in ONE process. Each
        # run is bit-identical to a standalone `--isPermutTest
        # --Seed4PermutTest <s>` process (fresh host rng per run, seed-keyed
        # results dir), but runs 2..N reuse the in-process jit trace cache
        # (identical shapes -> no recompile/AOT reload), the processed-
        # cohort cache, and the already-initialized backend — the per-
        # process fixed cost is paid once for the whole null distribution.
        seeds = _parse_permut_seeds(args.permut_seeds, parser)
        base = args.save_appendix
        if (args.fold_parallel and args.model in FUSION_MODELS
                and not args.resume and not args.isTestAdnitype):
            # fused families under --fold_parallel: the whole seeds x folds
            # grid trains as ONE SPMD program (identical per-seed outputs)
            _run_permut_batch_parallel(args, parser, seeds)
            return
        for i, seed in enumerate(seeds):
            run_args = argparse.Namespace(**vars(args))
            run_args.Seed4PermutTest = seed
            run_args.save_appendix = f"{base}_permut{seed}"
            print(f"[permut] null run {i + 1}/{len(seeds)} "
                  f"(Seed4PermutTest={seed}) -> "
                  f"results_permuttest/ADNI{run_args.save_appendix}")
            _run_experiment(run_args, parser)
        print(f"[permut] {len(seeds)} null runs done; p-values: "
              f"python -m iggcn_tpu.tools.report <observed_dir> "
              f"--permut_null results_permuttest/ADNI{base}_permut*")
        return

    _run_experiment(args, parser)


def _improves(loss: float, best_loss: float) -> bool:
    """NaN-aware grid-selection comparison (review finding: `NaN < inf` is
    False, so a diverged combo used to leave the initial placeholder in
    place and the Result line printed 0.000 with combo[0]'s hypers). A NaN
    loss only fills the initial inf placeholder — so an all-diverged sweep
    still reports its first combo's measured accuracies — and any real loss
    beats a NaN best."""
    if np.isnan(loss):
        return bool(np.isinf(best_loss))
    return bool(np.isnan(best_loss)) or loss < best_loss


def _setup_run_dir(args):
    """Create the results dir (reference naming), record the command line
    and the env manifest, and return (res_dir, logger)."""
    sub = "results_permuttest" if args.isPermutTest else "results"
    res_dir = os.path.join(os.getcwd(), sub, f"ADNI{args.save_appendix}")
    os.makedirs(res_dir, exist_ok=True)
    # shlex.join preserves quoting so the recorded line is re-runnable even
    # when an argument contains spaces (plain ' '.join would record
    # `--save_appendix _a b` for the value "_a b")
    argv_rec = getattr(args, "_argv", None)
    cmd = (shlex.join(sys.argv) if argv_rec is None
           else "main.py " + shlex.join(argv_rec))
    with open(os.path.join(res_dir, "cmd_input.txt"), "a") as fh:
        fh.write("python " + cmd + "\n")
    _write_env_manifest(res_dir)

    def logger(info):
        with open(os.path.join(res_dir, "log.txt"), "a") as fh:
            print(info, file=fh)

    return res_dir, logger


def _build_dcfg(args):
    from iggcn_tpu.config import DataConfig
    return DataConfig(
        data_path=args.data_path, json_path=args.json_path,
        go_connection_path=args.go_connection_path,
        snps_to_gene_path=args.snps_to_gene_path, knn=args.knn,
        disease_id=args.disease_id, clinical_score_index=args.clinical_score_index,
        is_ppr=args.isPPr, is_topk=args.isTopK, top_k=args.top_k,
        is_multimodal4similarity=args.isMultilModal4Similarity,
        is_multi_fusion=args.isMultiFusion, is_permut_test=args.isPermutTest,
        seed4permut_test=args.Seed4PermutTest)


def _combos(args):
    """Hyperparameter grid: under --search, the reference's exact
    (layers, hiddens, hs) TRIPLES (main.py:146-155) — h feeds the Nested*
    subgraph pre-transform and the result filenames. (Its h=None product
    branch is unreachable from the CLI: --h is type=int with default 2, so
    None can never be passed.)"""
    if args.search:
        if args.isMultiFusion:
            return list(zip([3, 2, 4, 2, 3], [2, 3, 3, 5, 10],
                            [3, 2, 4, 2, 4]))
        return list(zip([2, 3, 2, 3, 4], [16, 16, 10, 10, 5],
                        [2, 3, 4, 4, 2]))
    return [(args.layers, args.hiddens, args.h)]


def _load_cohort(args, dcfg, rng):
    """Load (cohort, topo): the real ADNI .mat layout when present, else the
    synthetic cohort — both through the processed-cohort disk cache."""
    from iggcn_tpu.data import adni, cohort_cache, go_graph
    use_synthetic = args.synthetic or not os.path.isdir(args.data_path)
    if use_synthetic:
        print("[data] using synthetic ADNI-shaped cohort")
        rois = 270 if args.isMultiFusion else 90
        feat = 1 if args.isMultiFusion else 3
        # topology is drawn BEFORE the cohort so a cohort cache hit
        # (which skips the generator's rng draws) leaves the topo
        # identical to a cache-miss run; nothing consumes `rng` after
        # the cohort on this route
        topo = go_graph.synthetic_topology(rng)
        key = cohort_cache.cohort_key(
            "synthetic", seed=args.seed,
            num_subjects=args.synthetic_subjects, rois=rois,
            feat_dim=feat, num_classes=dcfg.num_classes,
            num_regr=args.num_regr, top_k=args.top_k)
        cohort, hit = cohort_cache.load_or_build(
            args.cohort_cache_dir, key,
            lambda: adni.synthetic_cohort(
                rng, num_subjects=args.synthetic_subjects, rois=rois,
                feat_dim=feat, num_classes=dcfg.num_classes,
                num_regr=args.num_regr, top_k=args.top_k))
        if dcfg.is_permut_test:
            # the real loader shuffles inside load_adni874; the synthetic
            # null must shuffle too or every permutation run would train
            # on the true subject->score pairing. Applied AFTER the cache
            # so cached entries always hold the true pairing.
            cohort = adni.permute_regression_targets(
                cohort, dcfg.seed4permut_test)
    else:
        # key includes the source files (name/size/mtime) and every
        # loader-relevant config field — incl. the permutation-test seed,
        # because load_adni874 shuffles internally
        key = cohort_cache.cohort_key(
            "adni874",
            files=cohort_cache.dir_fingerprint(args.data_path),
            data_path=os.path.abspath(args.data_path),
            disease_id=dcfg.disease_id, knn=dcfg.knn,
            num_cluster=dcfg.num_cluster,
            clinical_score_index=dcfg.clinical_score_index,
            is_ppr=dcfg.is_ppr, is_topk=dcfg.is_topk, top_k=dcfg.top_k,
            ppr_alpha=dcfg.ppr_alpha, heat_t=dcfg.heat_t,
            is_multimodal4similarity=dcfg.is_multimodal4similarity,
            is_use_tsne4similar=dcfg.is_use_tsne4similar,
            is_multi_fusion=dcfg.is_multi_fusion,
            is_permut_test=dcfg.is_permut_test,
            seed4permut_test=dcfg.seed4permut_test)
        try:
            cohort, hit = cohort_cache.load_or_build(
                args.cohort_cache_dir, key,
                lambda: adni.load_adni874(dcfg))
            topo = go_graph.parse_go_json(dcfg.json_path,
                                          dcfg.go_connection_path,
                                          dcfg.snps_to_gene_path)
        except Exception as e:
            # a malformed real-data layout should point at the doctor,
            # not die as a bare deep scipy error (the data dir EXISTS
            # here — a missing dir already fell back to the synthetic
            # cohort). The original exception re-raises unchanged so
            # genuine code bugs keep their traceback.
            print(
                f"[data] failed to load the ADNI cohort/GO sources "
                f"({type(e).__name__}: {e}).\n"
                f"Diagnose the layout with:\n"
                f"  python -m iggcn_tpu.tools.doctor "
                f"--data_path {args.data_path} --knn {args.knn} "
                f"--json_path {args.json_path} "
                f"--go_connection_path {args.go_connection_path} "
                f"--snps_to_gene_path {args.snps_to_gene_path}",
                file=sys.stderr)
            raise
    if hit:
        print(f"[data] cohort loaded from cache ({key})")
    return cohort, topo


def _build_warm_start(args, dcfg, topo, combos, logger):
    """Convert `--init_from_torch` (a reference gcn_state_dict_*.pt) into a
    `(params, batch_stats, tag)` warm-start for `cv.cross_validation`.
    The checkpoint fixes one architecture, so a multi-combo grid refuses
    up front, and every architectural field must match the run's config —
    a silent partial load is never an option."""
    import hashlib

    from iggcn_tpu.tools import import_torch as it

    if len(combos) > 1:
        print("[init_from_torch] a grid search cannot warm-start from one "
              "fixed-architecture checkpoint; pass --no-search with the "
              "checkpoint's --layers/--hiddens", file=sys.stderr)
        raise SystemExit(2)
    sd = it._load_state_dict(args.init_from_torch)
    try:
        icfg = it.infer_model_config(sd, topo)
        mcfg0, _ = _fused_cfgs(args, dcfg, combos[0][0], combos[0][1])
        arch_fields = ("num_layers", "hidden", "rois", "feat_dim",
                       "num_classes", "num_regr", "hidden_linear", "l_dim",
                       "go_in_f_dim", "go_n_l", "go_f_dim", "num_snps",
                       "is_use_prob4regr")
        mismatch = [f"{f}: checkpoint {getattr(icfg, f)} vs run "
                    f"{getattr(mcfg0, f)}" for f in arch_fields
                    if getattr(icfg, f) != getattr(mcfg0, f)]
        if mismatch:
            print("[init_from_torch] checkpoint architecture does not "
                  "match the run's configuration:\n  "
                  + "\n  ".join(mismatch), file=sys.stderr)
            raise SystemExit(2)
        params, batch_stats = it.convert_fused_state_dict(sd, topo, icfg)
    except it.ImportError_ as e:
        print(f"[init_from_torch] FAILED: {e}", file=sys.stderr)
        raise SystemExit(2)
    with open(args.init_from_torch, "rb") as f:
        digest = hashlib.sha1(f.read()).hexdigest()[:12]
    tag = f"{os.path.basename(args.init_from_torch)}:{digest}"
    msg = f"[init_from_torch] warm-starting every fold from {tag}"
    print(msg)
    logger(msg)
    return params, batch_stats, tag


def _fused_cfgs(args, dcfg, num_layers, hidden):
    """Per-combo (ModelConfig, TrainConfig) for the fused-family trainers;
    shared by the sequential experiment and the permutation-batch SPMD
    path so a batched null's configuration cannot drift from a standalone
    run's."""
    from iggcn_tpu.config import LossWeights, ModelConfig, TrainConfig
    # Resolve the --num_regr None default here (not only in main()) so
    # direct callers — warm-start validation, tests, the SPMD batch
    # drivers — always see the same post-coercion architecture main()
    # trains with: a single selected clinical score means one regression
    # head, otherwise all three (tau/adas13/mmse).
    num_regr = args.num_regr
    if num_regr is None:
        num_regr = 1 if args.clinical_score_index != -1 else 3
    mcfg = ModelConfig(
        num_layers=num_layers, hidden=hidden,
        rois=270 if args.isMultiFusion else 90,
        feat_dim=1 if args.isMultiFusion else 3,
        num_classes=dcfg.num_classes, num_regr=num_regr,
        is_cross_atten=args.isCrossAtten,
        is_soft_similarity=args.isSoftSimilarity,
        rbf_gamma=args.rbf_gamma, is_use_prob4regr=args.isuseProb4Regr,
        model4eachregr=args.model4eachregr,
        is_image_only=args.isImageOnly, is_snps_only=args.isSNPsOnly,
        is_multi_fusion=args.isMultiFusion,
        use_pallas_gcn=args.use_pallas_gcn,
        go_attention_impl=args.go_attention_impl)
    if args.model == "SGCN_GAT":
        mcfg = dataclasses.replace(mcfg, use_gat=True)
    tcfg = TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        weight_decay=args.weight_decay,
        lr_decay_factor=args.lr_decay_factor,
        lr_decay_step_size=args.lr_decay_step_size, folds=args.fold,
        seed=args.seed, no_val=args.no_val,
        is_permut_test=args.isPermutTest,
        temperature=args.temperature,
        use_fold_scan=not args.no_fold_scan,
        fold_parallel=args.fold_parallel,
        clinical_score_index=args.clinical_score_index,
        loss=LossWeights(args.lambda_disease, args.lambda_regr,
                         args.lambda_prob, args.lambda_reco,
                         args.lambda_simi, args.lambda_orth))
    return mcfg, tcfg


def _dedup_cohort(base_cohort, cohort):
    """Alias a permutation variant's seed-invariant arrays to the first
    seed's, so a --permut_seeds batch keeps ONE copy of the big tensors in
    host RAM (real-data loads are per-seed because the reference permutes
    BEFORE subject selection — `sgcn_data.py:205-208` — but the selected
    non-score tensors come out identical). Values are compared first; a
    field that genuinely differs is kept, and the batch trainer's own
    variant validation rejects it loudly."""
    import dataclasses

    repl = {}
    for f in ("x", "adj", "raw_adj", "y", "clust_y", "snps", "sbj_id",
              "tsne_fdim", "raw_y", "adni_type"):
        a, b = getattr(base_cohort, f), getattr(cohort, f)
        if a is None or b is None:
            continue
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f" and b.dtype.kind == "f":
            same = a.shape == b.shape and np.array_equal(a, b,
                                                         equal_nan=True)
        else:
            same = np.array_equal(a, b)
        if same:
            repl[f] = getattr(base_cohort, f)
    return dataclasses.replace(cohort, **repl)


def _fused_seed_sweep(base_args, dcfg, seeds, loggers, run_combo):
    """Shared combo-sweep driver for the per-seed batch modes (the SPMD
    permutation-null batch and the --cv_seeds replication batch used to
    carry two drifting copies of this block): sweep the (layers, hidden, h)
    grid, run `run_combo(mcfg, tcfg, result_file_name)` (returns one
    CVResult per seed), track each seed's NaN-aware best, and print/log
    the per-seed Result lines. Returns the per-seed bests."""
    combos = _combos(base_args)
    if base_args.search and FUSION_MODELS[base_args.model] == "sgcn_ori":
        print("[search] SGCN_Ori has a fixed architecture; running one "
              "configuration instead of the grid")
        combos = combos[:1]
    bests = [(float("inf"), 0.0, 0.0)] * len(seeds)
    best_hypers = [combos[0]] * len(seeds)
    for num_layers, hidden, h in combos:
        result_file_name = (f"result_sgcn_img_snp_layers{num_layers}"
                            f"_hidden{hidden}_h{h}")
        mcfg, tcfg = _fused_cfgs(base_args, dcfg, num_layers, hidden)
        msg = f"Using {num_layers} layers, {hidden} hidden units, h = {h}"
        print(msg)
        for logger in loggers:
            logger(msg)
        with _profile_ctx(base_args):
            results = run_combo(mcfg, tcfg, result_file_name)
        for s, res in enumerate(results):
            print(f"[throughput] seed {seeds[s]}: "
                  f"{res.throughput_graphs_per_sec:.1f} graphs/s")
            if _improves(res.mean_test_loss, bests[s][0]):
                bests[s] = (res.mean_test_loss, res.best_acc,
                            res.best_acc_std)
                best_hypers[s] = (num_layers, hidden, h)
    for s in range(len(seeds)):
        log = (f"Result - {bests[s][1]:.3f} +/- {bests[s][2]:.3f}, with "
               f"{best_hypers[s][0]} layers and {best_hypers[s][1]} hidden "
               f"units and h = {best_hypers[s][2]}")
        print(log)
        loggers[s](log)
    return bests


def _run_permut_batch_parallel(base_args, parser, seeds):
    """SPMD permutation-null batch: under `--permut_seeds --fold_parallel`
    (fused families), ALL seeds x folds train as ONE sharded device program
    (`train/cv.cross_validation_permut_batch`) — vmapped on a single chip,
    sharded across the mesh on many — instead of looping seeds through
    separate fold-parallel runs. Per-seed results dirs, log lines, fold
    records and aggregates match the sequential loop's (exactly on one
    device; to float reduction order when the multi-device mesh
    factorization differs — see cross_validation_permut_batch)."""
    from iggcn_tpu.train.cv import cross_validation_permut_batch
    from iggcn_tpu.utils.cache import enable_compilation_cache
    from iggcn_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    enable_compilation_cache()

    base = base_args.save_appendix
    run_args, res_dirs, loggers, variants = [], [], [], []
    for i, seed in enumerate(seeds):
        a = argparse.Namespace(**vars(base_args))
        a.Seed4PermutTest = seed
        a.save_appendix = f"{base}_permut{seed}"
        res_dir, logger = _setup_run_dir(a)
        dcfg = _build_dcfg(a)
        rng = np.random.default_rng(a.seed)
        print(f"[permut] loading null {i + 1}/{len(seeds)} "
              f"(Seed4PermutTest={seed}) -> "
              f"results_permuttest/ADNI{a.save_appendix}")
        cohort, topo = _load_cohort(a, dcfg, rng)
        if variants:
            # the permutation only changes the subject->score pairing, so
            # every non-score tensor is a duplicate of seed 0's — alias it
            # so N seeds hold ONE copy of the big arrays in host RAM (an
            # equal-values alias; a genuinely differing field is left
            # alone and rejected loudly by cross_validation_permut_batch)
            cohort = _dedup_cohort(variants[0][1], cohort)
        run_args.append(a)
        res_dirs.append(res_dir)
        loggers.append(logger)
        variants.append((seed, cohort))

    dcfg = _build_dcfg(run_args[0])
    model_kind = FUSION_MODELS[base_args.model]

    # chunk the seed axis so one SPMD program holds at most
    # --spmd_batch_entries seeds x folds entries (HBM for the gathered
    # fold copies and compile time both scale with the entry count)
    max_entries = base_args.spmd_batch_entries   # validated in main()
    chunks, per_chunk = _seed_chunks(seeds, base_args.fold, max_entries)
    if len(chunks) > 1:
        print(f"[permut] {len(seeds)} seeds x {base_args.fold} folds "
              f"exceeds --spmd_batch_entries {max_entries}; running "
              f"{len(chunks)} SPMD programs of <= {per_chunk} seeds")

    def run_combo(mcfg, tcfg, result_file_name):
        results = []
        for ch in chunks:
            results.extend(cross_validation_permut_batch(
                variants[ch], topo, mcfg, tcfg, res_dirs=res_dirs[ch],
                result_file_name=result_file_name,
                clinical_score_index=base_args.clinical_score_index,
                loggers=loggers[ch], model_kind=model_kind))
        return results

    _fused_seed_sweep(base_args, dcfg, seeds, loggers, run_combo)
    print(f"[permut] {len(seeds)} null runs done (one SPMD program per "
          f"configuration); p-values: python -m iggcn_tpu.tools.report "
          f"<observed_dir> --permut_null "
          f"results_permuttest/ADNI{base}_permut*")


def _run_cv_seed_batch(base_args, parser, seeds):
    """Replication batch (`--cv_seeds`): the SAME experiment across N CV
    seeds on ONE fixed cohort (drawn from --seed). Each seed redraws the
    stratified splits, per-fold imputation, parameter inits and epoch
    shuffling — the robustness-to-analysis-seed check a reviewer always
    asks for, which costs the reference N full processes. Under
    --fold_parallel the whole seeds x folds grid trains as ONE SPMD device
    program (`cv.cross_validation_seed_batch`); otherwise the seeds run
    sequentially in-process (warm jit/cohort caches; supports --resume).
    Prints per-seed Result lines plus the across-seed mean +/- std."""
    from iggcn_tpu.train.cv import (cross_validation,
                                    cross_validation_seed_batch)
    from iggcn_tpu.utils.cache import enable_compilation_cache
    from iggcn_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    enable_compilation_cache()

    if base_args.model not in FUSION_MODELS:
        _run_cv_seed_batch_other(base_args, parser, seeds)
        return

    base = base_args.save_appendix
    run_args, res_dirs, loggers = [], [], []
    for seed in seeds:
        a = argparse.Namespace(**vars(base_args))
        a.seed = seed
        a.save_appendix = f"{base}_seed{seed}"
        res_dir, logger = _setup_run_dir(a)
        run_args.append(a)
        res_dirs.append(res_dir)
        loggers.append(logger)

    # ONE cohort for every seed, drawn from the BASE --seed: the whole
    # point is varying the analysis seed on fixed data (on real data the
    # cohort is seed-invariant anyway)
    dcfg = _build_dcfg(base_args)
    rng = np.random.default_rng(base_args.seed)
    cohort, topo = _load_cohort(base_args, dcfg, rng)

    model_kind = FUSION_MODELS[base_args.model]
    use_spmd = base_args.fold_parallel and not base_args.resume
    if base_args.fold_parallel and base_args.resume:
        print("[cv_seeds] --resume resumes seed-by-seed; running the seeds "
              "sequentially instead of as one SPMD batch")
    chunks, per_chunk = _seed_chunks(seeds, base_args.fold,
                                     base_args.spmd_batch_entries)
    if use_spmd and len(chunks) > 1:
        print(f"[cv_seeds] {len(seeds)} seeds x {base_args.fold} folds "
              f"exceeds --spmd_batch_entries {base_args.spmd_batch_entries};"
              f" running {len(chunks)} SPMD programs of <= {per_chunk} "
              "seeds")

    def run_combo(mcfg, tcfg, result_file_name):
        if use_spmd:
            results = []
            for ch in chunks:
                results.extend(cross_validation_seed_batch(
                    cohort, seeds[ch], topo, mcfg, tcfg,
                    res_dirs=res_dirs[ch],
                    result_file_name=result_file_name,
                    clinical_score_index=base_args.clinical_score_index,
                    loggers=loggers[ch], model_kind=model_kind,
                    export_bundle=base_args.export_bundle))
            return results
        return [cross_validation(
            cohort, topo, mcfg,
            dataclasses.replace(tcfg, seed=seed),
            res_dir=res_dirs[i], result_file_name=result_file_name,
            clinical_score_index=base_args.clinical_score_index,
            logger=loggers[i], model_kind=model_kind,
            export_bundle=base_args.export_bundle,
            resume=base_args.resume)
            for i, seed in enumerate(seeds)]

    bests = _fused_seed_sweep(base_args, dcfg, seeds, loggers, run_combo)
    _replication_summary(seeds, [b[1] for b in bests], loggers, base)


def _replication_summary(seeds, accs, loggers, base):
    """Across-seed `Replication over N seeds` line, printed and logged to
    every per-seed dir (shared by the fused SPMD/sequential batch and the
    zoo/SNP sequential batch)."""
    seed_accs = np.asarray(accs, dtype=np.float64)
    summary = (f"Replication over {len(seeds)} seeds - acc "
               f"{seed_accs.mean():.3f} +/- "
               f"{seed_accs.std(ddof=1) if len(seeds) > 1 else 0.0:.3f} "
               f"(per-seed: "
               + ", ".join(f"{s}:{a:.3f}" for s, a in zip(seeds, seed_accs))
               + ")")
    print(summary)
    for logger in loggers:
        logger(summary)
    print(f"[cv_seeds] aggregate across seeds with: "
          f"python -m iggcn_tpu.tools.report results/ADNI{base}_seed*")


def _run_cv_seed_batch_other(base_args, parser, seeds):
    """`--cv_seeds` for the zoo and SNP-only families. The one-SPMD-program
    grid is a fused-family capability (their folds share one padded device
    cohort; `cv.cross_validation_seed_batch`); these families replicate
    SEQUENTIALLY in one process on ONE fixed dataset drawn from the base
    --seed — which still amortizes the per-process jax init, the in-process
    jit trace cache and the dataset build across the whole replication,
    while each seed redraws the stratified splits, parameter inits and
    epoch shuffling through the trainer's own seed (and, for Nested*
    models, the subgraph-extraction subsampling)."""
    if base_args.fold_parallel:
        print("[cv_seeds] --fold_parallel is a fused-family SPMD path; "
              f"--model {base_args.model} replicates sequentially")

    base = base_args.save_appendix
    dcfg = _build_dcfg(base_args)
    rng = np.random.default_rng(base_args.seed)

    def load_cohort():
        return _load_cohort(base_args, dcfg, rng)

    # ONE dataset for every seed, drawn from the BASE --seed (same contract
    # as the fused batch: vary the analysis seed on fixed data)
    if base_args.model in ZOO_MODELS:
        data = _zoo_dataset(base_args, rng, load_cohort)
    else:
        data = _snps_inputs(base_args, parser, dcfg, rng, load_cohort)

    combos = _combos(base_args)
    accs, loggers = [], []
    with _profile_ctx(base_args):
        for i, seed in enumerate(seeds):
            a = argparse.Namespace(**vars(base_args))
            a.seed = seed
            a.save_appendix = f"{base}_seed{seed}"
            res_dir, logger = _setup_run_dir(a)
            print(f"[cv_seeds] replication {i + 1}/{len(seeds)} "
                  f"(seed {seed}) -> results/ADNI{a.save_appendix}")
            if base_args.model in ZOO_MODELS:
                best = _run_zoo_experiment(a, res_dir, logger, data, combos)
            else:
                best = _run_snps_experiment(a, res_dir, logger, *data)
            accs.append(best[1])
            loggers.append(logger)
    _replication_summary(seeds, accs, loggers, base)


def _zoo_dataset(args, rng, load_cohort):
    """Dataset for the baseline/pooling/nested zoo: the ADNI cohort as a
    fixed-size graph list, raw TU files under --tu_root, or the synthetic
    TU benchmark fallback."""
    from iggcn_tpu.data import tu as tu_mod
    if args.data == "ADNI":
        cohort, _ = load_cohort()
        return tu_mod.from_graph_list(
            [cohort.x[i] for i in range(len(cohort.y))],
            [cohort.adj[i] for i in range(len(cohort.y))],
            cohort.y.astype(np.int64))
    try:
        return tu_mod.read_tu_dir(args.tu_root, args.data)
    except FileNotFoundError:
        if not args.synthetic:
            raise
        print(f"[data] no raw {args.data} files under "
              f"{args.tu_root}; using a synthetic TU benchmark")
        return tu_mod.synthetic_tu_dataset(rng)


def _run_zoo_experiment(args, res_dir, logger, dataset, combos):
    """Grid-search the generic trainer over one zoo model family; prints
    and logs the reference `Result - ...` line. Returns the best
    (mean_loss, best_acc, best_acc_std) triple for across-seed summaries."""
    from iggcn_tpu.train.generic_cv import cross_validation_generic
    nested_cache = {}  # h -> pre-transformed dataset (hs repeat in the grid)

    def nested_for(h):
        if h not in nested_cache:
            from iggcn_tpu.data.nested import create_nested_dataset
            nested_cache[h] = create_nested_dataset(
                dataset, h=h, node_label=args.node_label,
                use_rd=args.use_rd,
                use_return_prob=args.use_rp is not None,
                return_prob_steps=(args.use_rp if args.use_rp is not None
                                   else 16),
                max_nodes_per_hop=args.max_nodes_per_hop, seed=args.seed)
        return nested_cache[h]

    best = (float("inf"), 0.0, 0.0)
    best_hyper = combos[0]
    for num_layers, hidden, h in combos:
        # h parameterizes the Nested* subgraph pre-transform per combo
        # (reference main.py:181-186 zips it into the grid); non-Nested
        # zoo models ignore it, as in the reference's get_dataset
        combo_ds = (nested_for(h) if args.model.startswith("Nested")
                    else dataset)
        model, cv_kw = _build_zoo_model(args.model, num_layers, hidden,
                                        combo_ds)
        msg = (f"Using {num_layers} layers, {hidden} hidden units, "
               f"h = {h}")
        print(msg)
        logger(msg)
        res = cross_validation_generic(
            combo_ds, model, folds=args.fold, epochs=args.epochs,
            batch_size=args.batch_size, lr=args.lr,
            lr_decay_factor=args.lr_decay_factor,
            lr_decay_step_size=args.lr_decay_step_size,
            weight_decay=args.weight_decay, seed=args.seed,
            no_val=args.no_val, verbose=True,
            record_dir=res_dir,
            record_tag=(f"{args.model}_layers{num_layers}"
                        f"_hidden{hidden}_h{h}"),
            resume=args.resume, **cv_kw)
        if _improves(res.mean_loss, best[0]):
            best = (res.mean_loss, res.best_acc, res.best_acc_std)
            best_hyper = (num_layers, hidden, h)
    log = (f"Result - {best[1]:.3f} +/- {best[2]:.3f}, with "
           f"{best_hyper[0]} layers and {best_hyper[1]} hidden units "
           f"and h = {best_hyper[2]}")
    print(log)
    logger(log)
    return best


def _snps_inputs(args, parser, dcfg, rng, load_cohort):
    """(snps_x, snps_y, topo) for the SNP-only trainers: the standalone
    csv cohort when present (reference `snps_graph.py:295-331`), else the
    imaging cohort's SNP matrix."""
    from iggcn_tpu.data import go_graph
    if dcfg.num_classes != 2:
        parser.error("SNP trainers are binary classifiers (BCE); use "
                     "--disease_id 0|1|2")
    kind = "mlp" if args.model == "MLP_Model" else "go"
    snps_csv = None
    if not args.synthetic:
        # the reference SNP trainers read their own standalone csv
        # cohort (snps_graph.py:295-331), not the imaging .mat cohort;
        # an explicit --synthetic must NOT be overridden by on-disk csvs
        try:
            from iggcn_tpu.data.snps import load_snps_csv
            snps_csv = load_snps_csv(args.snps_csv_root, args.disease_id)
            print(f"[data] SNP csv cohort: {snps_csv[0].shape[0]} "
                  "subjects")
        except FileNotFoundError:
            pass
    if snps_csv is not None:
        snps_x, snps_y = snps_csv
        go_files = (dcfg.json_path, dcfg.go_connection_path,
                    dcfg.snps_to_gene_path)
        if all(os.path.exists(p) for p in go_files):
            topo = go_graph.parse_go_json(*go_files)
        else:
            # parse_go_json needs all three source files
            print("[data] GO source files missing "
                  f"({[p for p in go_files if not os.path.exists(p)]}); "
                  "using a synthetic GO topology")
            topo = go_graph.synthetic_topology(rng)
        if kind == "go" and snps_x.shape[1] != topo.go_snps.shape[1]:
            parser.error(
                f"csv cohort has {snps_x.shape[1]} SNPs but the GO "
                f"topology expects {topo.go_snps.shape[1]}")
    else:
        cohort, topo = load_cohort()
        snps_x, snps_y = cohort.snps, cohort.y.astype(np.float32)
    return snps_x, snps_y, topo


def _run_snps_experiment(args, res_dir, logger, snps_x, snps_y, topo):
    """One SNP-only CV run (fixed architecture — no grid); prints and logs
    the `Result - ...` line. Returns (best_loss_placeholder, best_acc,
    best_acc_std) matching `_run_zoo_experiment`'s shape for across-seed
    summaries (the SNP trainer selects by max-over-epochs accuracy, not
    loss)."""
    from iggcn_tpu.train.snps_trainer import cross_validation_snps
    kind = "mlp" if args.model == "MLP_Model" else "go"
    res = cross_validation_snps(
        snps_x, snps_y, topo,
        folds=args.fold, epochs=args.epochs,
        batch_size=args.batch_size, lr=args.lr, seed=args.seed,
        model_kind=kind,
        result_path=os.path.join(res_dir, f"result_snps_{kind}.npy"),
        bundle_dir=res_dir if args.export_bundle else None,
        record_dir=res_dir, resume=args.resume,
        verbose=True)
    log = (f"Result - {res.best_acc:.3f} +/- {res.best_acc_std:.3f} "
           f"(SNP-only, {args.model})")
    print(log)
    logger(log)
    return (float("nan"), res.best_acc, res.best_acc_std)


def _run_experiment(args, parser):
    from iggcn_tpu.data import adni, go_graph
    from iggcn_tpu.train.cv import cross_validation
    from iggcn_tpu.utils.cache import enable_compilation_cache
    from iggcn_tpu.utils.platform import honor_platform_env

    honor_platform_env()   # JAX_PLATFORMS=cpu must actually mean cpu
    enable_compilation_cache()   # also arms the dead-tunnel watchdog

    res_dir, logger = _setup_run_dir(args)
    dcfg = _build_dcfg(args)
    rng = np.random.default_rng(args.seed)

    def load_cohort():
        return _load_cohort(args, dcfg, rng)

    combos = _combos(args)

    # ---- baseline / pooling / nested zoo (generic trainer) --------------
    if args.model in ZOO_MODELS:
        dataset = _zoo_dataset(args, rng, load_cohort)
        with _profile_ctx(args):
            _run_zoo_experiment(args, res_dir, logger, dataset, combos)
        return

    # ---- SNP-only trainers ---------------------------------------------
    # (before load_cohort: when the standalone csv cohort is used, the
    # expensive imaging .mat load + per-subject diffusion is skipped)
    if args.model in SNP_MODELS:
        snps_x, snps_y, topo = _snps_inputs(args, parser, dcfg, rng,
                                            load_cohort)
        with _profile_ctx(args):
            _run_snps_experiment(args, res_dir, logger, snps_x, snps_y,
                                 topo)
        return

    cohort, topo = load_cohort()

    if args.search and FUSION_MODELS[args.model] == "sgcn_ori":
        # SGCN_Ori is a fixed architecture (conv1->conv3); the (layers,
        # hidden) grid would train 5 byte-identical models
        print("[search] SGCN_Ori has a fixed architecture; running one "
              "configuration instead of the grid")
        combos = combos[:1]

    warm_start = None
    if args.init_from_torch:
        warm_start = _build_warm_start(args, dcfg, topo, combos, logger)

    best = (float("inf"), 0.0, 0.0)
    best_hyper = combos[0]
    for num_layers, hidden, h in combos:
        result_file_name = (f"result_sgcn_img_snp_layers{num_layers}"
                            f"_hidden{hidden}_h{h}")
        mcfg, tcfg = _fused_cfgs(args, dcfg, num_layers, hidden)
        print(f"Using {num_layers} layers, {hidden} hidden units, h = {h}")
        logger(f"Using {num_layers} layers, {hidden} hidden units, h = {h}")
        model_kind = FUSION_MODELS[args.model]
        train_cohort, ext_test = cohort, None
        if args.isTestAdnitype:
            train_cohort, ext_test = adni.separate_data_adnitype(
                cohort, args.disease_id4Adnitype, args.adnitype_id)
            if train_cohort.num_classes != mcfg.num_classes:
                # the held-out-type split binarizes labels; the head and
                # metrics must follow the cohort, not --disease_id
                mcfg = dataclasses.replace(
                    mcfg, num_classes=train_cohort.num_classes)
        with _profile_ctx(args):
            res = cross_validation(
                train_cohort, topo, mcfg, tcfg, res_dir=res_dir,
                external_test=ext_test,
                result_file_name=result_file_name,
                clinical_score_index=args.clinical_score_index, logger=logger,
                model_kind=model_kind, export_bundle=args.export_bundle,
                resume=args.resume, warm_start=warm_start)
        print(f"[throughput] {res.throughput_graphs_per_sec:.1f} graphs/s")
        if _improves(res.mean_test_loss, best[0]):
            best = (res.mean_test_loss, res.best_acc, res.best_acc_std)
            best_hyper = (num_layers, hidden, h)

    log = (f"Result - {best[1]:.3f} +/- {best[2]:.3f}, with {best_hyper[0]} "
           f"layers and {best_hyper[1]} hidden units and h = {best_hyper[2]}")
    print(log)
    logger(log)


if __name__ == "__main__":
    main()
