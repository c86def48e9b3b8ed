#!/usr/bin/env bash
# Breadth re-validation: drive every CLI route end-to-end on tiny synthetic /
# fixture data. Each route is a full experiment (train -> eval -> artifacts);
# PASS/FAIL tally at the end, non-zero exit on any FAIL.
#
# Usage:
#   JAX_PLATFORMS=cpu bash scripts/cli_breadth_sweep.sh     # ~25-45 min CPU
#   bash scripts/cli_breadth_sweep.sh                       # on the TPU
#
# Routes cover: all fused variants/modes (incl. bundle export, permut,
# adnitype, fold-parallel, multifusion, single-score, resume), the zoo on
# the committed TUTEST fixture, CNN/MLP/GO-snp, the report tool over the
# sweep's own outputs, and the unknown-name abort.
set -u
cd "$(dirname "$0")/.."

T=${SWEEP_ROUTE_TIMEOUT:-900}
PASS=0; FAIL=0; FAILED_ROUTES=()

run() {
  local name="$1"; shift
  echo "=== [$name] $*"
  if timeout "$T" "$@" >/tmp/sweep_route.log 2>&1; then
    PASS=$((PASS+1)); echo "--- PASS $name"
  else
    local rc=$?
    FAIL=$((FAIL+1)); FAILED_ROUTES+=("$name(rc=$rc)")
    echo "--- FAIL $name (rc=$rc); log tail:"; tail -5 /tmp/sweep_route.log
  fi
}

# expected-failure route (unknown model must abort with the list)
run_expect_fail() {
  local name="$1"; shift
  echo "=== [$name] $*"
  if timeout "$T" "$@" >/tmp/sweep_route.log 2>&1; then
    FAIL=$((FAIL+1)); FAILED_ROUTES+=("$name(expected-nonzero)")
    echo "--- FAIL $name (expected nonzero exit)"
  else
    PASS=$((PASS+1)); echo "--- PASS $name (aborted as expected)"
  fi
}

S="--synthetic --synthetic_subjects 48 --epochs 2 --fold 3 --batch_size 8 --no-search"
Z="--data TUTEST --tu_root tests/fixtures --epochs 1 --fold 3 --batch_size 4 --no-search"

# fused families and modes
run fused            python main.py $S --disease_id 0 --save_appendix _sw_fused
run fused_resume     python main.py $S --disease_id 0 --save_appendix _sw_fused --resume
run fused_bundle     python main.py $S --disease_id 0 --export_bundle --save_appendix _sw_bundle
run fused_3class     python main.py $S --disease_id 3 --save_appendix _sw_3c
run gcn_imgsnp       python main.py $S --disease_id 0 --model GCN_IMGSNP --save_appendix _sw_gcn
run guide            python main.py $S --disease_id 0 --model GUIDE_IMGSNP --save_appendix _sw_guide
run clusterlabel     python main.py $S --disease_id 0 --model SGCN_GCN_CLUSTERLABEL --save_appendix _sw_cl
run sgcn_image       python main.py $S --disease_id 0 --model SGCN_GCN --save_appendix _sw_img
run sgcn_gat         python main.py $S --disease_id 0 --model SGCN_GAT --save_appendix _sw_gat
run sgcn_ori         python main.py $S --disease_id 0 --model SGCN_Ori --save_appendix _sw_ori
run adnitype         python main.py $S --model SGCN_GCN --isTestAdnitype --save_appendix _sw_adt
run multifusion      python main.py $S --disease_id 0 --isMultiFusion --save_appendix _sw_mf
run permut           python main.py $S --disease_id 0 --isPermutTest --save_appendix _sw_perm
run permut_batch     python main.py $S --disease_id 0 --permut_seeds 1:2 --save_appendix _sw_pb
run fold_parallel    python main.py $S --disease_id 0 --fold_parallel --save_appendix _sw_fp
run cv_seed_batch    python main.py $S --disease_id 0 --cv_seeds 1:2 --fold_parallel --save_appendix _sw_cs
run cv_seed_zoo      python main.py --model GIN $Z --cv_seeds 1:2 --save_appendix _sw_csz
printf -- '%s --disease_id 0 --model MLP_Model --save_appendix _sw_bf1\n--model GCN %s --save_appendix _sw_bf2\n' "$S" "$Z" > /tmp/sweep_batch.txt
run batch_file       python main.py --batch_file /tmp/sweep_batch.txt
run single_score     python main.py $S --disease_id 0 --clinical_score_index 5 --save_appendix _sw_ss
run no_val           python main.py $S --disease_id 0 --no_val --save_appendix _sw_nv
run search_grid      python main.py --synthetic --synthetic_subjects 48 --epochs 1 --fold 3 --batch_size 8 --save_appendix _sw_grid

# zoo on the committed TU fixture
run zoo_gin          python main.py --model GIN $Z --save_appendix _sw_gin
run zoo_nested       python main.py --model NestedGCN $Z --h 1 --use_rd --save_appendix _sw_nst
run zoo_diffpool     python main.py --model DiffPool $Z --save_appendix _sw_dp
run cnn              python main.py $S --disease_id 0 --model CNN_Model --save_appendix _sw_cnn

# SNP-only
run snp_mlp          python main.py $S --disease_id 0 --model MLP_Model --save_appendix _sw_mlp
run snp_go           python main.py $S --disease_id 0 --model Gene_ontology_network --save_appendix _sw_go

# deployment loop over the sweep's own outputs: export a cohort npz from
# a fabricated real-layout dir and score it against a bundle from the
# bundle route (the bundle trains on 90-ROI synthetic data, so the
# exported cohort must match: the fixture writer parameterizes dims)
run export_serve     python scripts/_export_serve_check.py

# checkpoint interop over the sweep's own bundle: reverse-export to a
# reference-layout torch state_dict, import back, identical logits
run import_interop   python scripts/_import_interop_check.py

# warm-start loop over the sweep's own bundle: reference state_dict ->
# main.py --init_from_torch trains with it (r4)
run warm_start       python scripts/_warm_start_check.py

# GO attention impl forced to the edge-list aggregation (r4 CLI knob)
run attention_edge   python main.py $S --disease_id 0 --go_attention_impl edge --save_appendix _sw_attn

# analysis over the sweep's own outputs
run report           python -m iggcn_tpu.tools.report results/ADNI_sw_fused
run report_permut    python -m iggcn_tpu.tools.report results/ADNI_sw_fused --permut_null results_permuttest/ADNI_sw_perm results_permuttest/ADNI_sw_pb_permut1 results_permuttest/ADNI_sw_pb_permut2
run report_import    python -m iggcn_tpu.tools.report results/ADNI_sw_cs_seed1 results/ADNI_sw_cs_seed2 --importance --plot
run doctor_tu        python -m iggcn_tpu.tools.doctor --tu_root tests/fixtures --tu_name TUTEST

run_expect_fail unknown_model python main.py --model BOGUS $S

echo
echo "sweep: $PASS passed, $FAIL failed"
if [ "$FAIL" -gt 0 ]; then
  echo "failed routes: ${FAILED_ROUTES[*]}"
  exit 1
fi
