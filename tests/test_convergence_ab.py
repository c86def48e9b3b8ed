"""Convergence-level A/B in the suite: a small configuration of
`scripts/convergence_ab.py` (the full 300-epoch record lives in
BASELINE.md "Round 3 — convergence-level A/B").

`test_trajectory_parity.py` pins the hot loop's semantics over six steps;
this pins the CONVERGENCE claim end to end: trained from identical weights
on an identical planted-signal cohort, the JAX flagship and the independent
torch derivation must learn (loss halves), their early loss trajectories
must agree tightly, and the two final models must make the same held-out
predictions with the same accuracy.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from convergence_ab import run_convergence_ab  # noqa: E402


def _assert_agrees(r, final_rtol=0.05):
    assert r["learned"], "one framework failed to learn the planted task"
    assert r["early_rel"] <= 1e-3, (
        f"early loss trajectories diverged: {r['early_rel']:.2e}")
    assert r["acc_jax"] == r["acc_torch"], (r["acc_jax"], r["acc_torch"])
    assert r["pred_agree"] == 1.0, (
        f"final models disagree on {100 * (1 - r['pred_agree']):.0f}% of "
        "held-out subjects")
    assert r["final_rel"] <= final_rtol
    assert r["ok"]


def test_convergence_ab_small():
    _assert_agrees(run_convergence_ab(epochs=30, subjects=60))


def test_convergence_ab_guide_small():
    """Same harness on the Gumbel-ST guide family (deterministic gumbel_zero
    parity mode): CE + regr MSE + SNP recon + image surrogate recon +
    Bernoulli-KL sparsity (`kernel/train_eval_guide_img_snps.py:450-489`)."""
    _assert_agrees(run_convergence_ab(family="guide", epochs=30, subjects=60))


def test_convergence_ab_gcn_small():
    """Same harness on the single-forward GCN fusion family
    (`kernel/train_eval_gcn_img_snps.py:448-483`)."""
    _assert_agrees(run_convergence_ab(family="gcn", epochs=30, subjects=60))


def test_convergence_ab_cluster_small():
    """Same harness on the cluster-label multitask family: dual-pass
    two-head CE + unweighted sparsity + averaged recon
    (`kernel/train_eval_sgcn_clusterlabel.py:365-399`)."""
    _assert_agrees(run_convergence_ab(family="cluster", epochs=30,
                                      subjects=60))


def test_convergence_ab_sgcn_small():
    """Same harness on the image-only SGCN family (SGCN_GCN): dual-pass
    CE + sparsity penalty, no genetics branch
    (`kernel/train_eval_sgcn.py:296-313`)."""
    _assert_agrees(run_convergence_ab(family="sgcn", epochs=30, subjects=60))


def test_convergence_ab_snps_small():
    """Same harness on the SNP-only GO classifier (the exact production
    step, `snps_trainer.build_snps_steps`). At 30 epochs the loss is still
    in steep descent, where chaotic fp32 drift peaks — the final-loss gate
    is therefore the descent bound 0.15, not the at-optimum 0.05 (the full
    300-epoch run re-converges to rel 1.1e-2, recorded in BASELINE.md)."""
    _assert_agrees(run_convergence_ab(family="snps", epochs=30, subjects=60,
                                      final_loss_rtol=0.15),
                   final_rtol=0.15)


def test_convergence_ab_zoo_small():
    """Same harness on the generic zoo trainer (plain NLL, GCNFlat, the
    exact production step `generic_cv.build_generic_steps`) — the seventh
    and last trainer family class (`kernel/train_eval.py:278-314`)."""
    _assert_agrees(run_convergence_ab(family="zoo", epochs=30, subjects=60))
