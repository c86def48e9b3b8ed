"""Figure rendering of the interpretability artifacts (`--plot`).

matplotlib is baked into this image; the assertions check the files are
real rendered PNGs, and that the CLI places one figure next to each
exported npy."""
import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from iggcn_tpu.utils.plots import (plot_importance_bar,  # noqa: E402
                                   plot_matrix, plot_null_distribution,
                                   plot_training_curves)


def _is_png(path, min_bytes=2000):
    if not os.path.isfile(path) or os.path.getsize(path) < min_bytes:
        return False
    with open(path, "rb") as fh:
        return fh.read(8) == b"\x89PNG\r\n\x1a\n"


def test_importance_bar_renders(tmp_path):
    v = np.linspace(0, 1, 90)
    out = plot_importance_bar(v, str(tmp_path / "bar.png"),
                              title="ROI importance")
    assert _is_png(out)


def test_importance_bar_top_k_and_names(tmp_path):
    v = np.array([0.1, 0.9, 0.5])
    out = plot_importance_bar(v, str(tmp_path / "bar.png"), title="t",
                              names=["a", "b", "c"], top=2)
    assert _is_png(out)


def test_matrix_renders(tmp_path):
    rng = np.random.default_rng(0)
    out = plot_matrix(rng.random((90, 90)), str(tmp_path / "m.png"),
                      title="edges")
    assert _is_png(out)


def test_training_curves_render(tmp_path):
    rng = np.random.default_rng(3)
    acc = rng.uniform(0.4, 0.9, (5, 20))
    loss = rng.uniform(0.2, 1.5, (5, 20))
    out = plot_training_curves(acc, str(tmp_path / "c.png"), title="curves",
                               loss_by_fold=loss)
    assert _is_png(out)
    # accuracy-only variant (generic zoo records may lack a loss trace)
    assert _is_png(plot_training_curves(acc, str(tmp_path / "c2.png"),
                                        title="curves"))


def test_null_distribution_renders(tmp_path):
    rng = np.random.default_rng(4)
    out = plot_null_distribution(rng.uniform(0.4, 0.6, 19), 0.92, 0.05,
                                 str(tmp_path / "n.png"), title="null")
    assert _is_png(out)


def test_explain_cli_plot_renders_figures(tmp_path):
    """End-to-end: checkpoint -> iggcn-explain --plot writes a figure next
    to each exported npy (node/SNP importance bars + per-subject edge-
    probability heatmap)."""
    from iggcn_tpu.tools import explain
    from iggcn_tpu.train.checkpoint import save_checkpoint

    rng = np.random.default_rng(1)
    n, dfeat, s = 12, 3, 5
    params = {
        "prob": rng.normal(size=(n, dfeat)).astype(np.float32),
        "prob_bias": rng.normal(size=(2 * dfeat, 1)).astype(np.float32),
        "snps_prob": rng.normal(size=(1, 8)).astype(np.float32),
    }
    ckpt = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(ckpt, params, {})
    x_npy = str(tmp_path / "x.npy")
    np.save(x_npy, rng.normal(size=(s, n, dfeat)).astype(np.float32))
    out_dir = str(tmp_path / "out")

    explain.main([ckpt, "--out", out_dir, "--prefix", "p", "--plot",
                  "--x_npy", x_npy])

    for fname in ("node_importance_p.png", "snps_importance_p.png",
                  "edge_probability_p.png"):
        assert _is_png(os.path.join(out_dir, fname)), fname
    # npys still exported alongside (the exact-value table view)
    assert os.path.isfile(os.path.join(out_dir, "node_importance_p.npy"))


def test_explain_cli_plot_guide_mask(tmp_path):
    from iggcn_tpu.tools import explain
    from iggcn_tpu.train.checkpoint import save_checkpoint

    rng = np.random.default_rng(2)
    params = {"bias_n": rng.normal(size=(24, 2)).astype(np.float32)}
    ckpt = str(tmp_path / "g.msgpack")
    save_checkpoint(ckpt, params, {})
    out_dir = str(tmp_path / "out")
    explain.main([ckpt, "--out", out_dir, "--prefix", "g", "--plot"])
    assert _is_png(os.path.join(out_dir, "mask_importance_g.png"))
