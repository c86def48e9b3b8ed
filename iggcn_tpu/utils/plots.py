"""Static renderings of the interpretability artifacts (matplotlib, Agg).

The framework's headline outputs are learned importances (ROI / edge / SNP
probabilities, Gumbel keep-masks, grad-CAM saliency); the reference exports
them only as bare npys and leaves figures to the user. These helpers render
publication-style figures next to the npys (`iggcn-explain --plot`).

Chart conventions (kept deliberately minimal and consistent):
  * magnitude-per-identity -> one sorted bar chart, ONE sequential hue
    (light->dark encodes nothing here; the bar length carries the value);
  * matrices (edge probabilities) -> single-hue sequential heatmap
    ("Blues", light->dark = magnitude) with a colorbar, never a rainbow;
  * recessive axes: no top/right spines, light value grid, neutral ink for
    all text; the npy next to the figure is the exact-value "table view".

matplotlib is an optional dependency on TPU host images (same gating as
`utils/visualize.py`); importing this module without it raises with the
install hint.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

BAR_COLOR = "#3b6ea5"       # one mid-blue hue; single-series, no legend
INK = "#333333"
MUTED = "#777777"


def _plt():
    try:
        import matplotlib
    except ImportError as e:  # pragma: no cover - baked into this image
        raise ImportError(
            "matplotlib is required for --plot (install the [viz] extra)"
        ) from e
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def _style_axes(ax):
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(MUTED)
    ax.tick_params(colors=INK, labelsize=8)
    ax.xaxis.label.set_color(INK)
    ax.yaxis.label.set_color(INK)
    ax.title.set_color(INK)


def plot_importance_bar(values: np.ndarray, out_path: str, *, title: str,
                        item_name: str = "ROI",
                        names: Optional[Sequence[str]] = None,
                        top: int = 30) -> str:
    """Sorted horizontal bar chart of per-item importance (largest on top).

    `values`: (n,) importance in [0, 1] (pass probabilities, not logits).
    Shows the `top` largest items (the tail is summarized in the subtitle);
    the full vector lives in the npy next to the figure.
    """
    plt = _plt()
    v = np.asarray(values, np.float64).reshape(-1)
    order = np.argsort(v)[::-1]
    k = min(top, v.size)
    sel = order[:k]
    labels = ([str(names[i]) for i in sel] if names is not None
              else [f"{item_name} {i}" for i in sel])

    fig, ax = plt.subplots(figsize=(6, max(2.2, 0.24 * k + 1.2)))
    y = np.arange(k)[::-1]
    ax.barh(y, v[sel], height=0.62, color=BAR_COLOR, edgecolor="none")
    ax.set_yticks(y)
    ax.set_yticklabels(labels, fontsize=7)
    ax.set_xlabel("importance")
    sub = f"top {k} of {v.size}" if k < v.size else f"all {v.size}"
    ax.set_title(f"{title} ({sub})", fontsize=10, loc="left")
    ax.set_xlim(0, max(1.0, float(v[sel].max()) * 1.05))
    ax.grid(axis="x", color="#dddddd", linewidth=0.6)
    ax.set_axisbelow(True)
    _style_axes(ax)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_matrix(mat: np.ndarray, out_path: str, *, title: str,
                axis_name: str = "ROI") -> str:
    """Single-hue sequential heatmap (light->dark = magnitude) of a square
    score matrix, e.g. the subject-mean edge probabilities."""
    plt = _plt()
    m = np.asarray(mat, np.float64)
    fig, ax = plt.subplots(figsize=(5.4, 4.6))
    im = ax.imshow(m, cmap="Blues", aspect="equal",
                   vmin=float(np.nanmin(m)), vmax=float(np.nanmax(m)))
    cb = fig.colorbar(im, ax=ax, shrink=0.85)
    cb.ax.tick_params(colors=INK, labelsize=8)
    ax.set_xlabel(axis_name)
    ax.set_ylabel(axis_name)
    ax.set_title(title, fontsize=10, loc="left")
    _style_axes(ax)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
