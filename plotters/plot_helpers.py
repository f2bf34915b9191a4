"""Shared plotting style: Blues palette, hatching, axis conventions.

Reference parity: plotters/plot_helpers.py (shared style used by every
per-dataset figure CLI).
"""
from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

# Coarseness x-axis: PCA class granularities + the 1000-class model
COARSE_CFGS = [2, 4, 8, 16, 32, 64]
FULL_CFG = 1000
PCA_MODELS = ["alexnet", "clip", "dino", "vit"]

BLUES = plt.get_cmap("Blues")


def coarseness_colors(n: int | None = None) -> list:
    n = n or (len(COARSE_CFGS) + 1)
    return [BLUES(0.25 + 0.7 * i / max(n - 1, 1)) for i in range(n)]


def apply_style(ax, ylabel: str = "", title: str = ""):
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)
    ax.set_ylabel(ylabel, fontsize=11)
    if title:
        ax.set_title(title, fontsize=12)
    ax.tick_params(labelsize=10)


def bar_with_ci(ax, xs, means, ci_lows, ci_highs, colors=None, hatch=None, width=0.7):
    colors = colors or coarseness_colors(len(xs))
    yerr = np.maximum(
        np.stack([
            np.asarray(means) - np.asarray(ci_lows),
            np.asarray(ci_highs) - np.asarray(means),
        ]),
        0.0,  # aggregated CIs can straddle the mean of a different stat
    )
    bars = ax.bar(range(len(xs)), means, width=width, color=colors,
                  edgecolor="black", linewidth=0.6, hatch=hatch,
                  yerr=yerr, capsize=3, error_kw={"linewidth": 1.0})
    ax.set_xticks(range(len(xs)))
    ax.set_xticklabels([str(x) for x in xs])
    return bars


def save_figure(fig, out_path: str, dpi: int = 200):
    import os

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=dpi)
    plt.close(fig)
    print(f"Saved {out_path}")
