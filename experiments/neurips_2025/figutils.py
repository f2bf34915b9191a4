"""Shared plotting primitives for the NeurIPS-2025 figure scripts.

The reference keeps near-identical plotting code in each of
experiments/neurips_2025/fig{1..4}/*; here the three recurring figure
shapes live once and each fig CLI is a thin data-prep wrapper:

  * condition_barplot     — rounded bars per training condition
                            (untrained gray / coarse Blues+hatch /
                            1000-class orange), fig2+fig3 bar plots.
  * layer_comparison_plot — per-layer RSA lines for untrained /
                            1000-way / each coarse granularity,
                            fig3 full_vs_pcs_things + fig4
                            full_vs_pcs_nsd.
  * reconstructed_rsa_plot— RSA vs #PCs curve with untrained and
                            best-coarse horizontal bands, fig2+fig3
                            reconstructed_rsa_*.

Data-prep helpers reuse plotters/plotter_utils.py (the DB/CSV layer
both trees share).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from visreps_tpu.core.logging import rprint

UNTRAINED_C, THOUSAND_C, INITIAL_C = "#AAAAAA", "#FFA500", "#7f8c8d"
PCA_SIZES = [2, 4, 8, 16, 32, 64]


def _blues(n, name="Blues"):
    import seaborn as sns

    return sns.color_palette(name, n_colors=max(n, 1) + 1)[1:]


def _hide_zero(x, pos):
    return "" if np.isclose(x, 0) else f"{x:.1f}"


def condition_barplot(scores_by_cond: dict, out_png: str,
                      ylabel: str = "Brain Similarity (RSA)",
                      palette_name: str = "Blues"):
    """Rounded bars, mean ± sd per condition (fig2/bar_plot_nsd.py:12-100)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.patches as mpatches
    import matplotlib.pyplot as plt
    from matplotlib.ticker import AutoMinorLocator, FuncFormatter, MultipleLocator

    cats = list(scores_by_cond)
    means = [float(np.mean(v)) for v in scores_by_cond.values()]
    errs = [float(np.std(v, ddof=1)) if len(v) > 1 else 0.0
            for v in scores_by_cond.values()]
    pca_cats = [c for c in cats if c not in ("Untrained", "1000 Classes")]
    blues = _blues(len(pca_cats), palette_name)
    palette = {c: (UNTRAINED_C if c == "Untrained" else THOUSAND_C
                   if c == "1000 Classes" else blues[pca_cats.index(c)])
               for c in cats}
    hatches = {c: ("" if c in ("Untrained", "1000 Classes") else "/") for c in cats}

    fig, ax = plt.subplots(figsize=(8, 5))
    old_hatch = plt.rcParams.get("hatch.color")
    plt.rcParams["hatch.color"] = "grey"
    positions = np.arange(len(cats))
    for i, cat in enumerate(cats):
        rect = mpatches.FancyBboxPatch(
            (positions[i] - 0.35, 0), 0.7, means[i],
            boxstyle=mpatches.BoxStyle("Round", pad=0.02, rounding_size=0.1),
            facecolor=palette[cat], edgecolor="black", linewidth=0.8,
            hatch=hatches[cat], mutation_aspect=0.05)
        ax.add_patch(rect)
        if errs[i] > 0:
            ax.errorbar(positions[i], means[i], yerr=errs[i], fmt="none",
                        ecolor="black", elinewidth=1.0, capsize=4, capthick=1.0)
    ax.set_xticks(positions)
    ax.set_xticklabels(cats, rotation=45, ha="right", fontsize=10)
    ax.yaxis.set_major_locator(MultipleLocator(0.1))
    ax.yaxis.set_minor_locator(AutoMinorLocator(2))
    ax.yaxis.set_major_formatter(FuncFormatter(_hide_zero))
    ymax = max(means) if means else 0
    ax.set_ylim(0, ymax + 0.02 if ymax > 0 else 0.1)
    ax.set_xlim(-0.5, len(cats) - 0.5)
    ax.set_ylabel(ylabel, fontsize=14, labelpad=10)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("bottom", "left"):
        ax.spines[side].set_linewidth(1.5)
    plt.tight_layout(pad=1.0)
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    plt.savefig(out_png, dpi=300, bbox_inches="tight")
    plt.close(fig)
    if old_hatch is not None:
        plt.rcParams["hatch.color"] = old_hatch
    rprint(f"Plot saved → {out_png}", style="success")


def layer_comparison_plot(initial_scores, final_scores, pca_scores: dict,
                          layer_order, out_png: str,
                          ylabel: str = "RSA (Spearman)",
                          colors: str = "Blues",
                          min_y=None, max_y=None):
    """Per-layer lines: untrained / 1000-way / coarse granularities
    (fig4/full_vs_pcs_nsd.py:24-140)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pca_sizes = sorted(pca_scores)
    pal = dict(zip(pca_sizes, _blues(len(pca_sizes), colors)))
    x = np.arange(len(layer_order))

    def series(d):
        return np.array([d.get(l, np.nan) for l in layer_order], float)

    fig, ax = plt.subplots(figsize=(6, 5.5))
    if initial_scores:
        ax.plot(x, series(initial_scores), color=INITIAL_C, marker="x",
                label="Untrained", zorder=3, linewidth=2.2)
    for n in pca_sizes:
        ax.plot(x, series(pca_scores[n]), color=pal[n], marker="s",
                label=f"{n} Classes", zorder=2, linewidth=2.2)
    if final_scores:
        ax.plot(x, series(final_scores), color=THOUSAND_C, marker="o",
                label="1000 Classes", zorder=3, linewidth=2.6)
    ax.set_xticks(x)
    ax.set_xticklabels(layer_order, rotation=45, ha="right")
    ax.set_ylabel(ylabel)
    if min_y is not None or max_y is not None:
        ax.set_ylim(min_y, max_y)
    ax.grid(True, linestyle="--", alpha=0.7)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    ax.legend(frameon=True, facecolor="white", fontsize=9, loc="best")
    plt.tight_layout()
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    plt.savefig(out_png, dpi=300, bbox_inches="tight")
    plt.close(fig)
    rprint(f"Plot saved → {out_png}", style="success")


def reconstructed_rsa_plot(recon_by_seed: np.ndarray, out_png: str,
                           untrained=None, best_pc=None,
                           best_pc_n_classes: int = 64,
                           ylabel: str = "RSA (Spearman)"):
    """RSA vs #PCs with horizontal baseline bands
    (fig2/reconstructed_rsa_nsd.py:30-190). recon_by_seed: (S, K)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.ticker import AutoMinorLocator, MultipleLocator

    recon = np.asarray(recon_by_seed, float)
    ks = np.arange(1, recon.shape[1] + 1)
    mean, std = recon.mean(axis=0), recon.std(axis=0)

    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(ks, mean, marker="^", color=THOUSAND_C,
            label="1000 classes (reconstructed)", markersize=6, linewidth=2,
            markeredgecolor="white", markeredgewidth=0.5, zorder=3)
    ax.fill_between(ks, mean - std, mean + std, alpha=0.3, color=THOUSAND_C,
                    zorder=2)
    if best_pc is not None:
        m, s = best_pc
        pal = dict(zip(PCA_SIZES, _blues(len(PCA_SIZES))))
        c = pal.get(best_pc_n_classes, "#808080")
        ax.axhline(m, color=c, linestyle="--", linewidth=2.3,
                   label=f"{best_pc_n_classes} classes (full)", zorder=2)
        ax.fill_between(ks, m - s, m + s, color=c, alpha=0.25, zorder=1)
    if untrained is not None:
        m, s = untrained
        ax.axhline(m, color=INITIAL_C, linestyle=":", linewidth=2.3,
                   label="Untrained (full)", zorder=2)
        ax.fill_between(ks, m - s, m + s, color=INITIAL_C, alpha=0.2, zorder=1)
    ax.set_xlabel("Number of PCs for Reconstruction")
    ax.set_ylabel(ylabel)
    ax.xaxis.set_major_locator(MultipleLocator(5))
    ax.xaxis.set_minor_locator(AutoMinorLocator(5))
    ax.set_xlim(0.5, recon.shape[1] + 0.5)
    ax.grid(True, which="major", linestyle="--", linewidth=0.5, alpha=0.7)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    ax.legend(frameon=True, facecolor="white", edgecolor="black", fontsize=8)
    plt.tight_layout()
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    plt.savefig(out_png, dpi=300)
    plt.close(fig)
    rprint(f"Plot saved → {out_png}", style="success")


# ── data prep (CSV long format, same columns as results.db) ─────────


def mean_per_seed(df):
    """Collapse subjects → one score per seed (fig2/bar_plot_nsd)."""
    return df.groupby("seed")["score"].mean()


def assemble_conditions(df, pc_layer: str, k1k_layer: str,
                        pca_classes=PCA_SIZES) -> dict:
    """{condition label: per-seed scores} from a long results frame
    (fig2/bar_plot_nsd.py __main__)."""
    df = df.copy()
    df["layer"] = df["layer"].str.lower()
    pc_mask = df["layer"] == pc_layer.lower()
    k1k_mask = df["layer"] == k1k_layer.lower()
    pca_flag = df["pca_labels"].astype(bool)

    out = {"Untrained": mean_per_seed(df[k1k_mask & (df["epoch"] == 0)]).tolist()}
    pca = (df[pc_mask & (df["epoch"] == 20) & pca_flag
              & df["pca_n_classes"].isin(pca_classes)]
           .groupby(["pca_n_classes", "seed"])["score"].mean())
    for n in pca_classes:
        if n in pca.index.get_level_values(0):
            out[f"{n} Classes"] = pca.loc[n].tolist()
        else:
            rprint(f"Warning: missing PCA scores for {n}-class model.",
                   style="warning")
    out["1000 Classes"] = mean_per_seed(
        df[k1k_mask & (df["epoch"] == 20) & ~pca_flag]).tolist()
    return out
