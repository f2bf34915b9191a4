"""Shared coarseness-figure logic: layouts, fancy bars, axis breaks.

Reference parity: plotters/plot_helpers.py — each per-dataset CLI
passes a dataset config dict (regions, region_labels, has_subjects,
optional (rows, cols, positions) layout) plus a PCA-label source; the
two figure builders render (1) the untrained | coarse 2-64 (hatched
Blues) | axis-break | 1000-class baseline bar panel per region and
(2) per-subject boxes with seed-averaged dots connected across class
counts.
"""
from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.transforms as mtransforms
import numpy as np
from matplotlib.ticker import AutoMinorLocator

from plotters.plotter_utils import get_condition_summary, get_subject_scores

# ── Constants ────────────────────────────────────────────────────
COARSE_CFGS = [2, 4, 8, 16, 32, 64]
N_COARSE = len(COARSE_CFGS)
FULL_CFG = 1000

PCA_MODELS = {"alexnet": "AlexNet", "vit": "ViT", "clip": "CLIP", "dino": "DINO"}
FOLDER_DISPLAY = {f"pca_labels_{k}": v for k, v in PCA_MODELS.items()}

plt.rcParams["hatch.color"] = "grey"
BLUES = [plt.get_cmap("Blues")(0.25 + 0.65 * i / (N_COARSE - 1)) for i in range(N_COARSE)]
UNTRAINED_COLOR = "#AAAAAA"
BASELINE_COLOR = "#FFA500"
BAR_WIDTH = 0.72


def coarseness_colors(n: int | None = None) -> list:
    n = n or (N_COARSE + 1)
    cmap = plt.get_cmap("Blues")
    return [cmap(0.25 + 0.7 * i / max(n - 1, 1)) for i in range(n)]


def apply_style(ax, ylabel: str = "", title: str = ""):
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)
    ax.set_ylabel(ylabel, fontsize=11)
    if title:
        ax.set_title(title, fontsize=12)
    ax.tick_params(labelsize=10)


def save_figure(fig, out_path: str, dpi: int = 200):
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=dpi)
    plt.close(fig)
    print(f"Saved {out_path}")


# ── Layout ───────────────────────────────────────────────────────
def make_figure(dcfg: dict):
    """Figure + ordered axes honoring an optional (rows, cols,
    positions) layout — e.g. the NSD finegrained (2, 4) grid with
    V1-hV4 on top and FFA/PPA centered below."""
    n_regions = len(dcfg["regions"])
    layout = dcfg.get("layout")
    if layout:
        nrows, ncols, positions = layout
        scale = 1 + 0.25 * (ncols - 1)
        fig, grid = plt.subplots(nrows, ncols, figsize=(5 * ncols, 4.5 * nrows),
                                 squeeze=False)
        ax_list = [grid[r, c] for r, c in positions]
        used = set(tuple(p) for p in positions)
        for r in range(nrows):
            for c in range(ncols):
                if (r, c) not in used:
                    grid[r, c].set_visible(False)
    else:
        scale = 1 + 0.35 * (n_regions - 1)
        fig, grid = plt.subplots(1, n_regions, figsize=(5 * n_regions, 4 * scale),
                                 squeeze=False)
        ax_list = [grid[0, i] for i in range(n_regions)]
    return fig, ax_list, scale


# ── Drawing primitives ───────────────────────────────────────────
def draw_fancy_bar(ax, x, height, color, hatch: str = "", width: float = BAR_WIDTH,
                   scale: float = 1.0):
    ax.bar(x, height, width=width, color=color, edgecolor="black",
           linewidth=0.8 * scale, hatch=hatch, zorder=3)


def draw_break_marks(ax, x, scale: float = 1.0):
    """Diagonal slashes on the bottom spine marking the x-axis break
    between the coarse granularities and the 1000-class baseline."""
    trans = mtransforms.blended_transform_factory(ax.transData, ax.transAxes)
    spine_y, dy, dx, gap = -0.022, 0.028, 0.20, 0.13
    ax.plot([x - gap - dx - 0.1, x + gap + dx + 0.1], [spine_y, spine_y],
            color="white", linewidth=5 * scale, transform=trans,
            clip_on=False, zorder=9)
    for off in (-gap, gap):
        ax.plot([x + off - dx, x + off + dx], [spine_y - dy, spine_y + dy],
                color="black", linewidth=1.8 * scale, transform=trans,
                clip_on=False, zorder=10)


def bar_with_ci(ax, xs, means, ci_lows, ci_highs, colors=None, hatch=None, width=0.7):
    """Simple labelled bar row with asymmetric CI whiskers."""
    colors = colors or coarseness_colors(len(xs))
    yerr = np.maximum(np.stack([
        np.asarray(means) - np.asarray(ci_lows),
        np.asarray(ci_highs) - np.asarray(means),
    ]), 0.0)
    bars = ax.bar(range(len(xs)), means, width=width, color=colors,
                  edgecolor="black", linewidth=0.6, hatch=hatch,
                  yerr=yerr, capsize=3, error_kw={"linewidth": 1.0})
    ax.set_xticks(range(len(xs)))
    ax.set_xticklabels([str(x) for x in xs])
    return bars


# ── Figure 1: coarseness bars ────────────────────────────────────
def plot_coarseness_bars(dcfg: dict, pca_model: str, output_dir: str,
                         dataset_label: str | None = None, db_path=None) -> str:
    """Untrained | coarse 2-64 (hatched) | break | 1000-class panel
    per region. Reference: plot_helpers.py:83-234."""
    folder = f"pca_labels_{pca_model}"
    nd = dcfg["neural_dataset"]
    analysis = dcfg.get("analysis", "rsa")
    method = dcfg.get("compare_method", "spearman")
    epoch = dcfg.get("epoch", 20)
    y_label = "Pearson r" if method == "pearson" else "Spearman ρ"
    display = PCA_MODELS.get(pca_model, pca_model)
    dataset_label = dataset_label or nd.upper()

    fig, ax_list, scale = make_figure(dcfg)
    for ax, region in zip(ax_list, dcfg["regions"]):
        un = get_condition_summary(nd, region, "imagenet1k", FULL_CFG, method,
                                   epoch=0, analysis=analysis, db_path=db_path)
        has_untrained = not np.isnan(un["mean"])

        xs, means, lo, hi, colors, hatches, labels = [], [], [], [], [], [], []
        if has_untrained:
            xs.append(0.0)
            means.append(un["mean"]); lo.append(un["ci_low"]); hi.append(un["ci_high"])
            colors.append(UNTRAINED_COLOR); hatches.append(""); labels.append("Untrained")
            x_coarse = np.arange(1.5, 1.5 + N_COARSE)
        else:
            x_coarse = np.arange(N_COARSE, dtype=float)
        for i, cfg_id in enumerate(COARSE_CFGS):
            s = get_condition_summary(nd, region, folder, cfg_id, method,
                                      epoch=epoch, analysis=analysis, db_path=db_path)
            xs.append(x_coarse[i])
            means.append(s["mean"]); lo.append(s["ci_low"]); hi.append(s["ci_high"])
            colors.append(BLUES[i]); hatches.append("/"); labels.append(str(cfg_id))
        bl = get_condition_summary(nd, region, "imagenet1k", FULL_CFG, method,
                                   epoch=epoch, analysis=analysis, db_path=db_path)
        x_base = x_coarse[-1] + 2
        xs.append(x_base)
        means.append(bl["mean"]); lo.append(bl["ci_low"]); hi.append(bl["ci_high"])
        colors.append(BASELINE_COLOR); hatches.append(""); labels.append("1000")

        xs, means = np.asarray(xs), np.asarray(means)
        lo, hi = np.asarray(lo), np.asarray(hi)
        for k in range(len(xs)):
            if not np.isnan(means[k]):
                draw_fancy_bar(ax, xs[k], means[k], colors[k], hatches[k], scale=scale)
            el, eh = means[k] - lo[k], hi[k] - means[k]
            if np.isfinite(el) and np.isfinite(eh) and el >= 0 and eh >= 0 and (el or eh):
                ax.errorbar(xs[k], means[k], yerr=[[el], [eh]], fmt="none",
                            ecolor="black", elinewidth=1.0 * scale,
                            capsize=4 * scale, capthick=1.0 * scale, zorder=5)
        draw_break_marks(ax, (x_coarse[-1] + x_base) / 2, scale=scale)

        finite_lo = lo[np.isfinite(lo)]
        finite_hi = hi[np.isfinite(hi)]
        vlo = finite_lo.min() if finite_lo.size else np.nanmin(means)
        vhi = finite_hi.max() if finite_hi.size else np.nanmax(means)
        dr = max(vhi - vlo, 0.01)
        ax.set_ylim(max(0, vlo - 0.2 * dr), vhi + 0.2 * dr)
        ax.set_xticks(xs)
        ax.set_xticklabels(labels, fontsize=10 * scale)
        ax.tick_params(axis="x", bottom=False)
        ax.yaxis.set_minor_locator(AutoMinorLocator(2))
        ax.set_xlim(xs[0] - 0.6, x_base + 0.7)
        ax.set_xlabel("Number of Classes", fontsize=13 * scale)
        ax.set_ylabel(y_label, fontsize=13 * scale)
        ax.set_title(dcfg.get("region_labels", {}).get(region, region),
                     fontsize=15 * scale, fontweight="bold", pad=10 * scale)
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)

    analysis_label = "Encoding Score" if analysis == "encoding_score" else "RSA"
    fig.suptitle(
        f"Brain Alignment Across Label Granularity\n"
        f"({display}-PCA Labels, {dataset_label} {analysis_label})",
        fontsize=16 * scale, fontweight="bold", y=1.02,
    )
    plt.tight_layout(pad=1.0)
    out = f"{output_dir}/coarseness_bars_{display.lower()}{dcfg.get('output_suffix', '')}.png"
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=200, bbox_inches="tight", facecolor="white")
    plt.close(fig)
    print(f"Saved -> {out}")
    return out


# ── Figure 2: per-subject boxes ──────────────────────────────────
def plot_per_subject(dcfg: dict, pca_model: str, output_dir: str,
                     dataset_label: str | None = None, db_path=None) -> str | None:
    """Per-subject boxes + connected dots across class counts.

    Reference: plot_helpers.py:237-366.
    """
    if not dcfg.get("has_subjects", True):
        print(f"Skipping per-subject plot ({dcfg['neural_dataset']} has no subjects)")
        return None
    folder = f"pca_labels_{pca_model}"
    nd = dcfg["neural_dataset"]
    analysis = dcfg.get("analysis", "rsa")
    method = dcfg.get("compare_method", "spearman")
    epoch = dcfg.get("epoch", 20)
    y_label = "Pearson r" if method == "pearson" else "Spearman ρ"
    display = PCA_MODELS.get(pca_model, pca_model)
    dataset_label = dataset_label or nd.upper()

    fig, ax_list, scale = make_figure(dcfg)
    for ax, region in zip(ax_list, dcfg["regions"]):
        data, x_labels = {}, []
        for n_classes in COARSE_CFGS:
            sm = get_subject_scores(nd, region, folder, n_classes, method,
                                    epoch=epoch, analysis=analysis, db_path=db_path)
            if len(sm):
                data[str(n_classes)] = sm
                x_labels.append(str(n_classes))
        sm_1k = get_subject_scores(nd, region, "imagenet1k", FULL_CFG, method,
                                   epoch=epoch, analysis=analysis, db_path=db_path)
        if len(sm_1k):
            data["1K"] = sm_1k
            x_labels.append("1K")
        if len(x_labels) < 2:
            ax.text(0.5, 0.5, "Insufficient data", ha="center", va="center",
                    transform=ax.transAxes, color="gray")
            continue

        common = sorted(set.intersection(*(set(data[l].index) for l in x_labels)))
        n_coarse = sum(1 for l in x_labels if l != "1K")
        x_pos = np.asarray([n_coarse + 0.7 if l == "1K" else float(i)
                            for i, l in enumerate(x_labels)])
        colors = ["#7f7f7f" if l == "1K" else BLUES[COARSE_CFGS.index(int(l))]
                  for l in x_labels]
        box_data = [data[l].loc[common].values for l in x_labels]

        bp = ax.boxplot(box_data, positions=x_pos, patch_artist=True, widths=0.5,
                        medianprops=dict(linewidth=1.5 * scale, color="black"),
                        flierprops=dict(marker="o", markersize=3 * scale, alpha=0.5))
        for patch, c in zip(bp["boxes"], colors):
            patch.set_facecolor(c)
            patch.set_alpha(0.7)
            patch.set_edgecolor("black")
        for subj in common:
            ax.plot(x_pos, [data[l].loc[subj] for l in x_labels], color="gray",
                    alpha=0.25, linewidth=0.8 * scale, zorder=1)
        jitter = np.random.default_rng(42)
        for i, l in enumerate(x_labels):
            y = data[l].loc[common].values
            ax.scatter(jitter.normal(x_pos[i], 0.06, len(y)), y, s=25 * scale,
                       c="white", edgecolors="black", linewidths=0.7 * scale,
                       zorder=3, alpha=0.9)

        ax.set_xticks(x_pos)
        ax.set_xticklabels(x_labels, fontweight="bold", fontsize=11 * scale)
        ax.set_xlabel("Number of Classes", fontsize=13 * scale)
        ax.set_ylabel(y_label, fontsize=13 * scale)
        ax.set_title(dcfg.get("region_labels", {}).get(region, region),
                     fontsize=15 * scale, fontweight="bold")
        all_vals = np.concatenate(box_data)
        yr = max(all_vals.max() - all_vals.min(), 1e-6)
        ax.set_ylim(all_vals.min() - 0.05 * yr, all_vals.max() + 0.15 * yr)
        ax.yaxis.grid(True, alpha=0.3, linewidth=0.5 * scale)
        ax.set_axisbelow(True)
        ax.set_xlim(-0.5, x_pos[-1] + 0.5)
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)

    analysis_label = "Encoding Score" if analysis == "encoding_score" else "RSA"
    fig.suptitle(
        f"Per-Subject Brain Alignment\n"
        f"({display}-PCA Labels, {dataset_label} {analysis_label})",
        fontsize=16 * scale, fontweight="bold", y=1.02,
    )
    plt.tight_layout(pad=1.0)
    out = f"{output_dir}/per_subject_{display.lower()}{dcfg.get('output_suffix', '')}.png"
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=200, bbox_inches="tight", facecolor="white")
    plt.close(fig)
    print(f"Saved -> {out}")
    return out
