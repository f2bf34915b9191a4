"""Reconstruction-analysis figures: RSA vs pca_k with baselines.

Port of reference experiments/reconstruction_analysis/plot.py: from
results.db, plot best-layer RSA score against the number of retained
PCs for the 1000-way reconstruct_from_pcs runs, with two horizontal
baselines — the full (unreconstructed) 1000-way model and the best
coarse-grained model across every label source. One figure per neural
dataset: NSD (1x2 regions), TVSD (1x3), THINGS (single panel).
"""
from __future__ import annotations

import argparse
import sqlite3
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import pandas as pd

from visreps_tpu.core.logging import rprint

FIGURES_DIR = Path(__file__).resolve().parent / "figures"
CURVE_COLOR, TRAINED_COLOR, COARSE_COLOR = "#1f77b4", "#2ca02c", "#d62728"


def _read(db_path, query, params):
    conn = sqlite3.connect(str(db_path))
    df = pd.read_sql(query, conn, params=params)
    conn.close()
    return df


def query_reconstruction_curve(db_path, neural_dataset, region=None):
    """Best-layer score per (pca_k, seed, subject) for reconstruction runs."""
    q = """SELECT pca_k, seed, subject_idx, layer, score FROM results
           WHERE reconstruct_from_pcs = 1 AND cfg_id = 1000
             AND analysis = 'rsa' AND compare_method = 'spearman'
             AND neural_dataset = ?"""
    params = [neural_dataset]
    if region is not None:
        q += " AND region = ?"
        params.append(region)
    df = _read(db_path, q, params)
    if df.empty:
        return df
    idx = df.groupby(["pca_k", "seed", "subject_idx"])["score"].idxmax()
    return df.loc[idx].reset_index(drop=True)


def query_1000way_baseline(db_path, neural_dataset, region=None):
    """(mean, sem) of the unreconstructed 1000-way model across seeds."""
    q = """SELECT seed, subject_idx, layer, score FROM results
           WHERE cfg_id = 1000 AND reconstruct_from_pcs = 0
             AND analysis = 'rsa' AND compare_method = 'spearman'
             AND neural_dataset = ?"""
    params = [neural_dataset]
    if region is not None:
        q += " AND region = ?"
        params.append(region)
    df = _read(db_path, q, params)
    if df.empty:
        return np.nan, np.nan
    best = df.loc[df.groupby(["seed", "subject_idx"])["score"].idxmax()]
    seed_means = best.groupby("seed")["score"].mean()
    sem = seed_means.std() / np.sqrt(len(seed_means)) if len(seed_means) > 1 else 0.0
    return float(seed_means.mean()), float(sem)


def query_coarse_baseline(db_path, neural_dataset, region=None):
    """(mean, sem) of the best coarse model over all label sources."""
    q = """SELECT checkpoint_dir, cfg_id, seed, subject_idx, layer, score
           FROM results
           WHERE reconstruct_from_pcs = 0 AND pca_labels = 1
             AND cfg_id IN (2, 4, 8, 16, 32, 64)
             AND analysis = 'rsa' AND compare_method = 'spearman'
             AND neural_dataset = ?"""
    params = [neural_dataset]
    if region is not None:
        q += " AND region = ?"
        params.append(region)
    df = _read(db_path, q, params)
    if df.empty:
        return np.nan, np.nan
    best = df.loc[df.groupby(
        ["checkpoint_dir", "cfg_id", "seed", "subject_idx"])["score"].idxmax()]
    seed_means = best.groupby(
        ["checkpoint_dir", "cfg_id", "seed"])["score"].mean().reset_index()
    grand = seed_means.groupby(["checkpoint_dir", "cfg_id"])["score"].agg(
        ["mean", "std", "count"]).reset_index()
    grand["sem"] = grand["std"] / np.sqrt(grand["count"])
    row = grand.loc[grand["mean"].idxmax()]
    return float(row["mean"]), float(0.0 if np.isnan(row["sem"]) else row["sem"])


def aggregate_curve(df):
    """mean ± SEM across seeds, subjects averaged within seed first."""
    if df.empty:
        return pd.DataFrame(columns=["pca_k", "mean", "sem"])
    seed_means = df.groupby(["pca_k", "seed"])["score"].mean().reset_index()
    agg = seed_means.groupby("pca_k")["score"].agg(["mean", "std", "count"]).reset_index()
    agg["sem"] = (agg["std"] / np.sqrt(agg["count"])).fillna(0.0)
    return agg[["pca_k", "mean", "sem"]]


def plot_panel(ax, curve, trained, coarse, title, show_ylabel=True):
    from matplotlib.ticker import MaxNLocator

    k, mean, sem = curve["pca_k"].values, curve["mean"].values, curve["sem"].values
    ax.plot(k, mean, "-o", color=CURVE_COLOR, markersize=4, linewidth=1.5,
            label="1000-way (top-$k$ PCs)", zorder=3)
    ax.fill_between(k, mean - sem, mean + sem, color=CURVE_COLOR, alpha=0.15)
    t_mean, t_sem = trained
    if not np.isnan(t_mean):
        ax.axhline(t_mean, color=TRAINED_COLOR, linewidth=1.5,
                   label="1000-way (all dims)", zorder=1)
        if t_sem > 0:
            ax.axhspan(t_mean - t_sem, t_mean + t_sem, color=TRAINED_COLOR,
                       alpha=0.10, zorder=0)
    c_mean, c_sem = coarse
    if not np.isnan(c_mean):
        ax.axhline(c_mean, color=COARSE_COLOR, linestyle="--", linewidth=1.5,
                   label="Best coarse model", zorder=1)
        if c_sem > 0:
            ax.axhspan(c_mean - c_sem, c_mean + c_sem, color=COARSE_COLOR,
                       alpha=0.10, zorder=0)
    ax.set_xlabel("Number of PCs ($k$)")
    if show_ylabel:
        ax.set_ylabel("RSA Score (Spearman)")
    ax.set_title(title, fontweight="bold")
    ax.xaxis.set_major_locator(MaxNLocator(integer=True))


def plot_dataset(db_path, neural_dataset, regions, figsize, out_dir=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = Path(out_dir or FIGURES_DIR)
    out_dir.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(1, len(regions), figsize=figsize, squeeze=False)
    axes = axes.flatten()
    for i, (region, label) in enumerate(regions):
        agg = aggregate_curve(query_reconstruction_curve(db_path, neural_dataset, region))
        if agg.empty:
            axes[i].text(0.5, 0.5, "No data", ha="center", va="center",
                         transform=axes[i].transAxes)
            axes[i].set_title(label, fontweight="bold")
            continue
        plot_panel(axes[i], agg,
                   query_1000way_baseline(db_path, neural_dataset, region),
                   query_coarse_baseline(db_path, neural_dataset, region),
                   label, show_ylabel=(i == 0))
    handles, labels = axes[0].get_legend_handles_labels()
    if handles:
        fig.legend(handles, labels, loc="lower center", ncol=3,
                   bbox_to_anchor=(0.5, -0.02), frameon=True)
    for ax in axes:
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)
    plt.tight_layout(rect=[0, 0.06, 1, 1])
    out_path = out_dir / f"reconstruction_{neural_dataset}.png"
    plt.savefig(out_path, dpi=300, bbox_inches="tight", facecolor="white")
    plt.close(fig)
    rprint(f"Saved: {out_path}", style="success")
    return str(out_path)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--db", default="results.db")
    parser.add_argument("--out_dir", default=None)
    args = parser.parse_args(argv)
    plot_dataset(args.db, "nsd",
                 [("early visual stream", "Early Visual Stream"),
                  ("ventral visual stream", "Ventral Visual Stream")],
                 (8, 3.5), args.out_dir)
    plot_dataset(args.db, "tvsd", [("V1", "V1"), ("V4", "V4"), ("IT", "IT")],
                 (11, 3.5), args.out_dir)
    plot_dataset(args.db, "things-behavior", [("N/A", "THINGS Behavior")],
                 (4.5, 3.5), args.out_dir)


if __name__ == "__main__":
    main()
