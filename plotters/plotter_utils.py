"""Results-DB query + aggregation helpers for figures.

Reference parity: plotters/plotter_utils.py:20-486 — best score per
(seed, subject) with dedup warnings, bootstrap-CI aggregation
(element-wise mean of per-run distributions → percentiles), coarseness
bar / per-subject figure builders.
"""
from __future__ import annotations

import json
import sqlite3
from pathlib import Path

import numpy as np
import pandas as pd

from plotters.plot_helpers import (  # noqa: F401  (re-exported style)
    COARSE_CFGS,
    FULL_CFG,
    PCA_MODELS,
    apply_style,
    bar_with_ci,
    coarseness_colors,
    save_figure,
)
from visreps_tpu.core.db import RESULTS_DB_PATH


def _connect(db_path=None):
    path = Path(db_path) if db_path else RESULTS_DB_PATH
    return sqlite3.connect(str(path))


def query_best_scores(
    neural_dataset: str,
    analysis: str = "rsa",
    compare_method: str = "spearman",
    region: str | None = None,
    checkpoint_dir: str | None = None,
    db_path=None,
) -> pd.DataFrame:
    """One row per (cfg_id, seed, subject): the stored best-layer score.

    Warns on duplicate (run identity) rows like the reference.
    """
    query = """SELECT run_id, cfg_id, seed, subject_idx, region, layer, score,
                      ci_low, ci_high, checkpoint_dir, model_name, epoch
               FROM results
               WHERE neural_dataset=? AND analysis=? AND compare_method=?"""
    params: list = [neural_dataset, analysis, compare_method]
    if region is not None:
        query += " AND region=?"
        params.append(region)
    if checkpoint_dir is not None:
        query += " AND checkpoint_dir=?"
        params.append(checkpoint_dir)

    conn = _connect(db_path)
    df = pd.read_sql_query(query, conn, params=params)
    conn.close()

    dup = df.duplicated(subset=["cfg_id", "seed", "subject_idx", "region", "epoch"], keep=False)
    if dup.any():
        print(f"WARNING: {int(dup.sum())} duplicate identity rows; keeping max score")
        df = (
            df.sort_values("score", ascending=False)
            .drop_duplicates(subset=["cfg_id", "seed", "subject_idx", "region", "epoch"])
        )
    return df


def get_bootstrap_ci(run_ids: list[str], compare_method: str = "spearman",
                     db_path=None) -> tuple[float, float]:
    """Aggregate bootstrap distributions across runs: element-wise mean
    of the per-run score vectors → 2.5/97.5 percentiles.

    Reference: plotters/plotter_utils.py:65-110.
    """
    conn = _connect(db_path)
    dists = []
    for rid in run_ids:
        row = conn.execute(
            "SELECT scores FROM bootstrap_distributions WHERE run_id=? AND compare_method=?",
            (rid, compare_method),
        ).fetchone()
        if row is not None:
            dists.append(np.asarray(json.loads(row[0]), np.float64))
    conn.close()
    if not dists:
        return float("nan"), float("nan")
    n = min(len(d) for d in dists)
    mean_dist = np.mean([d[:n] for d in dists], axis=0)
    return float(np.percentile(mean_dist, 2.5)), float(np.percentile(mean_dist, 97.5))


def coarseness_table(df: pd.DataFrame, cfgs=None) -> pd.DataFrame:
    """Mean score per coarseness level (across seeds and subjects)."""
    cfgs = cfgs or COARSE_CFGS
    rows = []
    for cfg in cfgs:
        sub = df[df.cfg_id == cfg]
        if sub.empty:
            continue
        rows.append({
            "cfg_id": cfg,
            "mean_score": sub.score.mean(),
            "sem_score": sub.score.std(ddof=1) / max(np.sqrt(len(sub)), 1),
            "n": len(sub),
            "run_ids": list(sub.run_id),
        })
    return pd.DataFrame(rows)


def plot_coarseness_bars(df: pd.DataFrame, out_path: str, ylabel: str = "RSA score",
                         title: str = "", compare_method: str = "spearman", db_path=None):
    """Score vs label granularity with aggregated bootstrap CIs."""
    import matplotlib.pyplot as plt

    table = coarseness_table(df)
    if table.empty:
        print("No rows to plot")
        return None
    cis = [get_bootstrap_ci(rids, compare_method, db_path) for rids in table["run_ids"]]
    ci_lo = [c[0] if np.isfinite(c[0]) else m - s for c, m, s in
             zip(cis, table["mean_score"], table["sem_score"])]
    ci_hi = [c[1] if np.isfinite(c[1]) else m + s for c, m, s in
             zip(cis, table["mean_score"], table["sem_score"])]

    fig, ax = plt.subplots(figsize=(5, 3.5))
    bar_with_ci(ax, list(table.cfg_id), list(table.mean_score), ci_lo, ci_hi)
    ax.set_xlabel("Number of classes", fontsize=11)
    apply_style(ax, ylabel=ylabel, title=title)
    save_figure(fig, out_path)
    return table


def plot_per_subject(df: pd.DataFrame, out_path: str, ylabel: str = "RSA score",
                     title: str = ""):
    """Per-subject score lines across coarseness levels."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5.5, 3.5))
    subjects = sorted(df.subject_idx.unique())
    colors = coarseness_colors(len(subjects))
    for color, subj in zip(colors, subjects):
        sub = df[df.subject_idx == subj].groupby("cfg_id").score.mean()
        ax.plot(range(len(sub)), sub.values, "o-", color=color, label=f"subj {subj}", lw=1.2)
        ax.set_xticks(range(len(sub)))
        ax.set_xticklabels([str(c) for c in sub.index])
    ax.set_xlabel("Number of classes", fontsize=11)
    ax.legend(fontsize=8, frameon=False, ncol=2)
    apply_style(ax, ylabel=ylabel, title=title)
    save_figure(fig, out_path)
