"""Results-DB query + aggregation helpers for figures.

Reference parity: plotters/plotter_utils.py — best score per
(seed, subject) filtered by (region, pca_labels_folder, cfg_id) and
excluding PC-reconstruction rows; bootstrap-CI aggregation
(element-wise mean of per-run distributions → percentiles) with SEM
fallback; subject/seed averaging helpers; split/select utilities; the
grouped architecture bar plot with 1K-baseline line and paired t-test
stars.
"""
from __future__ import annotations

import json
import sqlite3
from pathlib import Path
from typing import List, Optional

import numpy as np
import pandas as pd

from visreps_tpu.core.db import RESULTS_DB_PATH


def _connect(db_path=None):
    path = Path(db_path) if db_path else RESULTS_DB_PATH
    return sqlite3.connect(str(path))


# ──────────────────────────── queries ────────────────────────────
def query_best_scores(neural_dataset, region, pca_labels_folder, cfg_id,
                      compare_method: str = "spearman", epoch=None,
                      analysis: str = "rsa", db_path=None) -> pd.DataFrame:
    """Best-layer score per (seed, subject) for ONE condition.

    Reference: plotters/plotter_utils.py:21-62 — filters by region,
    pca_labels_folder and cfg_id, excludes reconstruct_from_pcs rows,
    warns on duplicate (seed, subject) rows and keeps the max score.
    """
    q = """SELECT run_id, seed, subject_idx, layer, score
           FROM results
           WHERE neural_dataset = ? AND region = ? AND pca_labels_folder = ?
             AND cfg_id = ? AND compare_method = ? AND analysis = ?
             AND reconstruct_from_pcs = 0"""
    params: list = [neural_dataset, region, pca_labels_folder, str(cfg_id),
                    compare_method, analysis]
    if epoch is not None:
        q += " AND epoch = ?"
        params.append(str(epoch))
    conn = _connect(db_path)
    df = pd.read_sql_query(q, conn, params=params)
    conn.close()
    if df.empty:
        return df

    counts = df.groupby(["seed", "subject_idx"]).size()
    dupes = counts[counts > 1]
    for (seed, subj), n in dupes.items():
        print(f"WARNING: {n} duplicate rows for seed={seed}, subject_idx={subj} "
              f"({neural_dataset}, {region}, {pca_labels_folder}, cfg_id={cfg_id}) "
              "- keeping highest score")
    idx = df.groupby(["seed", "subject_idx"])["score"].idxmax()
    return df.loc[idx].reset_index(drop=True)


def query_scores(neural_dataset, analysis: str = "rsa",
                 compare_method: str = "spearman", region: str | None = None,
                 checkpoint_dir: str | None = None, db_path=None) -> pd.DataFrame:
    """Broad row dump (one row per stored result) for ad-hoc figures."""
    q = """SELECT run_id, cfg_id, seed, subject_idx, region, layer, score,
                  ci_low, ci_high, checkpoint_dir, model_name, epoch,
                  pca_labels, pca_n_classes, pca_labels_folder,
                  reconstruct_from_pcs, pca_k, neural_dataset
           FROM results WHERE neural_dataset=? AND analysis=? AND compare_method=?"""
    params: list = [neural_dataset, analysis, compare_method]
    if region is not None:
        q += " AND region=?"
        params.append(region)
    if checkpoint_dir is not None:
        q += " AND checkpoint_dir=?"
        params.append(checkpoint_dir)
    conn = _connect(db_path)
    df = pd.read_sql_query(q, conn, params=params)
    conn.close()
    return df


def get_bootstrap_ci(run_ids, compare_method: str = "spearman",
                     alpha: float = 0.05, db_path=None):
    """(mean, ci_low, ci_high) from the element-wise mean of the runs'
    bootstrap distributions. Reference: plotter_utils.py:65-110."""
    if not run_ids:
        return np.nan, np.nan, np.nan
    conn = _connect(db_path)
    placeholders = ",".join("?" for _ in run_ids)
    rows = conn.execute(
        f"SELECT scores FROM bootstrap_distributions "
        f"WHERE run_id IN ({placeholders}) AND compare_method = ?",
        list(run_ids) + [compare_method],
    ).fetchall()
    conn.close()
    if not rows:
        return np.nan, np.nan, np.nan
    arrays = [np.asarray(json.loads(r[0]), np.float64) for r in rows]
    n = min(len(a) for a in arrays)
    mean_dist = np.mean([a[:n] for a in arrays], axis=0)
    return (float(np.mean(mean_dist)),
            float(np.percentile(mean_dist, 100 * alpha / 2)),
            float(np.percentile(mean_dist, 100 * (1 - alpha / 2))))


def get_condition_summary(neural_dataset, region, pca_labels_folder, cfg_id,
                          compare_method: str = "spearman", epoch=None,
                          analysis: str = "rsa", db_path=None) -> dict:
    """Point estimate + 95% CI for one condition, with SEM fallback
    when bootstrap distributions are missing or don't bracket the mean.

    Reference: plotter_utils.py:113-150.
    """
    df = query_best_scores(neural_dataset, region, pca_labels_folder, cfg_id,
                           compare_method, epoch, analysis, db_path)
    if df.empty:
        return {"mean": np.nan, "ci_low": np.nan, "ci_high": np.nan,
                "n_runs": 0, "run_ids": []}
    run_ids = df["run_id"].tolist()
    mean_score = float(df["score"].mean())
    _, ci_low, ci_high = get_bootstrap_ci(run_ids, compare_method, db_path=db_path)
    if np.isnan(ci_low) or ci_low > mean_score or ci_high < mean_score:
        seed_means = df.groupby("seed")["score"].mean()
        if len(seed_means) > 1:
            sem = seed_means.std() / np.sqrt(len(seed_means))
            ci_low, ci_high = mean_score - 1.96 * sem, mean_score + 1.96 * sem
        else:
            ci_low = ci_high = np.nan
    return {"mean": mean_score, "ci_low": ci_low, "ci_high": ci_high,
            "n_runs": len(df), "run_ids": run_ids}


def get_subject_scores(neural_dataset, region, pca_labels_folder, cfg_id,
                       compare_method: str = "spearman", epoch=None,
                       analysis: str = "rsa", db_path=None) -> pd.Series:
    """Per-subject mean score across seeds. Reference: 153-166."""
    df = query_best_scores(neural_dataset, region, pca_labels_folder, cfg_id,
                           compare_method, epoch, analysis, db_path)
    if df.empty:
        return pd.Series(dtype=float)
    return df.groupby("subject_idx")["score"].mean()


# ─────────────────── frame reshaping utilities ───────────────────
_SKIP_ALWAYS = {"log_interval", "checkpoint_interval", "cfg_id", "score"}
_PCA_COLS = ("pca_labels", "pca_n_classes")


def _avg_over(df: pd.DataFrame, collapse: str, retain: str) -> pd.DataFrame:
    if df.empty or collapse not in df:
        return df.copy()
    d = df.copy()
    d[collapse] = pd.to_numeric(d[collapse], errors="coerce")
    d = d.dropna(subset=[collapse])
    if d.empty:
        return d
    group_cols = [c for c in d.columns if c not in (_SKIP_ALWAYS | {collapse})]
    out = d.groupby(group_cols, dropna=False, observed=False)["score"].mean().reset_index()
    keep = ["layer", "score"]
    if retain in out.columns and not out[retain].isna().all():
        keep.append(retain)
    keep += [c for c in _PCA_COLS if c in out.columns]
    return out[[c for c in keep if c in out.columns]]


def avg_over_subject_idx(df: pd.DataFrame) -> pd.DataFrame:
    """Collapse subject_idx; keep seed + PCA columns. Reference: 176-203."""
    return _avg_over(df, "subject_idx", "seed")


def avg_over_seed(df: pd.DataFrame) -> pd.DataFrame:
    """Collapse seed; keep subject_idx + PCA columns. Reference: 206-236."""
    return _avg_over(df, "seed", "subject_idx")


def avg_over_subject_idx_seed(df: pd.DataFrame) -> pd.DataFrame:
    return avg_over_seed(avg_over_subject_idx(df))


def split_and_select_df(df: pd.DataFrame, *, epoch=None, dataset=None,
                        metric=None, region=None,
                        subject_idx: Optional[List[int]] = None,
                        layers: Optional[List[str]] = None,
                        pca_n_classes: Optional[List[int]] = None,
                        reconstruct_from_pcs: Optional[bool] = None,
                        pca_k: Optional[int] = None):
    """(pca_df, full_df) after optional filters. Reference: 247-300."""
    mask = pd.Series(True, index=df.index)
    if dataset is not None:
        mask &= df["neural_dataset"].str.lower() == dataset.lower()
    if metric is not None and "compare_method" in df:
        mask &= df["compare_method"] == metric
    if region is not None:
        mask &= df["region"] == region
    if epoch is not None:
        mask &= df["epoch"].astype(str) == str(epoch)
    if subject_idx is not None:
        mask &= df["subject_idx"].astype(str).isin([str(s) for s in subject_idx])
    if layers is not None:
        mask &= df["layer"].isin(layers)
    if pca_n_classes is not None:
        mask &= df["pca_n_classes"].isin(pca_n_classes)
    if reconstruct_from_pcs is not None:
        mask &= df["reconstruct_from_pcs"].astype(int) == int(reconstruct_from_pcs)
    if pca_k is not None:
        mask &= df["pca_k"] == pca_k
    filt = df[mask].copy()
    flag = filt["pca_labels"].astype(str).str.lower()
    return filt[flag.isin(("true", "1"))].copy(), filt[flag.isin(("false", "0"))].copy()


def get_best_layer_scores(df: pd.DataFrame, group_cols: List[str]) -> dict:
    """group_key → (scores, best_layer by mean). Reference: 306-337."""
    result = {}
    for group_vals, group_df in df.groupby(group_cols):
        if len(group_cols) == 1 and isinstance(group_vals, tuple):
            group_vals = group_vals[0]
        layer_means = group_df.groupby("layer")["score"].mean()
        best_layer = layer_means.idxmax()
        result[group_vals] = (
            group_df[group_df["layer"] == best_layer]["score"].tolist(), best_layer)
    return result


# ─────────────── architecture comparison bar plot ────────────────
def plot_brain_score_barplot(scores_by_arch_class: dict, pca_classes, architectures,
                             region_name: str, out_png: str,
                             enable_significance: bool = True,
                             ylabel: str = "Brain Similarity (RSA)"):
    """Grouped bars per (architecture, n_classes) with a dashed
    ImageNet-1K baseline line and paired-t-test stars vs the baseline.

    Reference: plotter_utils.py:343-486.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.lines as mlines
    import matplotlib.patches as mpatches
    import matplotlib.pyplot as plt
    from scipy import stats

    color_map = {"alexnet": "#1f77b4", "vit": "#ee854a", "dino": "#ff7f0e",
                 "clip": "#2d7f2d", "dreamsim": "#9467bd"}
    fig, ax = plt.subplots(figsize=(14, 5.5))

    n_archs = len(architectures)
    bar_w, intra, gap = 0.24, 0.04, 0.30
    scores_1k = scores_by_arch_class.get(("1K", None))

    tick_pos = []
    for i, n_cls in enumerate(pca_classes):
        base = i * (n_archs * bar_w + (n_archs - 1) * intra + gap)
        for ai, arch in enumerate(architectures):
            key = (arch, n_cls)
            if key not in scores_by_arch_class:
                continue
            scores = scores_by_arch_class[key]
            pos = base + ai * (bar_w + intra)
            ax.bar(pos + bar_w / 2, np.mean(scores), width=bar_w,
                   color=color_map.get(arch, "#888888"), edgecolor="black",
                   linewidth=0.9, zorder=3)
            if (enable_significance and scores_1k is not None
                    and len(scores) == len(scores_1k) and len(scores) > 1):
                _, p = stats.ttest_rel(scores, scores_1k)
                if p < 0.01:
                    ax.text(pos + bar_w / 2, 0.01, "*", ha="center", va="bottom",
                            fontsize=16, fontweight="bold", color="white", zorder=4)
        width = n_archs * bar_w + (n_archs - 1) * intra
        tick_pos.append(base + width / 2)

    if scores_1k is not None:
        ax.axhline(np.mean(scores_1k), color="#666666", linestyle="--",
                   linewidth=2.0, alpha=0.9, zorder=2)

    ax.set_xticks(tick_pos)
    ax.set_xticklabels([str(c) for c in pca_classes], fontweight="bold")
    ax.set_ylabel(ylabel, fontsize=13)
    ax.set_title(region_name.title(), fontsize=15, fontweight="bold")

    handles = [mpatches.Patch(facecolor=color_map.get(a, "#888888"),
                              edgecolor="black", label=f"{a} classes")
               for a in architectures]
    handles.append(mlines.Line2D([], [], color="#666666", linestyle="--",
                                 linewidth=2.0, label="ImageNet-1K"))
    ax.legend(handles=handles, loc="center left", bbox_to_anchor=(1, 0.5),
              frameon=True, fontsize=10)
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)
    plt.tight_layout(rect=[0, 0, 0.86, 1])
    Path(out_png).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out_png, dpi=300, bbox_inches="tight", facecolor="white")
    plt.close(fig)
    print(f"Plot saved -> {out_png}")
