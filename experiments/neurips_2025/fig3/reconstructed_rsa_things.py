"""Fig-3 THINGS reconstructed-RSA curve.

Port of reference experiments/neurips_2025/fig3/reconstructed_rsa_things.py:
same curve-vs-baselines figure as fig2's NSD version on the THINGS
behavioral results (no region dimension).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import numpy as np
import pandas as pd

from experiments.neurips_2025.figutils import reconstructed_rsa_plot
from visreps_tpu.core.logging import rprint


def _layer_metric(df, layer, metric):
    m = df["layer"].str.lower() == layer.lower()
    if "correlation" in df:
        m = m & (df["correlation"].str.lower() == metric.lower())
    return df[m]


def recon_matrix(df, layer, metric, max_k=20):
    sub = _layer_metric(df[df.get("reconstruct_from_pcs", True) == True], layer, metric)  # noqa: E712
    by = sub.groupby(["seed", "pca_k"])["score"].mean().reset_index()
    pivot = by.pivot_table(index="seed", columns="pca_k", values="score")
    return pivot.reindex(columns=range(1, max_k + 1)).to_numpy()


def baseline_band(df, layer, metric, **eq):
    sub = _layer_metric(df, layer, metric)
    for col, val in eq.items():
        if col in sub:
            sub = sub[sub[col] == val]
    if sub.empty:
        return None
    seed_means = sub.groupby("seed")["score"].mean()
    return float(seed_means.mean()), float(seed_means.std(ddof=0))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--recon_csv", default="logs/pc_reconstruction_things.csv")
    parser.add_argument("--baseline_csv", default="logs/full-vs-pcs_things.csv")
    parser.add_argument("--layer", default="fc2")
    parser.add_argument("--metric", default="Spearman")
    parser.add_argument("--best_pc_n_classes", type=int, default=64)
    parser.add_argument("--out", default="plotters/fig3/reconstructed_rsa_things.png")
    args = parser.parse_args(argv)

    recon = recon_matrix(pd.read_csv(args.recon_csv), args.layer, args.metric)
    if np.isnan(recon).all():
        rprint("No reconstruction data for the requested slice.", style="error")
        return None
    base_df = pd.read_csv(args.baseline_csv)
    reconstructed_rsa_plot(
        recon, args.out,
        untrained=baseline_band(base_df, args.layer, args.metric, epoch=0),
        best_pc=baseline_band(base_df, args.layer, args.metric, epoch=20,
                              pca_n_classes=args.best_pc_n_classes),
        best_pc_n_classes=args.best_pc_n_classes,
        ylabel=f"RSA ({args.metric})")
    return args.out


if __name__ == "__main__":
    main()
