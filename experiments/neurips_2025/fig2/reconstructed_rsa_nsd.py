"""Fig-2 NSD reconstructed-RSA curve.

Port of reference experiments/neurips_2025/fig2/reconstructed_rsa_nsd.py:
RSA score of the 1000-way model reconstructed from its top-k PCs as a
function of k (per-seed curves averaged over subjects), against the
untrained-model and best-coarse-model horizontal bands, for one
(region, layer). Rendering via figutils.reconstructed_rsa_plot.
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


def _filter(df, region, layer, metric, **eq):
    m = (df["region"].str.lower() == region.lower()) \
        & (df["layer"].str.lower() == layer.lower()) \
        & (df["correlation"].str.lower() == metric.lower()
           if "correlation" in df else True)
    for col, val in eq.items():
        if col in df:
            m = m & (df[col] == val)
    return df[m]


def recon_matrix(df, region, layer, metric, max_k=20):
    """(n_seeds, max_k) per-seed curves, subjects averaged (ref :278-320)."""
    sub = _filter(df, region, layer, metric, reconstruct_from_pcs=True)
    by = sub.groupby(["seed", "pca_k"])["score"].mean().reset_index()
    pivot = by.pivot_table(index="seed", columns="pca_k", values="score")
    pivot = pivot.reindex(columns=range(1, max_k + 1))
    return pivot.to_numpy()


def baseline_band(df, region, layer, metric, **eq):
    """(mean, std) over seeds with subjects averaged within seed."""
    sub = _filter(df, region, layer, metric, **eq)
    if sub.empty:
        return None
    seed_means = sub.groupby("seed")["score"].mean()
    return float(seed_means.mean()), float(seed_means.std(ddof=0))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--recon_csv", default="logs/pc_reconstruction_analysis.csv")
    parser.add_argument("--baseline_csv", default="logs/full-vs-pcs_nsd.csv")
    parser.add_argument("--region", default="ventral visual stream")
    parser.add_argument("--layer", default="fc1")
    parser.add_argument("--metric", default="Spearman")
    parser.add_argument("--best_pc_n_classes", type=int, default=64)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    recon_df = pd.read_csv(args.recon_csv)
    recon = recon_matrix(recon_df, args.region, args.layer, args.metric)
    if np.isnan(recon).all():
        rprint("No reconstruction data for the requested slice.", style="error")
        return None

    base_df = pd.read_csv(args.baseline_csv)
    untrained = baseline_band(base_df, args.region, args.layer, args.metric,
                              epoch=0)
    best_pc = baseline_band(base_df, args.region, args.layer, args.metric,
                            epoch=20, pca_n_classes=args.best_pc_n_classes)
    out = args.out or (
        f"plotters/fig2/reconstructed_rsa_nsd_{args.region[:6]}.png")
    reconstructed_rsa_plot(recon, out, untrained=untrained, best_pc=best_pc,
                           best_pc_n_classes=args.best_pc_n_classes,
                           ylabel=f"RSA ({args.metric})")
    return out


if __name__ == "__main__":
    main()
