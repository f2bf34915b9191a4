"""Fig-3 THINGS full-model vs coarse-model per-layer comparison.

Port of reference experiments/neurips_2025/fig3/full_vs_pcs_things.py:
per-layer RSA of untrained / 1000-way / each coarse granularity on the
THINGS behavioral benchmark, averaged over seeds. Uses the shared
plotters/plotter_utils split+average helpers and the figutils line
plot (Greens palette).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import pandas as pd

from experiments.neurips_2025.figutils import PCA_SIZES, layer_comparison_plot
from plotters.plotter_utils import avg_over_seed, split_and_select_df

LAYER_ORDER = ["conv1", "conv2", "conv3", "conv4", "conv5", "fc1", "fc2"]


def prepare_series(df, metric, layers, dataset=None):
    """(initial, final, {n: per-layer dict}) from the long frame."""
    pca_df, full_df = split_and_select_df(df, dataset=dataset, metric=metric,
                                          epoch=20, layers=layers)
    _, initial_df = split_and_select_df(df, dataset=dataset, metric=metric,
                                        epoch=0, layers=layers)
    pca_df, full_df, initial_df = (avg_over_seed(pca_df), avg_over_seed(full_df),
                                   avg_over_seed(initial_df))
    initial = dict(zip(initial_df["layer"], initial_df["score"]))
    final = dict(zip(full_df["layer"], full_df["score"]))
    pca = {
        n: dict(zip(sub["layer"], sub["score"]))
        for n, sub in pca_df.groupby("pca_n_classes")
    }
    return initial, final, pca


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", default="logs/full-vs-pcs_things.csv")
    parser.add_argument("--metric", default="Spearman")
    parser.add_argument("--out", default="plotters/fig3/full_vs_pcs_things.png")
    args = parser.parse_args(argv)

    df = pd.read_csv(args.csv)
    initial, final, pca = prepare_series(df, args.metric, LAYER_ORDER)
    pca = {n: v for n, v in pca.items() if n in PCA_SIZES}
    layer_comparison_plot(initial, final, pca, LAYER_ORDER, args.out,
                          ylabel=f"RSA ({args.metric})", colors="Greens")
    return args.out


if __name__ == "__main__":
    main()
