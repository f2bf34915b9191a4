"""Fig-4 NSD full-model vs coarse-model per-layer comparison.

Port of reference experiments/neurips_2025/fig4/full_vs_pcs_nsd.py:
the per-region variant of the per-layer comparison line plot (one
figure per region; Blues palette). Data prep shared with fig3 via
prepare_series; rendering via figutils.layer_comparison_plot.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import pandas as pd

from experiments.neurips_2025.fig3.full_vs_pcs_things import (
    LAYER_ORDER,
    prepare_series,
)
from experiments.neurips_2025.figutils import PCA_SIZES, layer_comparison_plot


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", default="logs/full-vs-pcs_nsd.csv")
    parser.add_argument("--metric", default="Spearman")
    parser.add_argument("--region", default="ventral visual stream")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    df = pd.read_csv(args.csv)
    df = df[df["region"].str.lower() == args.region.lower()]
    initial, final, pca = prepare_series(df, args.metric, LAYER_ORDER)
    pca = {n: v for n, v in pca.items() if n in PCA_SIZES}
    out = args.out or (
        f"plotters/fig4/full_vs_pcs_nsd_{args.region.lower().replace(' ', '_')}.png")
    layer_comparison_plot(initial, final, pca, LAYER_ORDER, out,
                          ylabel=f"RSA ({args.metric})", colors="Blues")
    return out


if __name__ == "__main__":
    main()
