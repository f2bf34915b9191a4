"""Fig-2 NSD condition barplot.

Port of reference experiments/neurips_2025/fig2/bar_plot_nsd.py
(__main__ block): filter the long results CSV to one region, collapse
subjects per seed, assemble {condition: per-seed scores} for untrained
/ 2-64-class / 1000-class models, and render the rounded-bar figure
via figutils.condition_barplot.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import pandas as pd

from experiments.neurips_2025.figutils import (
    PCA_SIZES,
    assemble_conditions,
    condition_barplot,
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", default="logs/full-vs-pcs_nsd.csv")
    parser.add_argument("--pc_layer", default="conv4")
    parser.add_argument("--k1k_layer", default="conv3")
    parser.add_argument("--region", default="early visual stream")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    df = pd.read_csv(args.csv)
    df = df[df["region"].str.lower() == args.region.lower()]
    scores = assemble_conditions(df, args.pc_layer, args.k1k_layer, PCA_SIZES)
    out = args.out or (
        f"plotters/fig2/barplt_{args.pc_layer}_region_"
        f"{args.region.lower().replace(' ', '_')}.png")
    condition_barplot(scores, out)
    return scores


if __name__ == "__main__":
    main()
