"""Fig-3 THINGS condition barplot.

Port of reference experiments/neurips_2025/fig3/bar_plot_things.py:
same rounded-bar condition figure as fig2's NSD version, but on the
THINGS behavioral results (no region dimension; scores already one row
per seed). Rendering via figutils.condition_barplot (Greens palette to
match the THINGS panels).
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
    parser.add_argument("--csv", default="logs/full-vs-pcs_things.csv")
    parser.add_argument("--pc_layer", default="fc2")
    parser.add_argument("--k1k_layer", default="fc2")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    df = pd.read_csv(args.csv)
    scores = assemble_conditions(df, args.pc_layer, args.k1k_layer, PCA_SIZES)
    out = args.out or f"plotters/fig3/barplt_things_{args.pc_layer}.png"
    condition_barplot(scores, out, ylabel="Behavioral Similarity (RSA)",
                      palette_name="Greens")
    return scores


if __name__ == "__main__":
    main()
