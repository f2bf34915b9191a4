"""THINGS behavioral coarseness figures. Reference: plotters/things/plot_coarseness.py."""
from __future__ import annotations

import argparse

from plotters.plotter_utils import plot_coarseness_bars, query_best_scores


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--compare-method", default="spearman")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--out-dir", default="figures/things")
    parser.add_argument("--db", default=None)
    args = parser.parse_args(argv)

    df = query_best_scores(
        "things-behavior", analysis="rsa", compare_method=args.compare_method,
        checkpoint_dir=args.checkpoint_dir, db_path=args.db,
    )
    if df.empty:
        print("No rows for things-behavior")
        return
    plot_coarseness_bars(
        df, f"{args.out_dir}/coarseness_behavior.png",
        ylabel="Behavioral RSA", title="THINGS similarity embedding",
        compare_method=args.compare_method, db_path=args.db,
    )


if __name__ == "__main__":
    main()
