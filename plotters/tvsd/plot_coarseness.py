"""TVSD (macaque) coarseness figures. Reference: plotters/tvsd/plot_coarseness.py."""
from __future__ import annotations

import argparse

from plotters.plotter_utils import plot_coarseness_bars, plot_per_subject, query_best_scores

REGIONS = ["V1", "V4", "IT"]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--analysis", default="rsa")
    parser.add_argument("--compare-method", default="spearman")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--out-dir", default="figures/tvsd")
    parser.add_argument("--db", default=None)
    args = parser.parse_args(argv)

    ylabel = "RSA score" if args.analysis == "rsa" else "Encoding r"
    for region in REGIONS:
        df = query_best_scores(
            "tvsd", analysis=args.analysis, compare_method=args.compare_method,
            region=region, checkpoint_dir=args.checkpoint_dir, db_path=args.db,
        )
        if df.empty:
            print(f"No rows for {region}")
            continue
        plot_coarseness_bars(
            df, f"{args.out_dir}/coarseness_{region}.png",
            ylabel=ylabel, title=f"TVSD {region}",
            compare_method=args.compare_method, db_path=args.db,
        )
        plot_per_subject(df, f"{args.out_dir}/per_subject_{region}.png",
                         ylabel=ylabel, title=f"TVSD {region}")


if __name__ == "__main__":
    main()
