"""NSD-Synthetic (OOD) coarseness figures.

Reference: plotters/nsd_synthetic/plot_coarseness.py.
"""
from __future__ import annotations

import argparse

from plotters.plotter_utils import plot_coarseness_bars, plot_per_subject, query_best_scores

REGIONS = ["early visual stream", "ventral visual stream"]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--compare-method", default="spearman")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--out-dir", default="figures/nsd_synthetic")
    parser.add_argument("--db", default=None)
    args = parser.parse_args(argv)

    for region in REGIONS:
        df = query_best_scores(
            "nsd_synthetic", analysis="rsa", compare_method=args.compare_method,
            region=region, checkpoint_dir=args.checkpoint_dir, db_path=args.db,
        )
        if df.empty:
            print(f"No rows for {region}")
            continue
        slug = region.replace(" ", "_")
        plot_coarseness_bars(
            df, f"{args.out_dir}/coarseness_{slug}.png",
            ylabel="RSA score (OOD)", title=f"NSD-Synthetic {region}",
            compare_method=args.compare_method, db_path=args.db,
        )
        plot_per_subject(df, f"{args.out_dir}/per_subject_{slug}.png",
                         ylabel="RSA score (OOD)", title=f"NSD-Synthetic {region}")


if __name__ == "__main__":
    main()
