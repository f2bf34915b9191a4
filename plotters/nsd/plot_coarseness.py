"""NSD coarseness figures (streams / finegrained ROI presets).

Reference parity: plotters/nsd/plot_coarseness.py.
"""
from __future__ import annotations

import argparse

from plotters.plotter_utils import plot_coarseness_bars, plot_per_subject, query_best_scores

PRESETS = {
    "streams": ["early visual stream", "ventral visual stream"],
    "finegrained": ["V1", "V2", "V3", "hV4", "FFA", "PPA"],
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", choices=list(PRESETS), default="streams")
    parser.add_argument("--analysis", default="rsa")
    parser.add_argument("--compare-method", default="spearman")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--out-dir", default="figures/nsd")
    parser.add_argument("--db", default=None)
    args = parser.parse_args(argv)

    ylabel = "RSA score" if args.analysis == "rsa" else "Encoding r"
    for region in PRESETS[args.preset]:
        df = query_best_scores(
            "nsd", analysis=args.analysis, compare_method=args.compare_method,
            region=region, checkpoint_dir=args.checkpoint_dir, db_path=args.db,
        )
        if df.empty:
            print(f"No rows for {region}")
            continue
        slug = region.replace(" ", "_")
        plot_coarseness_bars(
            df, f"{args.out_dir}/coarseness_{slug}.png",
            ylabel=ylabel, title=region, compare_method=args.compare_method, db_path=args.db,
        )
        plot_per_subject(df, f"{args.out_dir}/per_subject_{slug}.png", ylabel=ylabel, title=region)


if __name__ == "__main__":
    main()
