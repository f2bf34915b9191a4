"""Architecture comparison figure (AlexNet/VGG/ResNet/ViT model zoo).

Reference parity: plotters/plot_architectures.py.
"""
from __future__ import annotations

import argparse

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from plotters.plot_helpers import apply_style, coarseness_colors, save_figure
from plotters.plotter_utils import query_best_scores


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--neural-dataset", default="nsd")
    parser.add_argument("--region", default="ventral visual stream")
    parser.add_argument("--analysis", default="rsa")
    parser.add_argument("--compare-method", default="spearman")
    parser.add_argument("--models", nargs="*",
                        default=["AlexNet", "VGG16", "ResNet18", "ResNet50", "ViTBase"])
    parser.add_argument("--out", default="figures/architectures.png")
    parser.add_argument("--db", default=None)
    args = parser.parse_args(argv)

    df = query_best_scores(
        args.neural_dataset, analysis=args.analysis,
        compare_method=args.compare_method, region=args.region, db_path=args.db,
    )
    fig, ax = plt.subplots(figsize=(5.5, 3.5))
    colors = coarseness_colors(len(args.models))
    means, labels = [], []
    for model in args.models:
        sub = df[df.model_name == model]
        if sub.empty:
            continue
        means.append(sub.score.mean())
        labels.append(model)
    ax.bar(range(len(means)), means, color=colors[: len(means)], edgecolor="black", lw=0.6)
    ax.set_xticks(range(len(labels)))
    ax.set_xticklabels(labels, rotation=30, ha="right")
    apply_style(ax, ylabel="Alignment score", title=f"{args.neural_dataset} {args.region}")
    save_figure(fig, args.out)


if __name__ == "__main__":
    main()
