"""Class-size distribution figure for a PCA-label CSV.

Mirrors the reference's pca_analysis/visualize_class_distribution.py:
log-binned histogram of images-per-class plus top-N / bottom-N bar
panels, with the summary line (classes, images, median, range).

Usage:
  python experiments/pca_analysis/visualize_class_distribution.py \
      --labels pca_labels/pca_labels_alexnet/n_classes_4096.csv \
      --out class_distribution.png
"""
from __future__ import annotations

import argparse
import csv
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from visreps_tpu.core.logging import rprint


def class_counts_from_csv(path: str) -> np.ndarray:
    with open(path) as f:
        reader = csv.DictReader(f)
        counts = Counter(row["pca_label"] for row in reader)
    return np.asarray(sorted(counts.values(), reverse=True))


def plot_distribution(class_counts: np.ndarray, out_path: str, n_show: int = 16):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_classes = len(class_counts)
    n_images = int(class_counts.sum())
    n_show = max(1, min(n_show, n_classes // 2 or 1))
    top_n = class_counts[:n_show]
    bottom_n = class_counts[-n_show:]

    fig, axes = plt.subplots(1, 3, figsize=(16, 5),
                             gridspec_kw={"width_ratios": [1.2, 1, 1]})

    ax = axes[0]
    log_min = np.floor(np.log10(max(class_counts.min(), 1)))
    log_max = np.ceil(np.log10(class_counts.max()))
    bins = np.logspace(log_min, max(log_max, log_min + 1), 25)
    ax.hist(class_counts, bins=bins, edgecolor="white", linewidth=0.8,
            alpha=0.9, color="#6b7280")
    ax.set_xscale("log")
    ax.set_xlabel("Images per class")
    ax.set_ylabel("Number of classes")
    ax.set_title("Class Size Distribution", fontweight="bold")

    for ax, vals, cmap, title in (
        (axes[1], top_n, plt.cm.Oranges, f"Top {n_show} Classes"),
        (axes[2], bottom_n, plt.cm.Blues, f"Bottom {n_show} Classes"),
    ):
        colors = cmap(np.linspace(0.4, 0.9, len(vals)))[::-1]
        ax.bar(range(len(vals)), vals, color=colors, edgecolor="white", linewidth=0.5)
        ax.set_xlabel("Rank")
        ax.set_ylabel("Number of images")
        ax.set_title(title, fontweight="bold")

    fig.suptitle(
        f"{n_classes:,} classes  ·  {n_images:,} images  ·  "
        f"Median: {np.median(class_counts):.0f}  ·  "
        f"Range: {class_counts.min()}-{class_counts.max()}",
        fontsize=10, color="#555", y=0.02,
    )
    plt.tight_layout(rect=[0, 0.05, 1, 1])
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out_path, dpi=150, facecolor="white", bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--labels", required=True, help="pca labels CSV (image,pca_label)")
    parser.add_argument("--out", default="class_distribution.png")
    parser.add_argument("--n-show", type=int, default=16)
    args = parser.parse_args(argv)

    counts = class_counts_from_csv(args.labels)
    plot_distribution(counts, args.out, args.n_show)
    rprint(
        f"{len(counts)} classes, {counts.sum()} images, median {np.median(counts):.0f} "
        f"-> {args.out}",
        style="success",
    )
    return counts


if __name__ == "__main__":
    main()
