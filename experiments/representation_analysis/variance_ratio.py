"""Within-class vs between-class variance ratio of representations.

Mirrors the reference's representation_analysis/variance_ratio.py:
per model, compute each class's mean distance to its centroid
(within) and the centroid distances from the global mean (between);
the between/within ratio measures cluster tightness. Renders the
box-plot figure and prints per-model stats.

Usage:
  python experiments/representation_analysis/variance_ratio.py \
      --features feats_a.npy feats_b.npy --labels labels.npy \
      --names "Pretrained (1000-way)" "32-way Trained" --out variance_ratio.png
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from visreps_tpu.core.logging import rprint


def variance_ratio_stats(features: np.ndarray, labels: np.ndarray) -> dict:
    """Within/between-class variance stats for one model's features.

    Reference: experiments/representation_analysis/variance_ratio.py:18-76.
    Returns {"within", "between", "ratio", "within_per_class"}.
    """
    classes = np.unique(labels)
    centroids = np.stack([features[labels == c].mean(axis=0) for c in classes])
    global_mean = features.mean(axis=0)

    within_per_class = [
        np.linalg.norm(features[labels == c] - centroids[i], axis=1)
        for i, c in enumerate(classes)
    ]
    between = float(np.mean(np.linalg.norm(centroids - global_mean, axis=1)))
    within = float(np.mean([w.mean() for w in within_per_class]))
    return {
        "within": within,
        "between": between,
        "ratio": between / within if within > 0 else 0.0,
        "within_per_class": within_per_class,
        "classes": classes,
    }


def plot_variance_ratio(stats_list, names, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(stats_list), figsize=(7 * len(stats_list), 5))
    if len(stats_list) == 1:
        axes = [axes]
    for ax, stats, name in zip(axes, stats_list, names):
        ax.boxplot(stats["within_per_class"],
                   tick_labels=[f"Class {c}" for c in stats["classes"]],
                   patch_artist=True)
        ax.set_xlabel("Class")
        ax.set_ylabel("Distance to Class Centroid")
        ax.set_title(f"{name}\nB/W Ratio: {stats['ratio']:.2f}", fontweight="bold")
        ax.set_facecolor("#FAFAFA")
    plt.suptitle("Cluster Tightness: Distance to Class Centroid", fontweight="bold")
    plt.tight_layout()
    plt.savefig(out_path, dpi=200, bbox_inches="tight", facecolor="white")
    plt.close(fig)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--features", nargs="+", required=True,
                        help=".npy feature arrays, one per model")
    parser.add_argument("--labels", required=True, help=".npy integer labels")
    parser.add_argument("--names", nargs="+", default=None)
    parser.add_argument("--out", default="variance_ratio.png")
    args = parser.parse_args(argv)

    labels = np.load(args.labels)
    names = args.names or [Path(f).stem for f in args.features]
    stats_list = []
    for path, name in zip(args.features, names):
        stats = variance_ratio_stats(np.load(path), labels)
        stats_list.append(stats)
        rprint(
            f"  {name}: Within={stats['within']:.2f}, Between={stats['between']:.2f}, "
            f"Ratio={stats['ratio']:.2f}",
            style="highlight",
        )
    plot_variance_ratio(stats_list, names, args.out)
    rprint(f"Saved: {args.out}", style="success")
    return stats_list


if __name__ == "__main__":
    main()
