"""PC1-PC2 scatter + 1-D PC distributions, colored by coarse labels.

Port of reference experiments/pca_analysis/pca_visualization.py:
project source-model features onto precomputed eigenvectors (the
coarse-grain pipeline's eigenvectors npz), sample 5 % (seed 42), and
render (a) the PC1-PC2 scatter colored by the hierarchical class
labels, and (b) a 2x2 grid of 1-D densities along PC1-PC4.
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from visreps_tpu.core.logging import rprint

SEED = 42


def load_scores_and_labels(features_path: str, eigenvectors_path: str,
                           labels_csv: str, sample_fraction: float = 0.05,
                           n_pcs: int = 4, seed: int = SEED):
    """(sampled PC scores, sampled labels) — reference :22-52."""
    pca = np.load(eigenvectors_path)
    eigenvectors, mean = pca["eigenvectors"][:, :n_pcs], pca["mean"]

    data = np.load(features_path, allow_pickle=True)
    names = data["image_names"]
    if names.size and isinstance(names[0], (bytes, np.bytes_)):
        names = np.array([n.decode() for n in names])
    names = np.array([os.path.basename(str(n)) for n in names])
    for key in ("fc2", "clip_features", "features", "dreamsim_features"):
        if key in data:
            features = data[key].reshape(len(names), -1)
            break

    with open(labels_csv) as f:
        label_of = {r["image"]: int(r["pca_label"]) for r in csv.DictReader(f)}
    labels = np.array([label_of[n] for n in names])

    rng = np.random.RandomState(seed)
    n_samples = max(1, int(len(names) * sample_fraction))
    idx = rng.choice(len(names), n_samples, replace=False)
    scores = (features[idx] - mean) @ eigenvectors
    return scores, labels[idx]


def plot_scatter(scores, labels, n_classes, out_path, title_prefix="AlexNet fc2"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 8))
    colors = plt.cm.Spectral(np.linspace(0.05, 0.95, n_classes))
    for c in range(n_classes):
        m = labels == c
        ax.scatter(scores[m, 0], scores[m, 1], c=[colors[c]],
                   label=f"Class {c} (n={int(m.sum()):,})", alpha=0.6, s=10,
                   edgecolors="none")
    ax.set_xlabel("PC1"), ax.set_ylabel("PC2")
    ax.set_title(f"{title_prefix} Features on PC1-PC2 ({n_classes} hierarchical classes)")
    ax.legend(loc="best", fontsize=9, ncol=2 if n_classes > 4 else 1, framealpha=0.9)
    ax.grid(True, alpha=0.3, linestyle="--")
    ax.set_facecolor("#FAFAFA")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    plt.tight_layout()
    plt.savefig(out_path, dpi=300, bbox_inches="tight")
    plt.close(fig)
    rprint(f"Saved to {out_path}", style="success")


def plot_1d_distributions(scores, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    colors = ["#E24A33", "#348ABD", "#988ED5", "#8EBA42"]
    for i, ax in enumerate(axes.flat):
        ax.hist(scores[:, i], bins=80, alpha=0.7, color=colors[i], density=True)
        ax.set_xlabel(f"PC{i + 1}"), ax.set_ylabel("Density")
        ax.set_title(f"Distribution along PC{i + 1}")
        ax.grid(True, alpha=0.3, linestyle="--")
        ax.set_facecolor("#FAFAFA")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    plt.tight_layout()
    plt.savefig(out_path, dpi=300, bbox_inches="tight")
    plt.close(fig)
    rprint(f"Saved to {out_path}", style="success")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--features", default="datasets/obj_cls/imagenet/features_alexnet.npz")
    parser.add_argument("--eigenvectors", default="datasets/obj_cls/imagenet/eigenvectors_alexnet.npz")
    parser.add_argument("--labels_dir", default="pca_labels/pca_labels_alexnet_hierarchical")
    parser.add_argument("--n_classes", type=int, default=4)
    parser.add_argument("--sample_fraction", type=float, default=0.05)
    parser.add_argument("--out_dir", default="experiments/results")
    args = parser.parse_args(argv)

    labels_csv = os.path.join(args.labels_dir, f"n_classes_{args.n_classes}.csv")
    scores, labels = load_scores_and_labels(
        args.features, args.eigenvectors, labels_csv, args.sample_fraction)
    plot_scatter(scores, labels, args.n_classes,
                 os.path.join(args.out_dir, f"pca_pc1pc2_{args.n_classes}classes.png"))
    plot_1d_distributions(scores, os.path.join(args.out_dir, "pca_1d_distributions.png"))


if __name__ == "__main__":
    main()
