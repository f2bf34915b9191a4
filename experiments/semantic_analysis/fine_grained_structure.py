"""Fine-grained structure within animals: 2-D embedding by synset.

Port of reference experiments/semantic_analysis/fine_grained_structure.py:
restrict to animal images (semantic label 0), embed each model's
L2-normalized features in 2-D, and color by the 15 most common synsets
to show whether fine-grained distinctions survive coarse training.

Embedding backend: umap when installed, sklearn t-SNE fallback
(utils.embed_2d) — this environment ships no umap.
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from experiments.representation_analysis.utils import (
    MODEL_NAMES,
    SEED,
    embed_2d,
    ensure_output_dir,
    load_feature_npz,
)
from visreps_tpu.core.logging import rprint


def analyze_fine_grained_structure(feats_list, sem_labels, synsets,
                                   output_path, model_names=None,
                                   animal_label: int = 0, top_k: int = 15,
                                   min_images: int = 50):
    """Embed animal-only features per model, colored by top synsets.

    Reference: fine_grained_structure.py:22-100. Returns n_animals.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    model_names = model_names or MODEL_NAMES
    animal_mask = sem_labels == animal_label
    n_animals = int(animal_mask.sum())
    rprint(f"  Animals: {n_animals} images", style="info")
    if n_animals < min_images:
        rprint("  Not enough animal images for an embedding", style="warning")
        return n_animals

    animal_synsets = synsets[animal_mask]
    unique, counts = np.unique(animal_synsets, return_counts=True)
    top = unique[np.argsort(counts)[::-1][:top_k]]
    color_of = {s: i for i, s in enumerate(top)}
    cmap = plt.cm.tab20(np.linspace(0, 1, 20))

    fig, axes = plt.subplots(1, len(feats_list),
                             figsize=(8 * len(feats_list), 7), squeeze=False)
    method_name = "2D"
    for ax, feats, name in zip(axes[0], feats_list, model_names):
        fa = feats[animal_mask]
        fa = fa / np.maximum(np.linalg.norm(fa, axis=1, keepdims=True), 1e-8)
        coords, method_name = embed_2d(fa, seed=SEED)
        for s in top:
            m = animal_synsets == s
            ax.scatter(coords[m, 0], coords[m, 1], c=[cmap[color_of[s]]],
                       alpha=0.6, s=15, label=str(s)[:10])
        other = ~np.isin(animal_synsets, top)
        ax.scatter(coords[other, 0], coords[other, 1], c="lightgray",
                   alpha=0.3, s=5, label="other")
        ax.set_xlabel(f"{method_name} 1")
        ax.set_ylabel(f"{method_name} 2")
        ax.set_title(name, fontweight="bold")
        ax.set_facecolor("#FAFAFA")

    handles, labels = axes[0][0].get_legend_handles_labels()
    fig.legend(handles[:top_k], labels[:top_k], loc="center right",
               bbox_to_anchor=(1.12, 0.5), fontsize=8, title="Synset (Animal)")
    plt.suptitle(
        f"Fine-Grained Structure Within Animals (top {top_k} synsets)",
        fontweight="bold")
    plt.tight_layout(rect=[0, 0, 0.88, 1])
    plt.savefig(output_path, dpi=200, bbox_inches="tight", facecolor="white")
    plt.close(fig)
    rprint(f"Saved: {output_path}", style="success")
    return n_animals


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--features", nargs="+", required=True,
                        help="npz per model: {<layer>: feats, labels}")
    parser.add_argument("--layer", default="fc2")
    parser.add_argument("--sem_labels", required=True, help=".npy of semantic labels")
    parser.add_argument("--synsets", required=True, help=".npy of synset ids")
    parser.add_argument("--names", nargs="+", default=None)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    np.random.seed(SEED)
    feats_list = [load_feature_npz(p)[0][args.layer] for p in args.features]
    sem_labels = np.load(args.sem_labels)
    synsets = np.load(args.synsets, allow_pickle=True)
    out = args.out or os.path.join(ensure_output_dir(), "fine_grained_animals.png")
    analyze_fine_grained_structure(feats_list, sem_labels, synsets, out,
                                   model_names=args.names)


if __name__ == "__main__":
    main()
