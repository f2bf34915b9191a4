"""PC1-PC2 quadrant comparison: pretrained vs coarse-trained AlexNet.

Port of reference experiments/representation_analysis/2pcs_compare/
{run_analysis.py,plot.py}: extract conv4/fc1/fc2 (conv pooled 3x3, all
L2-normalized), PCA each model's features to 2 PCs, assign 4 quadrant
classes by median splits of the PRETRAINED PCs, align the trained PCs
(sign/order, 8 configurations scored against the expected quadrant
layout), save an npz, and render the side-by-side quadrant scatter.

TPU redesign: one jitted multi-tap pooled extraction per batch
(utils.make_pooled_extractor); PCA runs as a device eigh on the d x d
covariance with f32 accumulation.
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax.numpy as jnp

from experiments.representation_analysis.utils import (
    extract_pooled_layers,
    load_feature_npz,
    load_models_pair,
)
from visreps_tpu.core.logging import rprint

SCRIPT_DIR = str(Path(__file__).resolve().parent)
LAYERS = ["conv4", "fc1", "fc2"]
LAYER_LABELS = {"conv4": "Conv4", "fc1": "FC1", "fc2": "FC2"}


def compute_pca(features: np.ndarray, n_pcs: int = 2):
    """(projections, % variance) via device eigh on the covariance.

    Reference: 2pcs_compare/run_analysis.py:100-109.
    """
    x = jnp.asarray(features, jnp.float32)
    mean = x.mean(axis=0)
    centered = x - mean
    cov = centered.T @ centered / (x.shape[0] - 1)
    eigval, eigvec = jnp.linalg.eigh(cov)
    idx = jnp.argsort(eigval)[::-1][:n_pcs]
    var_explained = eigval[idx] / eigval.sum() * 100.0
    return np.asarray(centered @ eigvec[:, idx]), np.asarray(var_explained)


def assign_quadrants(pc1: np.ndarray, pc2: np.ndarray):
    """4 quadrant classes via median splits (run_analysis.py:112-124)."""
    pc1_med, pc2_med = np.median(pc1), np.median(pc2)
    q = np.zeros(len(pc1), dtype=int)
    q[(pc1 <= pc1_med) & (pc2 > pc2_med)] = 1
    q[(pc1 > pc1_med) & (pc2 <= pc2_med)] = 2
    q[(pc1 > pc1_med) & (pc2 > pc2_med)] = 3
    return q, pc1_med, pc2_med


def align_pcs(trained_pcs: np.ndarray, trained_var: np.ndarray,
              quadrants: np.ndarray):
    """Resolve PCA sign/order ambiguity against the pretrained quadrant
    layout (Q0 lower-left ... Q3 upper-right): score all 8 swap x sign
    configurations by centroid agreement. Reference:
    run_analysis.py:127-171."""
    expected = np.array([[-1, -1], [-1, 1], [1, -1], [1, 1]], float)
    centroids = np.stack([trained_pcs[quadrants == q].mean(axis=0) for q in range(4)])

    best, best_cfg = -np.inf, (False, 1, 1)
    for swap in (False, True):
        for s1 in (1, -1):
            for s2 in (1, -1):
                c = centroids[:, [1, 0]] if swap else centroids.copy()
                c = c * np.array([s1, s2], float)
                score = float((c * expected).sum())
                if score > best:
                    best, best_cfg = score, (swap, s1, s2)

    swap, s1, s2 = best_cfg
    if swap:
        trained_pcs = trained_pcs[:, [1, 0]]
        trained_var = trained_var[[1, 0]]
    trained_pcs = trained_pcs * np.array([s1, s2], float)
    return trained_pcs, trained_var, best_cfg


def run_analysis(feats_pre: dict, feats_trn: dict, n_classes: int,
                 out_path: str, layers=None) -> dict:
    """Per-layer PCA + quadrant assignment + alignment; saves npz."""
    layers = list(layers or LAYERS)
    save = {"n_classes": n_classes, "layers": np.array(layers)}
    for layer in layers:
        p_pcs, p_var = compute_pca(feats_pre[layer])
        t_pcs, t_var = compute_pca(feats_trn[layer])
        quadrants, m1, m2 = assign_quadrants(p_pcs[:, 0], p_pcs[:, 1])
        t_pcs, t_var, cfg = align_pcs(t_pcs, t_var, quadrants)
        rprint(
            f"  {layer}: pre PC1 {p_var[0]:.1f}% PC2 {p_var[1]:.1f}% | "
            f"trained PC1 {t_var[0]:.1f}% PC2 {t_var[1]:.1f}% | align {cfg}",
            style="info",
        )
        save[f"{layer}_pretrained_pcs"] = p_pcs
        save[f"{layer}_trained_pcs"] = t_pcs
        save[f"{layer}_pretrained_var"] = p_var
        save[f"{layer}_trained_var"] = t_var
        save[f"{layer}_quadrants"] = quadrants
        save[f"{layer}_pretrained_medians"] = np.array([m1, m2])
    np.savez_compressed(out_path, **save)
    rprint(f"Saved analysis data to {out_path}", style="success")
    return save


def plot(data, layer: str, out_path: str):
    """Side-by-side quadrant scatter (2pcs_compare/plot.py:26-95)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    colors = ["#1b9e77", "#7570b3", "#e6ab02", "#d95f02"]
    quadrants = data[f"{layer}_quadrants"]
    n_classes = int(data["n_classes"])
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.8))
    panels = [
        (axes[0], data[f"{layer}_pretrained_pcs"], data[f"{layer}_pretrained_var"],
         "Pretrained AlexNet (1000-way)", "a"),
        (axes[1], data[f"{layer}_trained_pcs"], data[f"{layer}_trained_var"],
         f"Trained AlexNet ({n_classes}-way)", "b"),
    ]
    for ax, pcs, var, title, panel in panels:
        for q in range(4):
            m = quadrants == q
            ax.scatter(pcs[m, 0], pcs[m, 1], c=colors[q], alpha=0.3, s=2,
                       edgecolors="none", rasterized=True)
        ax.set_xlabel(f"PC 1 ({var[0]:.1f}% var.)")
        ax.set_ylabel(f"PC 2 ({var[1]:.1f}% var.)")
        ax.set_title(title, fontweight="bold")
        ax.text(-0.12, 1.08, panel, transform=ax.transAxes, fontsize=18,
                fontweight="bold", va="top")
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)
    fig.suptitle(LAYER_LABELS.get(layer, layer), fontweight="bold")
    plt.tight_layout()
    plt.savefig(out_path, dpi=300, bbox_inches="tight", facecolor="white")
    plt.close(fig)
    rprint(f"Saved figure to {out_path}", style="success")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_classes", type=int, default=4)
    parser.add_argument("--seed", type=int, default=1, choices=[1, 2, 3])
    parser.add_argument("--checkpoint_dir", default=None)
    parser.add_argument("--dataset", default="imagenet-mini-50")
    parser.add_argument("--features_pre", help="npz of precomputed pretrained features")
    parser.add_argument("--features_trained", help="npz of precomputed trained features")
    parser.add_argument("--layer", default="fc2", choices=LAYERS,
                        help="layer to plot")
    parser.add_argument("--out_dir", default=SCRIPT_DIR)
    args = parser.parse_args(argv)

    if args.features_pre and args.features_trained:
        feats_pre, _ = load_feature_npz(args.features_pre)
        feats_trn, _ = load_feature_npz(args.features_trained)
    else:
        from visreps_tpu.data.obj_cls import get_obj_cls_loader

        pre_state, trn_state = load_models_pair(
            args.n_classes, args.seed, args.checkpoint_dir)
        _, loaders = get_obj_cls_loader(
            {"dataset": args.dataset, "batchsize": 256, "num_workers": 8,
             "data_augment": False, "pca_labels_folder": "N/A"},
            shuffle=False, train_test_split=False)
        feats_pre, _ = extract_pooled_layers(pre_state, loaders["all"], LAYERS)
        feats_trn, _ = extract_pooled_layers(trn_state, loaders["all"], LAYERS)

    data_path = os.path.join(args.out_dir, f"data_{args.n_classes}way.npz")
    data = run_analysis(feats_pre, feats_trn, args.n_classes, data_path)
    fig_path = os.path.join(
        args.out_dir,
        f"pc_quadrant_pretrained_vs_{args.n_classes}way_{args.layer}.png")
    plot(data, args.layer, fig_path)


if __name__ == "__main__":
    main()
