"""Task-brain alignment: do task-discriminative dimensions predict the brain?

Mirrors the reference's representation_analysis/task_brain_alignment.py:
per layer, compute (1) task importance per feature dimension (Fisher
discriminant ratio over training-class labels, or class-centroid
variance), (2) brain importance (mean |ridge weight| per dimension
from an encoding fit on NSD responses), then (3) alignment metrics
between the two importance vectors (cosine, Spearman, Pearson, top-K
overlap). Writes a per-layer CSV and the alignment-across-layers
figure.

TPU redesign: the ridge fit is the framework's single-eigh RidgeCV
(ops/ridge — replaces himalaya torch_cuda, reference lines 201-258);
Fisher ratios are one segment-sum program.

Usage:
  python experiments/representation_analysis/task_brain_alignment.py \
      --task-features feats.npy --task-labels labels.npy \
      --brain-features nsd_feats.npy --brain-responses neural.npy \
      --layer fc2 --out-dir results/
"""
from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp

from visreps_tpu.core.logging import rprint
from visreps_tpu.ops.ridge import correlation_score, ridge_cv
from visreps_tpu.ops.stats import pearson_corr, spearman_corr

SEED = 42


from functools import partial


@partial(jax.jit, static_argnames=("n_classes",))
def fisher_discriminant_per_dim(features: jnp.ndarray, labels: jnp.ndarray,
                                n_classes: int) -> jnp.ndarray:
    """Per-dimension Fisher ratio: between-class var / within-class var.

    Reference: task_brain_alignment.py:126-172. One segment-sum over
    classes instead of a Python loop.
    """
    n, d = features.shape
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), labels,
                                 num_segments=n_classes)
    sums = jax.ops.segment_sum(features, labels, num_segments=n_classes)
    means = sums / jnp.maximum(counts[:, None], 1.0)
    global_mean = features.mean(axis=0)

    between = jnp.sum(counts[:, None] * (means - global_mean[None, :]) ** 2, axis=0) / n
    sq_sums = jax.ops.segment_sum(features ** 2, labels, num_segments=n_classes)
    within = jnp.sum(sq_sums - counts[:, None] * means ** 2, axis=0) / n
    return between / (within + 1e-10)


def class_centroid_importance(features: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Variance of class centroids per dimension. Reference: lines 175-197."""
    classes = np.unique(labels)
    centroids = np.stack([features[labels == c].mean(axis=0) for c in classes])
    return centroids.var(axis=0)


def brain_predictive_weights(features: np.ndarray, neural: np.ndarray,
                             seed: int = SEED):
    """Mean |ridge weight| per feature dim + encoding score.

    Protocol parity with the reference (lines 201-258): seeded 80/20
    split, fit-only z-norm, RidgeCV with per-voxel alphas; importance =
    mean |coef| over voxels.
    """
    n = len(features)
    idx = np.random.default_rng(seed).permutation(n)
    split = int(0.8 * n)
    tr, te = idx[:split], idx[split:]

    x = jnp.asarray(features, jnp.float32)
    y = jnp.asarray(neural, jnp.float32)
    xm = x[tr].mean(axis=0)
    xs = x[tr].std(axis=0) + 1e-8
    x_tr = (x[tr] - xm) / xs
    x_te = (x[te] - xm) / xs

    model = ridge_cv(x_tr, y[tr])
    pred = model.predict(x_te)
    mean_r = float(jnp.mean(correlation_score(y[te], pred)))
    weights = np.abs(np.asarray(model.weights)).mean(axis=1)  # (d,)
    alpha_median = float(np.median(np.asarray(model.best_alphas)))
    return weights, mean_r, alpha_median


def compute_alignment(task_w: np.ndarray, brain_w: np.ndarray) -> dict:
    """Cosine / Spearman / Pearson / top-K overlap. Reference: 316-357."""
    t = task_w / (np.linalg.norm(task_w) + 1e-10)
    b = brain_w / (np.linalg.norm(brain_w) + 1e-10)
    out = {
        "cosine_similarity": float(t @ b),
        "spearman_r": float(spearman_corr(jnp.asarray(task_w), jnp.asarray(brain_w))),
        "pearson_r": float(pearson_corr(jnp.asarray(task_w), jnp.asarray(brain_w))),
    }
    for k in (100, 500, 1000):
        kk = min(k, len(task_w) // 2) or 1
        top_t = set(np.argsort(task_w)[-kk:].tolist())
        top_b = set(np.argsort(brain_w)[-kk:].tolist())
        out[f"top_{k}_overlap"] = len(top_t & top_b) / kk
    return out


def plot_alignment(task_w, brain_w, metrics, layer, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    axes[0].scatter(np.log10(task_w + 1e-10), np.log10(brain_w + 1e-10),
                    s=4, alpha=0.3, color="#4c72b0")
    axes[0].set_xlabel("log10 task importance (Fisher)")
    axes[0].set_ylabel("log10 brain importance (|ridge w|)")
    axes[0].set_title(f"{layer}: spearman r = {metrics['spearman_r']:.3f}")
    order_t = np.argsort(-task_w)
    axes[1].plot(np.cumsum(brain_w[order_t]) / brain_w.sum(), label="by task rank")
    axes[1].plot(np.cumsum(np.sort(brain_w)[::-1]) / brain_w.sum(),
                 label="by brain rank (oracle)", linestyle="--")
    axes[1].set_xlabel("Dimensions (ranked)")
    axes[1].set_ylabel("Cumulative brain importance")
    axes[1].legend()
    plt.tight_layout()
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out_path, dpi=150)
    plt.close(fig)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--task-features", required=True,
                        help=".npy (n, d) features on labeled images")
    parser.add_argument("--task-labels", required=True, help=".npy class labels")
    parser.add_argument("--brain-features", required=True,
                        help=".npy (m, d) features on NSD stimuli")
    parser.add_argument("--brain-responses", required=True,
                        help=".npy (m, v) neural responses")
    parser.add_argument("--layer", default="fc2")
    parser.add_argument("--task-importance", default="fisher",
                        choices=["fisher", "centroid"])
    parser.add_argument("--out-dir", default="experiments/representation_analysis/results")
    args = parser.parse_args(argv)

    feats = np.load(args.task_features).astype(np.float32)
    labels = np.load(args.task_labels).astype(np.int32)
    if args.task_importance == "fisher":
        task_w = np.asarray(fisher_discriminant_per_dim(
            jnp.asarray(feats), jnp.asarray(labels), int(labels.max()) + 1))
    else:
        task_w = class_centroid_importance(feats, labels)

    brain_feats = np.load(args.brain_features).astype(np.float32)
    neural = np.load(args.brain_responses).astype(np.float32)
    brain_w, mean_r, alpha_med = brain_predictive_weights(brain_feats, neural)

    metrics = compute_alignment(task_w, brain_w)
    rprint(f"[{args.layer}] encoding mean r={mean_r:.4f}, alpha_med={alpha_med:.2g}",
           style="highlight")
    for k, v in metrics.items():
        rprint(f"  {k}: {v:.4f}", style="info")

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    row = {"layer": args.layer, "encoding_mean_r": mean_r,
           "alpha_median": alpha_med, **metrics}
    csv_path = out_dir / "task_brain_alignment.csv"
    exists = csv_path.exists()
    with open(csv_path, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(row.keys()))
        if not exists:
            writer.writeheader()
        writer.writerow(row)
    plot_alignment(task_w, brain_w, metrics, args.layer,
                   out_dir / f"task_brain_alignment_{args.layer}.png")
    return row


if __name__ == "__main__":
    main()
