"""Images at the poles of each principal component.

Port of reference experiments/pca_analysis/pca_poles_images.py: PCA the
source-model feature matrix (z-scored, fit on ≤110k seed-42 subsample),
take the n_poles lowest/highest scores per PC, and write a CSV of
(pc, pole, score, image_file, image_class_id, image_class).

TPU redesign: z-norm + covariance eigh + projection run as one jitted
device program (no sklearn); the 6-PC fit at 110k x 4096 is a single
MXU-sized eigh.
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp

from visreps_tpu.core.logging import rprint


def load_imagenet_class_mapping(imagenet_data_dir: str) -> dict:
    """wnid -> class name from map_clsloc.txt (reference :10-19)."""
    mapping = {}
    path = os.path.join(imagenet_data_dir, "map_clsloc.txt")
    with open(path) as f:
        for line in f:
            parts = line.strip().split(" ", 1)
            if len(parts) >= 2:
                mapping[parts[0]] = parts[1]
    rprint(f"Loaded {len(mapping)} class mappings", style="info")
    return mapping


from functools import partial


@partial(jax.jit, static_argnames=("n_components",))
def _pca_scores(x_fit: jnp.ndarray, x_all: jnp.ndarray, n_components: int = 6):
    """Z-score by fit stats, eigh the fit covariance, project all rows."""
    mean = x_fit.mean(axis=0)
    std = jnp.maximum(x_fit.std(axis=0), 1e-8)
    zf = (x_fit - mean) / std
    cov = zf.T @ zf / (zf.shape[0] - 1)
    _, vecs = jnp.linalg.eigh(cov)
    top = vecs[:, ::-1][:, :n_components]
    return ((x_all - mean) / std) @ top


def compute_pc_scores(features: np.ndarray, n_components: int = 6,
                      n_fit: int = 110000, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    n_fit = min(n_fit, features.shape[0])
    fit_idx = rng.choice(features.shape[0], n_fit, replace=False)
    x = jnp.asarray(features, jnp.float32)
    return np.asarray(_pca_scores(x[fit_idx], x, n_components))


def analyze_pc_poles(pc_scores: np.ndarray, image_names, class_mapping: dict,
                     n_poles: int = 100) -> list:
    """Rows for the lowest/highest n_poles images per PC (reference :22-48)."""
    rows = []
    for pc_idx in range(pc_scores.shape[1]):
        order = np.argsort(pc_scores[:, pc_idx])
        for indices, pole in ((order[:n_poles], "low"),
                              (order[-n_poles:][::-1], "high")):
            for idx in indices:
                name = image_names[idx]
                class_id = name.split("_")[0]
                rows.append({
                    "pc": pc_idx + 1, "pole": pole,
                    "score": float(pc_scores[idx, pc_idx]),
                    "image_file": name, "image_class_id": class_id,
                    "image_class": class_mapping.get(class_id, "unknown"),
                })
    return rows


def write_csv(rows, path):
    import csv

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    rprint(f"Saved results to {path}", style="success")


def main(argv=None):
    from visreps_tpu.core.env import get_env_var

    parser = argparse.ArgumentParser()
    parser.add_argument("--features_filename", required=True)
    parser.add_argument("--dataset", default="imagenet")
    parser.add_argument("--n_poles", type=int, default=100)
    args = parser.parse_args(argv)

    class_mapping = load_imagenet_class_mapping(get_env_var("IMAGENET_DATA_DIR"))
    path = os.path.join("datasets", "obj_cls", args.dataset, args.features_filename)
    data = np.load(path, allow_pickle=True)
    features = data["fc2"] if "fc2" in data else data["clip_features"]
    features = features.reshape(features.shape[0], -1)
    names = [os.path.basename(str(n)) for n in data["image_names"]]

    scores = compute_pc_scores(features)
    rows = analyze_pc_poles(scores, names, class_mapping, args.n_poles)
    suffix = args.features_filename.replace("features_", "").replace(".npz", "")
    out = os.path.join("datasets", "obj_cls", args.dataset, "pca_poles",
                       f"pca_poles_{suffix}.csv")
    write_csv(rows, out)


if __name__ == "__main__":
    main()
