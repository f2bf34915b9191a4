"""PCA coarse labels: median-split bits on top PCs → 2^n classes.

Reference parity: scripts/coarsegrain/make_pca_labels.py:18-52 —
project features onto the top-n eigenvectors, binary-split each PC at
its GLOBAL median, concatenate the n bits into a class id (nested
hierarchy: the 2^n classes refine the 2^(n-1) ones), write one CSV per
granularity with columns (image, pca_label).

Usage:
  python scripts/coarsegrain/make_pca_labels.py \
      --features features_alexnet.npz --eigen eigenvectors_alexnet.npz \
      --out-dir pca_labels/pca_labels_alexnet --max-bits 6
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd


def pca_bit_labels(features: np.ndarray, eigenvectors: np.ndarray, mean: np.ndarray,
                   n_bits: int) -> np.ndarray:
    """(N,) int labels from n_bits median-split PC projections."""
    proj = (features - mean) @ eigenvectors[:, :n_bits]  # (N, n_bits)
    medians = np.median(proj, axis=0)
    bits = (proj > medians).astype(np.int64)  # (N, n_bits)
    weights = 2 ** np.arange(n_bits - 1, -1, -1)
    return bits @ weights


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--features", required=True, help=".npz with 'features' and 'image_ids'")
    parser.add_argument("--eigen", required=True, help="output of compute_eigenvectors.py")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--max-bits", type=int, default=6)
    args = parser.parse_args(argv)

    data = np.load(args.features, allow_pickle=True)
    feats = data["features"].astype(np.float32)
    image_ids = [str(s) for s in data["image_ids"]]
    eig = np.load(args.eigen)
    eigvecs, mean = eig["eigenvectors"], eig["mean"]

    os.makedirs(args.out_dir, exist_ok=True)
    for n_bits in range(1, args.max_bits + 1):
        labels = pca_bit_labels(feats, eigvecs, mean, n_bits)
        n_classes = 2 ** n_bits
        df = pd.DataFrame({"image": image_ids, "pca_label": labels})
        out = os.path.join(args.out_dir, f"n_classes_{n_classes}.csv")
        df.to_csv(out, index=False)
        counts = np.bincount(labels, minlength=n_classes)
        print(
            f"{out}: {n_classes} classes, images/class "
            f"min {counts.min()} / max {counts.max()} / mean {counts.mean():.0f}"
        )


if __name__ == "__main__":
    main()
