"""Exact PCA eigenvectors of a feature matrix via batched covariance.

Reference parity: scripts/coarsegrain/compute_eigenvectors.py:23-65 —
streams feature batches through a covariance accumulator, eigh, saves
top-K eigenvectors/eigenvalues/mean/total_var. Device-side accumulation
(ops.pca.fit_pca_covariance) replaces the float64 numpy loop.

Usage:
  python scripts/coarsegrain/compute_eigenvectors.py \
      --features features_alexnet.npz --out eigenvectors_alexnet.npz --top-k 20
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--features", required=True, help=".npz with 'features' (N, D)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--top-k", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=4096)
    args = parser.parse_args(argv)

    from visreps_tpu.ops.pca import fit_pca_covariance

    data = np.load(args.features)
    feats = data["features"]
    n, d = feats.shape
    print(f"Features: {n} x {d}")

    def batches():
        for i in range(0, n, args.batch_size):
            yield feats[i: i + args.batch_size]

    eigvecs, eigvals, mean, total_var = fit_pca_covariance(batches(), d, args.top_k)
    np.savez(
        args.out,
        eigenvectors=np.asarray(eigvecs),
        eigenvalues=np.asarray(eigvals),
        mean=np.asarray(mean),
        total_variance=float(total_var),
    )
    ratios = np.asarray(eigvals) / float(total_var)
    print(f"Top-{args.top_k} variance ratios: {np.round(ratios, 4)}")
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()
