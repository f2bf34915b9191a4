"""Two-NN intrinsic dimensionality (Facco et al. 2017).

Reference parity: visreps/analysis/compute_twoNN_ID.py:27-127 —
ID from the ratio of 2nd/1st nearest-neighbor distances, decimation
stability check, CSV append. The KNN search is a device matmul
(pairwise distances via the Gram trick) instead of FAISS.
"""
from __future__ import annotations

import argparse
import csv
import os

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _two_nn_ratios(x: jnp.ndarray) -> jnp.ndarray:
    """mu_i = d2/d1 per point from exact pairwise distances."""
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    d2 = jnp.maximum(d2, 0.0)
    n = x.shape[0]
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    # two smallest distances per row
    neg_top2 = jax.lax.top_k(-d2, 2)[0]
    d1 = jnp.sqrt(-neg_top2[:, 0])
    d2nd = jnp.sqrt(-neg_top2[:, 1])
    return d2nd / jnp.maximum(d1, 1e-12)


def twoNN_id(x: np.ndarray, discard_fraction: float = 0.1) -> float:
    """Facco Two-NN estimator: slope of -log(1-F) vs log(mu) through 0."""
    mu = np.asarray(_two_nn_ratios(jnp.asarray(x, jnp.float32)))
    mu = np.sort(mu[np.isfinite(mu) & (mu > 1.0)])
    n = len(mu)
    if n < 10:
        return float("nan")
    keep = int(n * (1 - discard_fraction))
    mu = mu[:keep]
    f = np.arange(1, keep + 1) / n
    xlog = np.log(mu)
    ylog = -np.log(1 - f)
    # least squares through the origin
    return float((xlog @ ylog) / (xlog @ xlog))


def intrinsic_dim_layer(features: np.ndarray, n_decimations: int = 3,
                        seed: int = 0) -> dict:
    """ID estimate + decimation stability check (half-sample re-estimates)."""
    feats = features.reshape(features.shape[0], -1).astype(np.float32)
    full_id = twoNN_id(feats)
    rng = np.random.RandomState(seed)
    half_ids = []
    for _ in range(n_decimations):
        idx = rng.choice(len(feats), size=len(feats) // 2, replace=False)
        half_ids.append(twoNN_id(feats[idx]))
    return {
        "id": full_id,
        "id_half_mean": float(np.nanmean(half_ids)),
        "id_half_std": float(np.nanstd(half_ids)),
        "n_samples": len(feats),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("files", nargs="+", help=".npz feature files")
    parser.add_argument("--out-csv", default="twonn_id.csv")
    args = parser.parse_args(argv)

    write_header = not os.path.exists(args.out_csv)
    with open(args.out_csv, "a", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["file", "layer", "id", "id_half_mean", "id_half_std", "n_samples"]
        )
        if write_header:
            writer.writeheader()
        for path in args.files:
            data = np.load(path, allow_pickle=True)
            for key in data.files:
                arr = data[key]
                if not isinstance(arr, np.ndarray) or arr.ndim < 2:
                    continue
                res = intrinsic_dim_layer(arr)
                writer.writerow({"file": os.path.basename(path), "layer": key, **res})
                print(f"{path}:{key} ID={res['id']:.2f} (half: {res['id_half_mean']:.2f}"
                      f"±{res['id_half_std']:.2f})")


if __name__ == "__main__":
    main()
