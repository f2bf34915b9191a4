"""Per-layer PCA eigenspectra from saved feature .npz files.

Reference parity: visreps/analysis/compute_eigenspectra.py:11-91 —
full-SVD eigenvalues per layer, saved per input file.
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np


def analyze_layer_pca(features: np.ndarray) -> dict:
    """Full eigenspectrum of one layer's (n, d) feature matrix."""
    x = jnp.asarray(features.reshape(features.shape[0], -1), jnp.float32)
    x = x - x.mean(axis=0)
    s = jnp.linalg.svd(x, compute_uv=False)
    eigvals = np.asarray(s) ** 2 / (x.shape[0] - 1)
    total = float(eigvals.sum())
    return {
        "eigenvalues": eigvals,
        "explained_variance_ratio": eigvals / total if total > 0 else eigvals,
        "total_variance": total,
        "effective_dim": float(eigvals.sum() ** 2 / (eigvals**2).sum()) if total > 0 else 0.0,
    }


def process_file(npz_path: str, out_dir: str) -> str:
    data = np.load(npz_path, allow_pickle=True)
    results = {}
    for key in data.files:
        arr = data[key]
        if not isinstance(arr, np.ndarray) or arr.ndim < 2 or arr.dtype.kind not in "fiu":
            continue
        spec = analyze_layer_pca(arr.astype(np.float32))
        results[f"{key}_eigenvalues"] = spec["eigenvalues"]
        results[f"{key}_evr"] = spec["explained_variance_ratio"]
        results[f"{key}_effective_dim"] = spec["effective_dim"]
        print(f"  {key}: effective dim {spec['effective_dim']:.1f}")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "eigenspectra_" + os.path.basename(npz_path))
    np.savez(out, **results)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("files", nargs="+")
    parser.add_argument("--out-dir", default="eigenspectra")
    args = parser.parse_args(argv)
    for f in args.files:
        print(f"Processing {f}")
        print(f"Saved {process_file(f, args.out_dir)}")


if __name__ == "__main__":
    main()
