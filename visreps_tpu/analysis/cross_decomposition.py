"""PLSSVD cross-decomposition alignment with K-fold CV.

Reference parity: visreps/analysis/cross_decomposition.py:11-108 —
both activations and neural responses are first reduced with a
1000-dim Gaussian random projection, then PLSSVD alignment is scored
with 8-fold CV; results pickle-appended.
"""
from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_random_projection(x: np.ndarray, k: int = 1000, seed: int = 0) -> np.ndarray:
    d = x.shape[1]
    if d <= k:
        return x.astype(np.float32)
    key = jax.random.PRNGKey(seed)
    proj = jax.random.normal(key, (d, k), jnp.float32) / np.sqrt(k)
    return np.asarray(jnp.asarray(x, jnp.float32) @ proj)


def _plssvd_fit(x: jnp.ndarray, y: jnp.ndarray, n_components: int):
    """PLSSVD: SVD of X^T Y after column centering."""
    xc = x - x.mean(axis=0)
    yc = y - y.mean(axis=0)
    u, s, vt = jnp.linalg.svd(xc.T @ yc, full_matrices=False)
    return u[:, :n_components], vt[:n_components].T, x.mean(axis=0), y.mean(axis=0)


def compute_cross_decomposition_alignment(
    acts: np.ndarray,
    neural: np.ndarray,
    n_components: int = 25,
    n_folds: int = 8,
    proj_dim: int = 1000,
    seed: int = 0,
    out_pickle: str | None = None,
    tag: str = "",
) -> dict:
    """Mean CV correlation of paired PLSSVD scores."""
    x = gaussian_random_projection(acts.reshape(acts.shape[0], -1), proj_dim, seed)
    y = gaussian_random_projection(neural, proj_dim, seed + 1)
    n = x.shape[0]
    n_components = min(n_components, x.shape[1], y.shape[1])

    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    folds = np.array_split(perm, n_folds)

    fold_corrs = []
    for i in range(n_folds):
        test_idx = folds[i]
        train_idx = np.concatenate([folds[j] for j in range(n_folds) if j != i])
        u, v, xm, ym = _plssvd_fit(
            jnp.asarray(x[train_idx]), jnp.asarray(y[train_idx]), n_components
        )
        xs = (jnp.asarray(x[test_idx]) - xm) @ u
        ys = (jnp.asarray(y[test_idx]) - ym) @ v
        xs = np.asarray(xs)
        ys = np.asarray(ys)
        corrs = [
            np.corrcoef(xs[:, c], ys[:, c])[0, 1]
            for c in range(n_components)
            if np.std(xs[:, c]) > 0 and np.std(ys[:, c]) > 0
        ]
        fold_corrs.append(np.mean(corrs) if corrs else np.nan)

    result = {
        "tag": tag,
        "mean_cv_correlation": float(np.nanmean(fold_corrs)),
        "fold_correlations": [float(c) for c in fold_corrs],
        "n_components": n_components,
    }
    if out_pickle:
        prior = []
        if os.path.exists(out_pickle):
            with open(out_pickle, "rb") as f:
                prior = pickle.load(f)
        prior.append(result)
        with open(out_pickle, "wb") as f:
            pickle.dump(prior, f)
    return result
