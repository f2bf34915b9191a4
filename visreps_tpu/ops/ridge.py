"""Multi-alpha ridge regression with per-target CV — himalaya replacement.

Reference path: visreps/analysis/encoding_score.py:47-62 uses
himalaya.RidgeCV(alphas=logspace(−10,10,20), cv=5, fit_intercept=False)
on a CUDA backend. TPU-native redesign:

  * One Gram matrix G = XᵀX (d×d) rides the MXU; per-fold train Grams
    are computed by SUBTRACTING each fold's contribution
    (G_f = G − X_fᵀX_f), so the 5-fold sweep costs one extra rank-n_f
    product per fold instead of five full refits.
  * eigh(G_f) diagonalizes the problem once per fold; all 20 alphas are
    then pure diagonal reweightings — a lax.map of (val, d)·(d, v)
    matmuls, no per-alpha factorization.
  * Per-target (voxel) alpha selection by mean CV R² across folds,
    matching himalaya's per-target behavior; final weights use each
    voxel's own alpha via a single broadcasted solve.

Folds are contiguous KFold(n_folds) without shuffle (sklearn
check_cv semantics, which himalaya inherits).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class RidgeCVResult:
    weights: jnp.ndarray       # (d, v) — fit_intercept=False
    best_alphas: jnp.ndarray   # (v,)
    cv_scores: jnp.ndarray     # (n_alphas, v) mean R² across folds

    def predict(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.astype(jnp.float32) @ self.weights

    def tree_flatten(self):
        return (self.weights, self.best_alphas, self.cv_scores), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def default_alphas(n: int = 20) -> np.ndarray:
    """logspace(−10, 10, 20) — reference: encoding_score.py:108."""
    return np.logspace(-10, 10, n)


def _kfold_bounds(n: int, n_folds: int) -> list[tuple[int, int]]:
    """Contiguous KFold boundaries (first n % k folds one larger)."""
    sizes = [n // n_folds + (1 if i < n % n_folds else 0) for i in range(n_folds)]
    bounds, start = [], 0
    for s in sizes:
        bounds.append((start, start + s))
        start += s
    return bounds


def _r2_per_target(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    y_mean = y_true.mean(axis=0, keepdims=True)
    sse = jnp.sum((y_true - y_pred) ** 2, axis=0)
    ss = jnp.sum((y_true - y_mean) ** 2, axis=0)
    ss = jnp.where(ss == 0, 1.0, ss)
    return 1.0 - sse / ss


@partial(jax.jit, static_argnames=("n_folds",))
def _ridge_cv_impl(x, y, alphas, n_folds):
    n, d = x.shape
    hp = jax.lax.Precision.HIGHEST
    g = jax.lax.dot(x.T, x, precision=hp)          # (d, d)
    c = jax.lax.dot(x.T, y, precision=hp)          # (d, v)

    cv_scores = jnp.zeros((alphas.shape[0], y.shape[1]), jnp.float32)
    for start, stop in _kfold_bounds(n, n_folds):
        xv = jax.lax.slice_in_dim(x, start, stop, axis=0)
        yv = jax.lax.slice_in_dim(y, start, stop, axis=0)
        gf = g - jax.lax.dot(xv.T, xv, precision=hp)
        cf = c - jax.lax.dot(xv.T, yv, precision=hp)
        lam, v = jnp.linalg.eigh(gf)
        lam = jnp.maximum(lam, 0.0)                 # f32 roundoff guard
        b = jax.lax.dot(v.T, cf, precision=hp)      # (d, v)
        p = jax.lax.dot(xv, v, precision=hp)        # (n_val, d)

        def score_alpha(a):
            pred = jax.lax.dot(p, b / (lam[:, None] + a), precision=hp)
            return _r2_per_target(yv, pred)

        cv_scores = cv_scores + jax.lax.map(score_alpha, alphas)

    cv_scores = cv_scores / n_folds
    best_idx = jnp.argmax(cv_scores, axis=0)        # (v,)
    best_alpha = alphas[best_idx]

    lam, v = jnp.linalg.eigh(g)
    lam = jnp.maximum(lam, 0.0)
    b = jax.lax.dot(v.T, c, precision=hp)
    w = jax.lax.dot(v, b / (lam[:, None] + best_alpha[None, :]), precision=hp)
    return w, best_alpha, cv_scores


def ridge_cv(
    x: jnp.ndarray,
    y: jnp.ndarray,
    alphas: np.ndarray | None = None,
    n_folds: int = 5,
) -> RidgeCVResult:
    """Fit ridge with per-target alpha chosen by n-fold CV (no intercept).

    Callers are expected to pass z-normalized x and y (the reference
    z-norms with fit-only stats and sets fit_intercept=False —
    encoding_score.py:55,129-150).
    """
    if alphas is None:
        alphas = default_alphas()
    w, best_alpha, cv_scores = _ridge_cv_impl(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32),
        jnp.asarray(alphas, jnp.float32),
        n_folds,
    )
    return RidgeCVResult(weights=w, best_alphas=best_alpha, cv_scores=cv_scores)


@jax.jit
def correlation_score(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Per-column (voxel) Pearson r — himalaya.scoring.correlation_score."""
    yt = y_true - y_true.mean(axis=0, keepdims=True)
    yp = y_pred - y_pred.mean(axis=0, keepdims=True)
    denom = jnp.sqrt(jnp.sum(yt * yt, axis=0) * jnp.sum(yp * yp, axis=0))
    return jnp.where(denom > 0, jnp.sum(yt * yp, axis=0) / denom, 0.0)
