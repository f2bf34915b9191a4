"""Batched correlation / similarity metrics library (jnp).

Reference parity: visreps/analysis/metrics/{_corrcoef,_r2_score,_cka}.py
— pearson_r / spearman_r / covariance with optional batch dims,
Bessel's correction, diagonal-or-matrix output; R²; linear CKA via HSIC.
All pure functions, jit/vmap-safe.
"""
from __future__ import annotations

import jax.numpy as jnp


def _prep(x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim not in (1, 2, 3):
        raise ValueError(f"x must have 1, 2 or 3 dimensions (n_dim = {x.ndim})")
    return x[:, None] if x.ndim == 1 else x


def _helper(x, y, *, center, scale, correction=1, return_diagonal=True, replace_with_ranks=False):
    x = _prep(jnp.asarray(x, jnp.float32))
    dim_sample = x.ndim - 2
    n_samples = x.shape[dim_sample]

    if replace_with_ranks:
        x = jnp.argsort(jnp.argsort(x, axis=dim_sample), axis=dim_sample).astype(jnp.float32)

    if y is not None:
        y = _prep(jnp.asarray(y, jnp.float32))
        if y.shape[y.ndim - 2] != n_samples:
            raise ValueError("x and y must have same n_samples")
        if return_diagonal and x.shape[-1] != y.shape[-1]:
            raise ValueError("x and y must have same n_features to return diagonal")
        if replace_with_ranks:
            y = jnp.argsort(jnp.argsort(y, axis=y.ndim - 2), axis=y.ndim - 2).astype(jnp.float32)
    else:
        y = x

    if center:
        x = x - x.mean(axis=dim_sample, keepdims=True)
        y = y - y.mean(axis=y.ndim - 2, keepdims=True)
    if scale:
        x = x / x.std(axis=dim_sample, keepdims=True, ddof=correction)
        y = y / y.std(axis=y.ndim - 2, keepdims=True, ddof=correction)

    if return_diagonal:
        out = (x * y).sum(axis=-2) / (n_samples - correction if correction else n_samples)
    else:
        out = jnp.swapaxes(x, -2, -1) @ y / (n_samples - correction if correction else n_samples)
    return jnp.squeeze(out)


def pearson_r(x, y=None, *, return_diagonal=True, correction=1):
    return _helper(x, y, center=True, scale=True, correction=correction, return_diagonal=return_diagonal)


def spearman_r(x, y=None, *, return_diagonal=True, correction=1):
    return _helper(
        x, y, center=True, scale=True, correction=correction,
        return_diagonal=return_diagonal, replace_with_ranks=True,
    )


def covariance(x, y=None, *, return_diagonal=True, correction=1):
    return _helper(x, y, center=True, scale=False, correction=correction, return_diagonal=return_diagonal)


def r2_score(y: jnp.ndarray, y_predicted: jnp.ndarray) -> jnp.ndarray:
    """R² = 1 − Σ(y−ŷ)² / Σ(y−ȳ)² per column, zero-variance guarded."""
    y = _prep(jnp.asarray(y, jnp.float32))
    y_predicted = _prep(jnp.asarray(y_predicted, jnp.float32))
    y_mean = y.mean(axis=-2, keepdims=True)
    sse = ((y - y_predicted) ** 2).sum(axis=-2)
    ss = ((y - y_mean) ** 2).sum(axis=-2)
    ss = jnp.where(ss == 0, 1.0, ss)
    return 1.0 - sse / ss


def linear_kernel(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return x @ jnp.swapaxes(y, -2, -1)


def hsic(k_x: jnp.ndarray, k_y: jnp.ndarray) -> jnp.ndarray:
    n = k_x.shape[0]
    h = jnp.eye(n) - jnp.ones((n, n)) / n
    return jnp.trace((k_x @ h) @ (k_y @ h)) / ((n - 1) ** 2)


def cka(x: jnp.ndarray, y: jnp.ndarray, kernel=linear_kernel) -> jnp.ndarray:
    k_x, k_y = kernel(x, x), kernel(y, y)
    return hsic(k_x, k_y) / jnp.sqrt(hsic(k_x, k_x) * hsic(k_y, k_y))
