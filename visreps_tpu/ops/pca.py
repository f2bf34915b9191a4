"""PCA fit / transform / inverse-transform and low-rank reconstruction.

Reference parity: visreps/analysis/reconstruct_from_pcs.py (sklearn
PCA fit → transform → inverse_transform round trip). Sign conventions
cancel in the reconstruction, so an SVD-based device implementation is
numerically equivalent to sklearn for this use.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class PCATransform:
    mean: jnp.ndarray        # (d,)
    components: jnp.ndarray  # (k, d)
    explained_variance: jnp.ndarray  # (k,)

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.mean) @ self.components.T

    def inverse_transform(self, z: jnp.ndarray) -> jnp.ndarray:
        return z @ self.components + self.mean

    def reconstruct(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.inverse_transform(self.transform(x))

    def tree_flatten(self):
        return (self.mean, self.components, self.explained_variance), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@partial(jax.jit, static_argnames=("k",))
def fit_pca(x: jnp.ndarray, k: int) -> PCATransform:
    """Top-k PCA via economy SVD of the centered matrix."""
    x = x.astype(jnp.float32)
    mean = x.mean(axis=0)
    xc = x - mean
    _, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    k = min(k, vt.shape[0])
    var = (s[:k] ** 2) / (x.shape[0] - 1)
    return PCATransform(mean=mean, components=vt[:k], explained_variance=var)


def reconstruct_from_pcs(acts: dict, k: int) -> dict:
    """Reconstruct each layer's activations from its top-k PCs.

    PCA is fit on the passed matrix itself (reference:
    visreps/analysis/reconstruct_from_pcs.py:7-30); dtype preserved.
    """
    out = {}
    for name, x in acts.items():
        x = jnp.asarray(x)
        if x.ndim < 2:
            raise ValueError(f"{name}: need >=2-D array")
        dt = x.dtype
        flat = x.reshape(x.shape[0], -1)
        pca = fit_pca(flat, min(k, flat.shape[1]))
        out[name] = pca.reconstruct(flat).astype(dt)
    return out


def fit_pca_covariance(x_batches, d: int, k: int):
    """Exact PCA eigenvectors via batched covariance accumulation.

    Mirrors scripts/coarsegrain/compute_eigenvectors.py:23-65 (float64
    accumulation on host is replaced by f32 device accumulation with a
    compensated mean). x_batches yields (b, d) arrays; returns
    (eigvecs (d, k), eigvals (k,), mean (d,), total_var).
    """
    n = 0
    s1 = jnp.zeros((d,), jnp.float32)
    s2 = jnp.zeros((d, d), jnp.float32)
    for xb in x_batches:
        xb = jnp.asarray(xb, jnp.float32)
        n += xb.shape[0]
        s1 = s1 + xb.sum(axis=0)
        s2 = s2 + xb.T @ xb
    mean = s1 / n
    cov = s2 / n - jnp.outer(mean, mean)
    eigvals, eigvecs = jnp.linalg.eigh(cov)
    order = jnp.argsort(eigvals)[::-1][:k]
    return eigvecs[:, order], eigvals[order], mean, jnp.sum(eigvals)
