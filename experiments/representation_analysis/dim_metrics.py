"""Dimensionality metrics — full parity with the reference experiment.

Reference: experiments/representation_analysis/dimensionality/metrics.py
(eigenspectrum:12-33, participation_ratio:36-54, cumulative_variance:
57-70, n_components_for_variance:73-84, two_nn_dimension:87-135,
hoyer_sparsity:138-161, fraction_active:164-174). Semantics match the
numpy originals; the heavy pieces (covariance eigendecomposition, the
O(n²) Two-NN distance matrix) run as jitted jnp programs with float32
accumulation, while the RNG-dependent parts (Two-NN subsample +
bootstrap standard error) keep numpy's exact seeded streams.

Note: n_components_for_variance avoids jnp.searchsorted (a known
relay-compile trap on this toolchain, CLAUDE.md) via an equivalent
threshold count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _eigenspectrum_impl(x):
    x = x - x.mean(axis=0)
    n, d = x.shape
    # Gram trick: same non-zero eigenvalues from the smaller matrix.
    if d > n:
        m = (x @ x.T) / (n - 1)
    else:
        m = (x.T @ x) / (n - 1)
    eigs = jnp.linalg.eigvalsh(m)[::-1]
    return jnp.maximum(eigs, 0.0)


def eigenspectrum(x) -> np.ndarray:
    """Covariance eigenvalues, descending, clipped at 0 (metrics.py:12-33)."""
    return np.asarray(_eigenspectrum_impl(jnp.asarray(x, jnp.float32)))


def participation_ratio(x) -> float:
    """(Σλ)² / Σλ² — effective dimensionality (metrics.py:36-54)."""
    eigs = eigenspectrum(x)
    total = eigs.sum()
    if total == 0:
        return 0.0
    return float(total**2 / (eigs**2).sum())


def cumulative_variance(x) -> np.ndarray:
    """Cumulative variance-explained fractions (metrics.py:57-70)."""
    eigs = eigenspectrum(x)
    total = eigs.sum()
    if total == 0:
        return np.zeros_like(eigs)
    return np.cumsum(eigs / total)


def n_components_for_variance(x, threshold: float = 0.9) -> int:
    """Components needed to explain `threshold` variance (metrics.py:73-84).

    Equivalent to np.searchsorted(cumvar, threshold) + 1 on the sorted
    cumulative curve (left insertion = count of entries < threshold).
    """
    cumvar = cumulative_variance(x)
    return int((cumvar < threshold).sum() + 1)


@jax.jit
def _two_nn_distances(x):
    """Squared-distance matrix → (r1, r2) nearest-neighbor distances."""
    x = x - x.mean(axis=0)
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    d2 = jnp.maximum(d2, 0.0)
    # smallest 3 per row (self distance 0 included)
    neg_top, _ = jax.lax.top_k(-d2, 3)
    d_sorted = jnp.sqrt(-neg_top)
    return d_sorted[:, 1], d_sorted[:, 2]


def two_nn_dimension(x, n_samples: int | None = None, seed: int = 42):
    """Facco Two-NN intrinsic dimension MLE + bootstrap SE (metrics.py:87-135).

    Same estimator, subsampling RNG, validity filters, and
    100-resample bootstrap standard error as the reference.
    """
    rng = np.random.default_rng(seed)
    x = np.asarray(x, np.float32)
    if n_samples is not None and len(x) > n_samples:
        idx = rng.choice(len(x), n_samples, replace=False)
        x = x[idx]

    r1, r2 = (np.asarray(v) for v in _two_nn_distances(jnp.asarray(x)))
    valid = r1 > 1e-10
    mu = r2[valid] / r1[valid]
    mu = mu[mu >= 1.0]
    if len(mu) < 10:
        return np.nan, np.nan

    log_mu = np.log(mu)
    n = len(mu)
    dimension = n / log_mu.sum()
    boot_idx = rng.choice(n, (100, n), replace=True)
    boot_dims = n / log_mu[boot_idx].sum(axis=1)
    return float(dimension), float(np.std(boot_dims))


@jax.jit
def _hoyer_impl(x):
    d = x.shape[1]
    sqrt_n = jnp.sqrt(jnp.float32(d))
    x_abs = jnp.abs(x)
    l1 = x_abs.sum(axis=1)
    l2 = jnp.sqrt(jnp.sum(x_abs * x_abs, axis=1))
    s = (sqrt_n - l1 / jnp.maximum(l2, 1e-30)) / (sqrt_n - 1.0)
    return jnp.where(l2 < 1e-10, 1.0, s)


def hoyer_sparsity(x) -> np.ndarray:
    """Per-sample Hoyer sparsity ∈ [0, 1] (metrics.py:138-161)."""
    return np.asarray(_hoyer_impl(jnp.asarray(x, jnp.float32)))


def fraction_active(x, threshold: float = 0.0) -> np.ndarray:
    """Per-sample fraction of units with |a| > threshold (metrics.py:164-174)."""
    x = jnp.asarray(x, jnp.float32)
    return np.asarray(jnp.mean(jnp.abs(x) > threshold, axis=1))


def compute_all_metrics(feats_dict: dict, layers, n_samples_twonn: int = 2000) -> dict:
    """All metrics per layer, same result structure as the reference's
    run.compute_all_metrics (dimensionality/run.py:32-76)."""
    results = {"pr": {}, "n90": {}, "twonn": {}, "sparsity": {}, "eigenvalues": {}}
    for layer in layers:
        x = np.asarray(feats_dict[layer], np.float32)
        x = x.reshape(x.shape[0], -1) if x.ndim > 2 else x
        results["pr"][layer] = participation_ratio(x)
        results["n90"][layer] = n_components_for_variance(x, threshold=0.9)
        dim, std = two_nn_dimension(x, n_samples=n_samples_twonn)
        results["twonn"][layer] = {"dimension": dim, "std": std}
        sparsity_vals = hoyer_sparsity(x)
        results["sparsity"][layer] = {
            "mean": float(np.mean(sparsity_vals)),
            "std": float(np.std(sparsity_vals)),
            "frac_active": float(np.mean(fraction_active(x))),
        }
        results["eigenvalues"][layer] = eigenspectrum(x)
    return results
