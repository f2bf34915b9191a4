"""Z-normalization helpers (fit-only statistics, no leakage).

Reference parity: visreps/analysis/encoding_score.py:27-36 — std uses
Bessel's correction (torch .std default, ddof=1) plus 1e-8 stabilizer.
"""
from __future__ import annotations

import jax.numpy as jnp


def znorm(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    return (x - mean) / std


def znorm_fit(x: jnp.ndarray):
    """Normalize x with its own column stats. Returns (normed, mean, std)."""
    mean = x.mean(axis=0)
    std = x.std(axis=0, ddof=1) + 1e-8
    return (x - mean) / std, mean, std
