"""Vectorized bootstrap resampling for RDM correlations.

The reference's dominant eval cost is this loop: 1000 serial scipy
Spearman calls over ~400k-element sub-RDM upper triangles per
(subject, region) (reference: visreps/evals.py:355-373,
visreps/analysis/rsa.py:233-257). Here the 1000 iterations are a
batched device computation: index sets are generated host-side with
numpy's RandomState (bit-exact parity with the reference's
``rng.choice(n, size, replace=False)`` draws), then the sub-RDM
gather → rank → correlate pipeline runs as a chunked vmap.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from visreps_tpu.ops.stats import kendall_tau_a, pearson_corr, spearman_corr

_CORR = {
    "pearson": pearson_corr,
    "spearman": spearman_corr,
    "kendall": kendall_tau_a,
}


def bootstrap_indices(
    n_test: int,
    n_bootstrap: int = 1000,
    subsample_frac: float = 0.9,
    seed: int = 42,
) -> np.ndarray:
    """(n_bootstrap, n_sub) without-replacement index sets.

    Uses np.random.RandomState so the index streams are IDENTICAL to
    the reference's serial draws (visreps/evals.py:356-364): same seed,
    same per-iteration ``choice(n, size=int(n*0.9), replace=False)``.
    """
    rng = np.random.RandomState(seed)
    n_sub = int(n_test * subsample_frac)
    return np.stack(
        [rng.choice(n_test, size=n_sub, replace=False) for _ in range(n_bootstrap)]
    ).astype(np.int32)


@partial(jax.jit, static_argnames=("method", "chunk"))
def _bootstrap_scores(rdm_a, rdm_b, idx, method: str, chunk: int):
    m = idx.shape[1]
    iu, ju = jnp.triu_indices(m, k=1)

    def one(ix):
        # Gather the sub-RDM's upper triangle DIRECTLY from the full
        # matrix (one m(m−1)/2 gather per matrix) instead of building
        # the (m, m) sub-matrix first — half the memory traffic and a
        # much leaner XLA graph.
        ia = ix[iu]
        ja = ix[ju]
        return _CORR[method](rdm_a[ia, ja], rdm_b[ia, ja])

    n_boot = idx.shape[0]
    chunk = min(chunk, n_boot)  # keep pad < n_boot so idx[:pad] suffices
    n_chunks = -(-n_boot // chunk)
    pad = n_chunks * chunk - n_boot
    idx_p = jnp.concatenate([idx, idx[:pad]]) if pad else idx
    scores = jax.lax.map(jax.vmap(one), idx_p.reshape(n_chunks, chunk, m))
    return scores.reshape(-1)[:n_boot]


def bootstrap_rdm_correlation(
    rdm_model,
    rdm_neural,
    n_bootstrap: int = 1000,
    subsample_frac: float = 0.9,
    seed: int = 42,
    method: str = "spearman",
    chunk: int = 16,
    indices: np.ndarray | None = None,
) -> np.ndarray:
    """Bootstrap distribution of RDM correlations (float64 numpy out).

    Gathers a (m, m) sub-RDM per iteration, vectorizes its upper
    triangle, and correlates — ``chunk`` iterations at a time to bound
    HBM for the rank sorts. Returns the full score distribution for
    percentile CIs (reference computes 2.5/97.5 percentiles).
    """
    rdm_model = jnp.asarray(rdm_model, dtype=jnp.float32)
    rdm_neural = jnp.asarray(rdm_neural, dtype=jnp.float32)
    if indices is None:
        indices = bootstrap_indices(rdm_model.shape[0], n_bootstrap, subsample_frac, seed)
    scores = _bootstrap_scores(
        rdm_model, rdm_neural, jnp.asarray(indices), method.lower(), chunk
    )
    return np.asarray(scores, dtype=np.float64)


def percentile_ci(scores: np.ndarray, low: float = 2.5, high: float = 97.5):
    return float(np.percentile(scores, low)), float(np.percentile(scores, high))
