"""Device-native rank statistics and correlation kernels.

The reference computes RDM comparisons with scipy on CPU
(reference: visreps/analysis/rsa.py:22-47, _CORR_FUNCS) — one serial
scipy call per bootstrap iteration. Here every statistic is a pure
jnp function, jit/vmap-able, so 1000 bootstrap correlations over
~400k-element upper triangles run as one batched device program.

Numerics:
  * ``rankdata_average`` reproduces scipy.stats.rankdata("average")
    via two searchsorteds on the sorted array — O(n log n), fully
    vectorized, no sequential tie scanning.
  * ``kendall_tau_a`` implements Knight's O(n log n) algorithm with a
    device-parallel inversion count: log2(n) merge rounds, each round a
    batched searchsorted + blocked re-sort. Inversion totals are
    accumulated per-slot in int32 (each slot ≤ n < 2^24) and reduced in
    float32, giving ~1e-6 relative accuracy on the tau estimate.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rankdata_dense(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Dense ranking via double argsort (ties get consecutive ranks).

    Matches the reference's row-wise ``_rank`` used to build Spearman
    RDMs (reference: visreps/analysis/rsa.py:50-52). Ranks start at 0.
    """
    return jnp.argsort(jnp.argsort(x, axis=axis), axis=axis).astype(jnp.float32)


def rankdata_average(x: jnp.ndarray) -> jnp.ndarray:
    """scipy-compatible average ranks (1-based) for a 1-D array.

    Tie groups are contiguous after sorting; each group's [start, end]
    positions come from two max-scans over the group-boundary markers,
    and every member gets the mean rank (start+end)/2 + 1. Built from
    argsort + associative_scan + gather only — no searchsorted, no
    scatter — which keeps the XLA graph lean (large fused searchsorted
    graphs compile pathologically slowly on some TPU toolchains).
    """
    n = x.shape[0]
    order = jnp.argsort(x)
    xs = x[order]
    inv = jnp.argsort(order)  # sorted position of each original element
    idx = jnp.arange(n)
    new_grp = jnp.concatenate([jnp.ones((1,), bool), xs[1:] != xs[:-1]])
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(new_grp, idx, 0))
    end_marker = jnp.concatenate([new_grp[1:], jnp.ones((1,), bool)])
    end_rev = jax.lax.associative_scan(jnp.maximum, jnp.where(end_marker[::-1], idx, 0))
    end = (n - 1) - end_rev[::-1]
    avg_sorted = (start + end).astype(jnp.float32) / 2.0 + 1.0
    return avg_sorted[inv]


def pearson_corr(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation of two 1-D vectors (float32 in/f32 out)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xc = x - x.mean()
    yc = y - y.mean()
    denom = jnp.sqrt(jnp.sum(xc * xc) * jnp.sum(yc * yc))
    return jnp.where(denom > 0, jnp.sum(xc * yc) / denom, jnp.nan)


def spearman_corr(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Spearman rho with scipy-style average tie ranks."""
    return pearson_corr(rankdata_average(x), rankdata_average(y))


def spearman_corr_dense(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Spearman rho via dense (tie-broken) ranks and the Σd² formula.

    Dense ranks are permutations of 0..n−1, so
    rho = 1 − 6·Σd² / (n(n²−1)) exactly. Identical to scipy when the
    values are distinct (the typical case for float RDM triangles);
    exact ties get arbitrary consecutive ranks instead of averages.
    The graph is four argsorts + a reduction — far leaner to compile
    than the average-rank machinery, which matters on TPU toolchains
    with expensive remote compilation.
    """
    n = x.shape[0]
    rx = jnp.argsort(jnp.argsort(x)).astype(jnp.float32)
    ry = jnp.argsort(jnp.argsort(y)).astype(jnp.float32)
    d2 = jnp.sum((rx - ry) ** 2)
    nf = jnp.float32(n)
    return 1.0 - 6.0 * d2 / (nf * (nf * nf - 1.0))


# ─────────────────────── Kendall tau-a ────────────────────────


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _tie_pair_count(v_sorted: jnp.ndarray, n: int) -> jnp.ndarray:
    """Σ c·(c−1)/2 over tie groups of a SORTED vector (float32).

    With a_i = start position of element i's tie group,
    Σ_i (i − a_i) = Σ_groups Σ_{j<c} j = Σ c(c−1)/2. One max-scan.
    """
    idx = jnp.arange(n)
    new_grp = jnp.concatenate([jnp.ones((1,), bool), v_sorted[1:] != v_sorted[:-1]])
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(new_grp, idx, 0))
    return jnp.sum((idx - start).astype(jnp.float32))


def _count_inversions(y: jnp.ndarray) -> jnp.ndarray:
    """Number of strict inversions (i<j, y_i>y_j) of a 1-D float array.

    Device-parallel merge rounds: at round w the array is a sequence of
    sorted blocks of width w; cross-block inversions between adjacent
    (L, R) pairs are counted with a batched searchsorted, then blocks
    are merged by re-sorting. Total O(n log² n) vector work, log n
    rounds — replaces scipy's sequential mergesort.
    Returns float32 (exact per-slot int32 accumulation, f32 reduce).
    """
    n = y.shape[0]
    P = _next_pow2(max(n, 2))
    pad = jnp.full((P - n,), jnp.inf, dtype=jnp.float32)
    a = jnp.concatenate([y.astype(jnp.float32), pad])
    # Per-slot accumulator: each slot's total over all rounds ≤ P < 2^31.
    acc = jnp.zeros((P // 2,), dtype=jnp.int32)

    w = 1
    while w < P:
        nb = P // (2 * w)
        blocks = a.reshape(nb, 2, w)
        L, R = blocks[:, 0, :], blocks[:, 1, :]
        # inversions for r in R against L: #{l in L : l > r}, via an
        # explicit batched binary search (take_along_axis + select only
        # — avoids searchsorted's heavyweight lowering inside a large
        # fused graph).
        lo = jnp.zeros(R.shape, jnp.int32)
        hi = jnp.full(R.shape, w, jnp.int32)
        for _ in range(max(1, w.bit_length())):
            mid = (lo + hi) // 2
            vals = jnp.take_along_axis(L, jnp.clip(mid, 0, w - 1), axis=1)
            go_right = (vals <= R) & (mid < w)
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        counts = (w - lo).astype(jnp.int32)  # (nb, w), each ≤ w
        acc = acc.at[: nb * w].add(counts.reshape(-1))
        a = jnp.sort(blocks.reshape(nb, 2 * w), axis=-1).reshape(-1)
        w *= 2

    return jnp.sum(acc.astype(jnp.float32))


@partial(jax.jit, static_argnames=())
def kendall_tau_a(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Kendall tau-a = (C − D) / n0, tie pairs counted as neither.

    Knight's algorithm on device: sort by (x, then y); discordant D =
    strict inversions of the y-sequence; C − D = n0 − t_x − t_y + t_xy − 2D.
    Matches the reference's tau-b→tau-a conversion of scipy
    (reference: visreps/analysis/rsa.py:22-40) without the O(n log n)
    CPU serialization.
    """
    n = x.shape[0]
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    order = jnp.lexsort((y, x))
    xs = x[order]
    ys = y[order]

    n0 = 0.5 * n * (n - 1)
    t_x = _tie_pair_count(xs, n)
    t_y = _tie_pair_count(jnp.sort(y), n)

    # Joint ties: contiguous runs of equal (x, y) after the lexsort.
    same = (xs[1:] == xs[:-1]) & (ys[1:] == ys[:-1])
    # group id per element; run length via segment counting
    gid = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(1 - same.astype(jnp.int32))])
    run_sizes = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), gid, num_segments=n)
    t_xy = jnp.sum(run_sizes * (run_sizes - 1)) / 2.0

    d = _count_inversions(ys)
    c_minus_d = n0 - t_x - t_y + t_xy - 2.0 * d
    return jnp.where(n0 > 0, c_minus_d / n0, jnp.nan)
