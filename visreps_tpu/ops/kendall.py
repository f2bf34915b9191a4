"""Sort-free batched Kendall tau-a bootstrap kernel.

The reference scores Kendall bootstraps with a serial scipy call per
iteration (reference: visreps/analysis/rsa.py:22-47, evals.py:355-373).
The general device path (ops/stats.kendall_tau_a) replaces scipy but
still pays O(M log² M) merge rounds PER ITERATION (~10/s at n≈1000).

This kernel exploits the subset structure of bootstrap resampling the
same way the Spearman kernel does (ops/bootstrap._spearman_fast_body):
every iteration's pair set is a SUBSET of the full RDM triangle, so the
entire sorting structure can be computed ONCE:

  * Knight's algorithm needs D = #strict inversions of the vb-sequence
    after lexsorting pairs by (va, vb). Build the full triangle's merge
    tree once: at each of the log2(P) levels, record (a) the
    permutation from level arrangement to triangle slots and (b) for
    every right-half element, the PRECOMPUTED binary-search boundary of
    its value in the paired left block.
  * Per iteration, masked cross-block inversions at every level are
    then just: permute the 0/1 selection mask by the level order,
    one cumsum, and two gathers at precomputed positions — no sorts,
    no searchsorted, no data-dependent shapes.
  * Tie-pair corrections (t_x, t_y, t_xy) restricted to the mask come
    from the same cumsum trick over precomputed tie-group-start
    positions.

Per-iteration work is O(M log M) gathers/cumsums with tiny constants;
tie handling is EXACT tau-a semantics (identical to the general
kernel / scipy tau-b→tau-a conversion) — not an approximation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _group_starts(eq_prev: jnp.ndarray) -> jnp.ndarray:
    """Position of each element's tie-group start in a sorted order.

    eq_prev[i] = True when element i has the same key as element i-1
    (eq_prev[0] = False). One max-scan.
    """
    n = eq_prev.shape[0]
    idx = jnp.arange(n)
    return jax.lax.associative_scan(jnp.maximum, jnp.where(eq_prev, 0, idx))


def _binary_upper_bound(L: jnp.ndarray, q: jnp.ndarray, w: int) -> jnp.ndarray:
    """Per-row upper-bound positions of q in sorted rows L (width w).

    Explicit take_along_axis binary search (avoids searchsorted's
    pathological lowering on the remote-compile toolchain, see
    ops/stats._count_inversions).
    """
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, w, jnp.int32)
    for _ in range(max(1, w.bit_length())):
        mid = (lo + hi) // 2
        vals = jnp.take_along_axis(L, jnp.clip(mid, 0, w - 1), axis=1)
        go_right = (vals <= q) & (mid < w)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo  # #elements in L ≤ q


def kendall_precompute(va: jnp.ndarray, vb: jnp.ndarray):
    """Build the shared sorting structure for masked tau-a evaluation.

    va, vb: (M,) full-triangle value vectors. Returns a dict of
    device arrays; see module docstring for the scheme.
    """
    M = va.shape[0]
    P = _next_pow2(max(M, 2))
    va = va.astype(jnp.float32)
    vb = vb.astype(jnp.float32)

    order0 = jnp.lexsort((vb, va))  # sort by va, ties by vb
    xs = va[order0]
    ys = vb[order0]

    inf = jnp.float32(jnp.inf)
    y_pad = jnp.concatenate([ys, jnp.full((P - M,), inf, jnp.float32)])
    # perm: level position -> triangle slot (pad slots >= M gather 0s)
    perm0 = jnp.concatenate([order0.astype(jnp.int32),
                             jnp.arange(M, P, dtype=jnp.int32)])

    # Tie-group starts in the lexsorted arrangement (pad = own group each).
    eq_x = jnp.concatenate([jnp.zeros((1,), bool), xs[1:] == xs[:-1],
                            jnp.zeros((P - M,), bool)])
    eq_xy = jnp.concatenate([
        jnp.zeros((1,), bool), (xs[1:] == xs[:-1]) & (ys[1:] == ys[:-1]),
        jnp.zeros((P - M,), bool)])
    sg_x = _group_starts(eq_x)
    sg_xy = _group_starts(eq_xy)

    # vb-sorted arrangement for t_y.
    order_b = jnp.argsort(vb).astype(jnp.int32)
    ybs = vb[order_b]
    perm_b = jnp.concatenate([order_b, jnp.arange(M, P, dtype=jnp.int32)])
    eq_y = jnp.concatenate([jnp.zeros((1,), bool), ybs[1:] == ybs[:-1],
                            jnp.zeros((P - M,), bool)])
    sg_y = _group_starts(eq_y)

    # Merge tree: per level, (perm, gA, gB) such that the masked
    # cross-block inversion count is Σ_r mask_r · (ex[gA_r] − ex[gB_r])
    # with ex = exclusive cumsum of the permuted mask.
    a = y_pad
    perm = perm0
    perms, gAs, gBs = [], [], []
    w = 1
    while w < P:
        nb = P // (2 * w)
        blocks = a.reshape(nb, 2, w)
        L, R = blocks[:, 0, :], blocks[:, 1, :]
        ub = _binary_upper_bound(L, R, w)  # (nb, w): #L ≤ r
        base = (jnp.arange(nb, dtype=jnp.int32) * 2 * w)[:, None]
        gA_R = base + w                     # L block end (exclusive)
        gB_R = base + ub.astype(jnp.int32)  # first L element > r
        # L-half positions contribute nothing: gA == gB == 0.
        gA = jnp.concatenate(
            [jnp.zeros((nb, w), jnp.int32), jnp.broadcast_to(gA_R, (nb, w))], axis=1
        ).reshape(-1)
        gB = jnp.concatenate([jnp.zeros((nb, w), jnp.int32), gB_R], axis=1).reshape(-1)
        perms.append(perm)
        gAs.append(gA)
        gBs.append(gB)
        # merge by re-sorting each 2w block, tracking slot identity
        merged = blocks.reshape(nb, 2 * w)
        o = jnp.argsort(merged, axis=1, stable=True)
        a = jnp.take_along_axis(merged, o, axis=1).reshape(-1)
        perm = jnp.take_along_axis(perm.reshape(nb, 2 * w), o, axis=1).reshape(-1)
        w *= 2

    return {
        "P": P, "M": M,
        "perm0": perm0, "sg_x": sg_x, "sg_xy": sg_xy,
        "perm_b": perm_b, "sg_y": sg_y,
        "perms": jnp.stack(perms), "gAs": jnp.stack(gAs), "gBs": jnp.stack(gBs),
    }


def _tie_pairs(maskp: jnp.ndarray, perm: jnp.ndarray, sg: jnp.ndarray) -> jnp.ndarray:
    """Σ_g C(c_g_selected, 2) over tie groups of one sorted order."""
    m = maskp[perm]
    c = jnp.cumsum(m)
    exc = c - m  # selected strictly before each position
    return jnp.sum(m * (exc - exc[sg]))


def masked_tau_a(maskp: jnp.ndarray, pre: dict, n0: jnp.ndarray) -> jnp.ndarray:
    """tau-a over the pairs where maskp == 1 (padded to P).

    n0 = #selected pairs choose... = m(m−1)/2 over selected PAIR count?
    No: n0 is C(m, 2) over selected pair VALUES — i.e. #selected-pairs ·
    (#selected-pairs − 1) / 2, passed in by the caller (constant across
    bootstrap iterations of fixed subsample size).
    """
    t_x = _tie_pairs(maskp, pre["perm0"], pre["sg_x"])
    t_xy = _tie_pairs(maskp, pre["perm0"], pre["sg_xy"])
    t_y = _tie_pairs(maskp, pre["perm_b"], pre["sg_y"])

    def level(_, lvl):
        perm, gA, gB = lvl
        m = maskp[perm]
        ex = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(m)])
        d = jnp.sum(m * (ex[gA] - ex[gB]))
        # emit per-level counts instead of carrying a scalar sum: a
        # varying carry trips shard_map's vma check inside the sharded
        # bootstrap path.
        return _, d

    _, ds = jax.lax.scan(level, jnp.float32(0.0),
                         (pre["perms"], pre["gAs"], pre["gBs"]))
    D = jnp.sum(ds)
    c_minus_d = n0 - t_x - t_y + t_xy - 2.0 * D
    return jnp.where(n0 > 0, c_minus_d / n0, jnp.nan)


def _kendall_fast_body(rdm_a, rdm_b, idx, chunk: int):
    """Batched masked tau-a over bootstrap index sets, LANE-MAJOR.

    Exactly matches gathering each sub-RDM triangle and running
    ops/stats.kendall_tau_a (tau is invariant to pair order, and tie
    handling here is exact), at a fraction of the per-iteration cost.

    Layout: the bootstrap-iteration axis is kept LAST — masks live as
    (P, chunk) with iterations in the lane dimension — so every
    merge-tree permutation/boundary gather fetches a CONTIGUOUS
    chunk-wide row (≈256 B/read at chunk=64) instead of one scalar.
    The per-level random gathers are the kernel's bottleneck; the
    vmapped scalar-gather formulation measured ~110 bootstraps/s on
    v5e, two orders of magnitude under HBM speed-of-light for the
    same bytes.
    """
    n = rdm_a.shape[0]
    m_sub = idx.shape[1]
    iu, ju = jnp.triu_indices(n, k=1)
    va = rdm_a[iu, ju].astype(jnp.float32)
    vb = rdm_b[iu, ju].astype(jnp.float32)
    pre = kendall_precompute(va, vb)
    P, M = pre["P"], pre["M"]

    m_pairs = (m_sub * (m_sub - 1)) // 2
    n0 = jnp.float32(m_pairs) * jnp.float32(m_pairs - 1) / 2.0

    def batch(ix):  # (c, m_sub) index sets → (c,) tau-a scores
        c = ix.shape[0]
        inc = jnp.zeros((c, n), jnp.float32).at[
            jnp.arange(c)[:, None], ix].set(1.0).T          # (n, c)
        mask = inc[iu] * inc[ju]                             # (M, c) row gathers
        maskp = jnp.concatenate(
            [mask, jnp.zeros((P - M, c), jnp.float32)], axis=0)

        def tie_pairs(perm, sg):
            m = maskp[perm]                                  # (P, c)
            exc = jnp.cumsum(m, axis=0) - m                  # selected strictly before
            return jnp.sum(m * (exc - exc[sg]), axis=0)      # (c,)

        t_x = tie_pairs(pre["perm0"], pre["sg_x"])
        t_xy = tie_pairs(pre["perm0"], pre["sg_xy"])
        t_y = tie_pairs(pre["perm_b"], pre["sg_y"])

        zrow = jnp.zeros((1, c), jnp.float32)

        def level(carry, lvl):
            perm, gA, gB = lvl
            m = maskp[perm]                                  # (P, c)
            ex = jnp.concatenate([zrow, jnp.cumsum(m, axis=0)], axis=0)
            # emit per-level counts instead of accumulating in the
            # carry: a varying carry trips shard_map's vma check in
            # the sharded bootstrap path.
            return carry, jnp.sum(m * (ex[gA] - ex[gB]), axis=0)

        _, ds = jax.lax.scan(level, jnp.float32(0.0),
                             (pre["perms"], pre["gAs"], pre["gBs"]))
        D = jnp.sum(ds, axis=0)                              # (c,)
        c_minus_d = n0 - t_x - t_y + t_xy - 2.0 * D
        return jnp.where(n0 > 0, c_minus_d / n0, jnp.nan)

    n_boot = idx.shape[0]
    chunk = min(chunk, n_boot)
    n_chunks = -(-n_boot // chunk)
    pad = n_chunks * chunk - n_boot
    idx_p = jnp.concatenate([idx, idx[:pad]]) if pad else idx
    scores = jax.lax.map(batch, idx_p.reshape(n_chunks, chunk, m_sub))
    return scores.reshape(-1)[:n_boot]


bootstrap_kendall_fast = jax.jit(_kendall_fast_body, static_argnames=("chunk",))
