"""Sort-free batched Kendall tau-a bootstrap kernel.

The reference scores Kendall bootstraps with a serial scipy call per
iteration (reference: visreps/analysis/rsa.py:22-47, evals.py:355-373).
The general device path (ops/stats.kendall_tau_a) replaces scipy but
still pays O(M log² M) merge rounds PER ITERATION (~10/s at n≈1000).

This kernel exploits the subset structure of bootstrap resampling the
same way the Spearman kernel does (ops/bootstrap._spearman_fast_body):
every iteration's pair set is a SUBSET of the full RDM triangle, so the
entire sorting structure is computed ONCE (`kendall_precompute`), and
each iteration reduces to masked counting. Three kernel-shaping rules,
each worth integer factors on v5e (measured via /tmp probes, r3):

  * LANE-MAJOR masks: iterations live in the LAST axis — (P, chunk)
    tensors — so every permutation/boundary gather reads a contiguous
    chunk-wide row instead of one scalar (the vmapped scalar layout
    measured ~110 bootstraps/s; per-step cost was nearly independent
    of lane width, so wide chunks amortize it).
  * FOLDED LOW LEVELS: merge-tree levels with block width < _FOLD_B
    are replaced by ONE batched pair-matrix contraction — the
    within-32-block strict-inversion indicator A[b, i, j] is static,
    so the masked count is einsum("bij,bjc->bic")·mask, riding the MXU
    instead of five rounds of prefix scans.
  * BLOCK-LOCAL PREFIXES: the remaining levels only need prefix counts
    WITHIN each merged block, so their cumsums run over the (short)
    block axis of (nb, B, c) — log(B) scan passes instead of log(P).

Tie-pair corrections (t_x, t_y, t_xy) restricted to the mask use
global cumsums over precomputed tie-group-start gathers; tie handling
is EXACT tau-a semantics (identical to ops/stats.kendall_tau_a /
scipy's tau-b→tau-a conversion) — not an approximation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_FOLD_B = 32  # merge levels below this block width fold into one matmul


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

    va, vb: (M,) full-triangle value vectors. Returns a dict with the
    tie-group structures, the folded low-level pair matrix `A`
    (nb0, B0, B0), and per-level (perm, lgA, lgB, nb, B) tuples for the
    block-local levels; see module docstring for the scheme.
    """
    M = int(va.shape[0])
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

    # Folded low levels: strict-inversion pair matrix within B0-blocks
    # of the level-1 (lexsorted) arrangement. Pad slots carry y = +inf
    # but their mask is always 0, so spurious A entries contribute 0.
    B0 = min(_FOLD_B, P)
    nb0 = P // B0
    yb = y_pad.reshape(nb0, B0)
    i_lt_j = jnp.arange(B0)[:, None] < jnp.arange(B0)[None, :]
    A = ((yb[:, :, None] > yb[:, None, :]) & i_lt_j[None]).astype(jnp.float32)

    # Merge tree: build arrangements by repeated within-block sorting.
    # Levels with w < B0 are covered by A; store (perm, local gA/gB)
    # for the rest. lgA/lgB index a per-block (B+1)-long exclusive
    # prefix layout: lex[b*(B+1)+k] = #selected in block b's first k.
    a = y_pad
    perm = perm0
    levels = []
    w = 1
    while w < P:
        nb = P // (2 * w)
        B = 2 * w
        blocks = a.reshape(nb, 2, w)
        if w >= B0:
            L, R = blocks[:, 0, :], blocks[:, 1, :]
            ub = _binary_upper_bound(L, R, w)  # (nb, w): #L ≤ r
            blk = (jnp.arange(nb, dtype=jnp.int32) * (B + 1))[:, None]
            lgA_R = blk + w                      # left-block total
            lgB_R = blk + ub.astype(jnp.int32)   # #L ≤ r
            zero = jnp.zeros((nb, w), jnp.int32)  # left rows: lex[0]−lex[0]
            lgA = jnp.concatenate([zero, jnp.broadcast_to(lgA_R, (nb, w))],
                                  axis=1).reshape(-1)
            lgB = jnp.concatenate([zero, lgB_R], axis=1).reshape(-1)
            levels.append((perm, lgA, lgB, nb, B))
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
        "A": A, "B0": B0, "levels": levels,
    }


def _kendall_fast_body(rdm_a, rdm_b, idx, chunk: int):
    """Batched masked tau-a over bootstrap index sets (lane-major).

    Exactly matches gathering each sub-RDM triangle and running
    ops/stats.kendall_tau_a (tau is invariant to pair order, and tie
    handling here is exact), at a fraction of the per-iteration cost.
    """
    n = rdm_a.shape[0]
    m_sub = idx.shape[1]
    iu, ju = jnp.triu_indices(n, k=1)
    va = rdm_a[iu, ju].astype(jnp.float32)
    vb = rdm_b[iu, ju].astype(jnp.float32)
    pre = kendall_precompute(va, vb)
    P, M, B0 = pre["P"], pre["M"], pre["B0"]
    nb0 = P // B0

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

        # Folded low levels: one batched pair-matrix contraction.
        mp0 = maskp[pre["perm0"]]                            # (P, c)
        mb0 = mp0.reshape(nb0, B0, c)
        s = jnp.einsum("bij,bjc->bic", pre["A"], mb0)
        D = jnp.sum(mb0 * s, axis=(0, 1))                    # (c,)

        # Remaining levels: block-local exclusive prefixes.
        for perm, lgA, lgB, nb, B in pre["levels"]:
            m = maskp[perm]                                  # (P, c)
            mb = m.reshape(nb, B, c)
            lex = jnp.concatenate(
                [jnp.zeros((nb, 1, c), jnp.float32), jnp.cumsum(mb, axis=1)],
                axis=1).reshape(nb * (B + 1), c)
            D = D + jnp.sum(m * (lex[lgA] - lex[lgB]), axis=0)

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
