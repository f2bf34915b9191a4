"""Batched Kendall tau-a bootstrap as three static MXU contractions.

The reference scores Kendall bootstraps with a serial scipy call per
iteration (reference: visreps/analysis/rsa.py:22-47, evals.py:355-373).
The general device path (ops/stats.kendall_tau_a) replaces scipy but
still pays O(M log² M) merge rounds PER ITERATION (~10/s at n≈1000).

Like the Spearman fast path (ops/bootstrap._spearman_fast_body), this
kernel exploits the subset structure of bootstrap resampling: every
iteration's pair set is a subset of the full RDM triangle, so ALL
ordering structure is computed once and each iteration reduces to a
masked pair count. Earlier revisions evaluated that count with a
merge tree (log₂ P levels of (P, c) gathers + prefix scans) and
plateaued ~300 bootstraps/s — the levels are pure HBM traffic. This
revision removes the tree entirely:

Let lex = sort by (x, y) and σ = STABLE argsort of y over the lex
arrangement. Stability makes the discordant count tie-free: within an
x-tie group y is ascending, and within a y-tie group σ preserves lex
order, so

    D = #{ pairs: lexpos_i < lexpos_j  AND  σpos_i > σpos_j }

is a pure two-permutation inversion count (no value comparisons).
Partition the pairs by B-sized position blocks (B = 1024, MXU-shaped):

  1. same lex block   → m_bᵀ A_b m_b with A the static in-block
                        inversion indicator — one batched einsum;
  2. same y block,
     different lex    → m'_tᵀ A2_t m'_t over the σ arrangement;
  3. different both   → a quadratic form over the (lexblock, yblock)
                        joint histogram J (built by one one-hot
                        einsum), with two 512-length prefix sums.

Every heavy op is a dense contraction riding the MXU; the only
remaining (P, c) gathers are the two mask permutations and three
tie-correction boundary lookups. Exclusive prefixes for the tie terms
(t_x, t_y, t_xy — exact tau-a semantics, identical to scipy's
tau-b→tau-a conversion) also run as a strict-lower-triangular matmul
plus a 512-length carry, not a log-depth scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BLOCK = 1024  # position-block width for the pair-matrix contractions


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


def kendall_precompute(va: jnp.ndarray, vb: jnp.ndarray):
    """Build the static ordering structure for masked tau-a evaluation.

    va, vb: (M,) full-triangle value vectors. Returns the two mask
    permutations (lex, y-stable), tie-group starts, and the three
    block-structured contraction operands (A, A2, E) described in the
    module docstring.
    """
    M = int(va.shape[0])
    P = _next_pow2(max(M, 2))
    B = min(_BLOCK, P)
    nb = P // B
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

    # Stable y-sort of the lex arrangement: pads (y=+inf) stay last.
    sigma = jnp.argsort(y_pad, stable=True).astype(jnp.int32)
    spos = jnp.zeros((P,), jnp.int32).at[sigma].set(
        jnp.arange(P, dtype=jnp.int32))          # lex slot -> y position
    perm_y = perm0[sigma]                        # y position -> triangle slot

    # Tie-group starts, lex arrangement (pad = own group each).
    eq_x = jnp.concatenate([jnp.zeros((1,), bool), xs[1:] == xs[:-1],
                            jnp.zeros((P - M,), bool)])
    eq_xy = jnp.concatenate([
        jnp.zeros((1,), bool), (xs[1:] == xs[:-1]) & (ys[1:] == ys[:-1]),
        jnp.zeros((P - M,), bool)])
    sg_x = _group_starts(eq_x)
    sg_xy = _group_starts(eq_xy)

    # Tie-group starts over the y-sorted arrangement.
    ysorted = y_pad[sigma]
    eq_y = jnp.concatenate([jnp.zeros((1,), bool),
                            (ysorted[1:] == ysorted[:-1]) & jnp.isfinite(ysorted[1:])])
    sg_y = _group_starts(eq_y)

    iu = jnp.arange(B)
    i_lt_j = iu[:, None] < iu[None, :]

    # (1) same-lex-block inversions: σpos decreasing while lexpos increasing
    sp = spos.reshape(nb, B)
    A = ((sp[:, :, None] > sp[:, None, :]) & i_lt_j[None]).astype(jnp.bfloat16)

    # (2) same-y-block, different-lex-block: in the σ arrangement the
    # element at the larger y position (v) must come from a strictly
    # smaller lex block.
    lexblk = (sigma // B).reshape(nb, B)
    A2 = ((lexblk[:, None, :] < lexblk[:, :, None]) & i_lt_j[None]
          ).astype(jnp.bfloat16)

    # (3) joint-histogram one-hot: E[p, i, s] = [yblock of lex slot
    # (p, i) == s]
    yblk = (spos // B).reshape(nb, B)
    E = (yblk[:, :, None] == jnp.arange(nb)[None, None, :]).astype(jnp.bfloat16)

    # Exclusive-prefix operator (strict lower triangle).
    T = (iu[:, None] > iu[None, :]).astype(jnp.bfloat16)

    return {
        "P": P, "M": M, "B": B, "nb": nb,
        "perm0": perm0, "perm_y": perm_y,
        "sg_x": sg_x, "sg_xy": sg_xy, "sg_y": sg_y,
        "A": A, "A2": A2, "E": E, "T": T,
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
    P, M, B, nb = pre["P"], pre["M"], pre["B"], pre["nb"]
    A, A2, E, T = pre["A"], pre["A2"], pre["E"], pre["T"]
    f32 = jnp.float32

    m_pairs = (m_sub * (m_sub - 1)) // 2
    n0 = f32(m_pairs) * f32(m_pairs - 1) / 2.0

    def excl_prefix(mb):
        """(nb, B, c) masks → flattened (P, c) exclusive prefix counts."""
        w = jnp.einsum("ij,bjc->bic", T, mb, preferred_element_type=f32)
        totals = w[:, -1, :] + mb[:, -1, :].astype(f32)         # (nb, c)
        carry = jnp.cumsum(totals, axis=0) - totals             # exclusive
        return (w + carry[:, None, :]).reshape(P, -1)

    def batch(ix):  # (c, m_sub) index sets → (c,) tau-a scores
        c = ix.shape[0]
        inc = jnp.zeros((c, n), f32).at[
            jnp.arange(c)[:, None], ix].set(1.0).T              # (n, c)
        mask = inc[iu] * inc[ju]                                # (M, c)
        maskp = jnp.concatenate(
            [mask, jnp.zeros((P - M, c), f32)], axis=0).astype(jnp.bfloat16)

        m_lex = maskp[pre["perm0"]].reshape(nb, B, c)           # (nb, B, c)
        m_y = maskp[pre["perm_y"]].reshape(nb, B, c)

        exc_lex = excl_prefix(m_lex)                            # (P, c) f32
        exc_y = excl_prefix(m_y)
        ml_flat = m_lex.reshape(P, c).astype(f32)
        my_flat = m_y.reshape(P, c).astype(f32)

        def tie_pairs(m, exc, sg):
            return jnp.sum(m * (exc - exc[sg]), axis=0)         # (c,)

        t_x = tie_pairs(ml_flat, exc_lex, pre["sg_x"])
        t_xy = tie_pairs(ml_flat, exc_lex, pre["sg_xy"])
        t_y = tie_pairs(my_flat, exc_y, pre["sg_y"])

        # (1) same lex block
        s1 = jnp.einsum("bij,bjc->bic", A, m_lex, preferred_element_type=f32)
        D = jnp.einsum("bic,bic->c", m_lex.astype(f32), s1)
        # (2) same y block, different lex block
        s2 = jnp.einsum("tuv,tvc->tuc", A2, m_y, preferred_element_type=f32)
        D = D + jnp.einsum("tuc,tuc->c", m_y.astype(f32), s2)
        # (3) different lex and y blocks: joint histogram quadratic form
        J = jnp.einsum("pis,pic->psc", E, m_lex, preferred_element_type=f32)
        Jp = jnp.cumsum(J, axis=0) - J                          # Σ_{p<q}
        rev = jnp.cumsum(Jp[:, ::-1, :], axis=1)[:, ::-1, :]
        G = rev - Jp                                            # Σ_{s>t}
        D = D + jnp.einsum("qtc,qtc->c", G, J)

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
