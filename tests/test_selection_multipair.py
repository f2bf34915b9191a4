"""Parity tests for subject-grouped phase-1 selection and exact-tie
Spearman selection (round-3 additions).

The multipair kernel (analysis/rsa._select_scores_multipair) must
produce bit-comparable scores to the per-pair batched kernel — the
grouping only shares the model-side rank work, it must not change any
number. Exact-tie selection must match scipy.spearmanr on tied inputs.
"""
import numpy as np
import pytest
import scipy.stats

import jax.numpy as jnp

from visreps_tpu.analysis.rsa import (
    _select_scores_batched,
    _select_scores_multipair,
    select_best_layer,
)
from visreps_tpu.ops.rdm import compute_rdm, triangle_tie_count


@pytest.fixture
def pair_fixture(rng):
    n, d, L, R = 40, 32, 5, 3
    stacked = rng.randn(L, n, d).astype(np.float32)
    neurals = [rng.randn(n, 8 + 4 * r).astype(np.float32) for r in range(R)]
    return stacked, neurals


@pytest.mark.parametrize("method", ["pearson", "spearman", "kendall"])
def test_multipair_matches_per_pair(pair_fixture, method):
    stacked, neurals = pair_fixture
    neural_rdms = jnp.stack([compute_rdm(jnp.asarray(x)) for x in neurals])
    multi = np.asarray(
        _select_scores_multipair(jnp.asarray(stacked), neural_rdms, method))
    assert multi.shape == (len(neurals), stacked.shape[0])
    for r, x in enumerate(neurals):
        single = np.asarray(
            _select_scores_batched(jnp.asarray(stacked), jnp.asarray(x), method))
        np.testing.assert_allclose(multi[r], single, rtol=0, atol=2e-5)


def test_multipair_exact_ties_matches_scipy(rng):
    # Degenerate rows force clamped (tied) RDM entries.
    n, d, L = 24, 16, 3
    stacked = rng.randn(L, n, d).astype(np.float32)
    stacked[0, :6] = stacked[0, 0]  # identical rows → tied RDM values
    neural = rng.randn(n, 10).astype(np.float32)
    neural[:4] = neural[0]

    neural_rdm = compute_rdm(jnp.asarray(neural))
    assert int(triangle_tie_count(neural_rdm)) > 0
    multi = np.asarray(_select_scores_multipair(
        jnp.asarray(stacked), neural_rdm[None], "spearman", True))[0]

    iu = np.triu_indices(n, k=1)
    tri_n = np.asarray(neural_rdm)[iu]
    for l in range(L):
        tri_m = np.asarray(compute_rdm(jnp.asarray(stacked[l])))[iu]
        expected = scipy.stats.spearmanr(tri_m, tri_n).statistic
        np.testing.assert_allclose(multi[l], expected, atol=1e-5)


def test_select_best_layer_exact_ties_kwarg(rng):
    n, d = 24, 16
    acts = {f"l{i}": rng.randn(n, d).astype(np.float32) for i in range(3)}
    acts["l0"][:6] = acts["l0"][0]
    neural = rng.randn(n, 10).astype(np.float32)

    exact = select_best_layer(acts, neural, "spearman", exact_ties=True)
    iu = np.triu_indices(n, k=1)
    tri_n = np.asarray(compute_rdm(jnp.asarray(neural)))[iu]
    for name, a in acts.items():
        tri_m = np.asarray(compute_rdm(jnp.asarray(a)))[iu]
        expected = scipy.stats.spearmanr(tri_m, tri_n).statistic
        np.testing.assert_allclose(exact[name], expected, atol=1e-5)


def test_triangle_tie_count_zero_on_distinct(rng):
    x = rng.randn(30, 12).astype(np.float32)
    assert int(triangle_tie_count(compute_rdm(jnp.asarray(x)))) == 0


def test_compute_rsa_bootstrap_exact_ties_consistency(rng):
    """On tied test RDMs the CI must be drawn from the average-tie
    statistic the point score uses (ADVICE r2 item 1)."""
    from visreps_tpu.analysis.alignment import AlignmentData
    from visreps_tpu.analysis.rsa import compute_rsa
    from visreps_tpu.core.config import Config

    n_train, n_test, v, d = 40, 20, 12, 24

    def make(n, tie):
        neural = rng.randn(n, v).astype(np.float32)
        if tie:
            neural[:5] = neural[0]
        signal = np.hstack([neural, 0.2 * rng.randn(n, d - v)]).astype(np.float32)
        if tie:
            signal[:5] = signal[0]
        return AlignmentData(
            activations={"sig": signal, "noise": rng.randn(n, d).astype(np.float32)},
            neural=neural, stimulus_ids=[str(i) for i in range(n)],
        )

    cfg = Config({"compare_method": "spearman", "analysis": "rsa"})
    res = compute_rsa(cfg, make(n_train, False), make(n_test, True),
                      bootstrap=True, n_bootstrap=50)[0]
    assert res["bootstrap_exact_ties"] is True
    # CI must bracket sensibly around the exact point score
    assert res["ci_low"] <= res["score"] + 1e-6

    # Round 5: the default Spearman path is the FUSED single-pair
    # program (ops/bootstrap.single_pair_scoring), which is always
    # average-tie exact — tie-free data too (identical values there) —
    # so the flag reports True without a tie-detection round-trip.
    sel2, ev2 = make(n_train, False), make(n_test, False)
    res2 = compute_rsa(cfg, sel2, ev2, bootstrap=True, n_bootstrap=50)[0]
    assert res2["bootstrap_exact_ties"] is True
    # An explicit bootstrap_exact_ties=False still forces the unfused
    # dense-rank kernel and reports it; on tie-free data the scores are
    # identical to the fused average-tie program.
    cfg_dense = Config({"compare_method": "spearman", "analysis": "rsa",
                        "bootstrap_exact_ties": False})
    res3 = compute_rsa(cfg_dense, sel2, ev2, bootstrap=True, n_bootstrap=50)[0]
    assert res3["bootstrap_exact_ties"] is False
    np.testing.assert_allclose(res3["bootstrap_scores"],
                               res2["bootstrap_scores"], atol=1e-5)


def test_fused_matches_unfused(pair_fixture, rng):
    """The fused one-program variant (gathers + neural RDMs traced in)
    must reproduce _select_scores_multipair exactly."""
    from visreps_tpu.analysis.rsa import _select_scores_multipair_fused

    stacked, neurals = pair_fixture
    L, n, d = stacked.shape
    # Embed the subject rows inside a larger store, as in the eval.
    N = 100
    rows = rng.choice(N, size=n, replace=False).astype(np.int32)
    acts_taps = []
    for l in range(L):
        store = rng.randn(N, d).astype(np.float32)
        store[rows] = stacked[l]
        acts_taps.append(jnp.asarray(store))

    neural_rdms = jnp.stack([compute_rdm(jnp.asarray(x)) for x in neurals])
    for method in ("pearson", "spearman"):
        ref = np.asarray(_select_scores_multipair(
            jnp.asarray(stacked), neural_rdms, method))
        fused = np.asarray(_select_scores_multipair_fused(
            tuple(acts_taps), jnp.asarray(rows),
            tuple(jnp.asarray(x) for x in neurals), method))
        np.testing.assert_allclose(fused, ref, rtol=0, atol=2e-5)


def test_multisubject_matches_per_subject(rng):
    """The multi-subject one-program variant (lax.map over subjects of
    the fused body) must reproduce per-subject fused selection exactly
    (VERDICT r3 item 3: phase-1 dispatch-count reduction)."""
    from visreps_tpu.analysis.rsa import (
        _select_scores_multipair_fused,
        _select_scores_multisubject_fused,
    )

    L, S, R, n, d, N = 3, 4, 2, 20, 8, 60
    acts_taps = tuple(jnp.asarray(rng.randn(N, d).astype(np.float32))
                      for _ in range(L))
    rows_stack = np.stack([
        rng.choice(N, size=n, replace=False).astype(np.int32)
        for _ in range(S)])
    voxels = (5, 7)
    neural = [[rng.randn(n, voxels[r]).astype(np.float32) for r in range(R)]
              for _ in range(S)]
    neural_stacks = tuple(
        jnp.asarray(np.stack([neural[s][r] for s in range(S)]))
        for r in range(R))

    for method in ("pearson", "spearman"):
        got = np.asarray(_select_scores_multisubject_fused(
            acts_taps, jnp.asarray(rows_stack), neural_stacks, method))
        assert got.shape == (S, R, L)
        for s in range(S):
            ref = np.asarray(_select_scores_multipair_fused(
                acts_taps, jnp.asarray(rows_stack[s]),
                tuple(jnp.asarray(x) for x in neural[s]), method))
            np.testing.assert_allclose(got[s], ref, rtol=0, atol=2e-5)
