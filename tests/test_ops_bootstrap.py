"""Bootstrap mechanics parity tests.

Ports the reference's bootstrap obligations
(tests/test_rsa_bootstrap.py:658-775, 1390-1438): 90% subsample size,
without-replacement draws, index parity with the serial RandomState
loop, sub-RDM indexing ≡ direct recomputation, CI bracketing,
reproducibility.
"""
import numpy as np
import pytest
import scipy.stats

from visreps_tpu.ops.bootstrap import (
    bootstrap_indices,
    bootstrap_rdm_correlation,
    percentile_ci,
)
from visreps_tpu.ops.rdm import compute_rdm


@pytest.fixture
def rdm_pair(rng):
    a = rng.randn(50, 32).astype(np.float32)
    b = (a + 0.7 * rng.randn(50, 32)).astype(np.float32)
    return np.asarray(compute_rdm(a)), np.asarray(compute_rdm(b))


class TestBootstrapIndices:
    def test_subsample_size_is_90pct(self):
        idx = bootstrap_indices(100, n_bootstrap=10)
        assert idx.shape == (10, 90)

    def test_without_replacement(self):
        idx = bootstrap_indices(50, n_bootstrap=20)
        for row in idx:
            assert len(set(row.tolist())) == len(row)

    def test_matches_reference_serial_draws(self):
        """Bit-exact parity with the reference's per-iteration
        rng.choice(n, size=int(n*0.9), replace=False) (evals.py:356-364)."""
        n, n_boot = 37, 5
        ours = bootstrap_indices(n, n_bootstrap=n_boot, seed=42)
        rng = np.random.RandomState(42)
        for i in range(n_boot):
            expected = rng.choice(n, size=int(n * 0.9), replace=False)
            np.testing.assert_array_equal(ours[i], expected)

    def test_seed_reproducibility(self):
        a = bootstrap_indices(60, 8, seed=7)
        b = bootstrap_indices(60, 8, seed=7)
        np.testing.assert_array_equal(a, b)
        c = bootstrap_indices(60, 8, seed=8)
        assert not np.array_equal(a, c)


class TestBootstrapScores:
    @pytest.mark.parametrize("method", ["spearman", "pearson", "kendall"])
    def test_matches_direct_scipy_recompute(self, rdm_pair, method):
        r1, r2 = rdm_pair
        n_boot = 6
        idx = bootstrap_indices(r1.shape[0], n_boot, seed=42)
        scores = bootstrap_rdm_correlation(
            r1, r2, n_bootstrap=n_boot, seed=42, method=method, chunk=4
        )
        for i in range(n_boot):
            ix = idx[i]
            s1 = r1[np.ix_(ix, ix)]
            s2 = r2[np.ix_(ix, ix)]
            iu = np.triu_indices(len(ix), k=1)
            v1, v2 = s1[iu], s2[iu]
            if method == "pearson":
                expected = scipy.stats.pearsonr(v1, v2).statistic
            elif method == "spearman":
                expected = scipy.stats.spearmanr(v1, v2).statistic
            else:
                n = len(v1)
                tau_b = scipy.stats.kendalltau(v1, v2).statistic
                n0 = n * (n - 1) // 2
                t_x = sum(c * (c - 1) // 2 for c in np.unique(v1, return_counts=True)[1])
                t_y = sum(c * (c - 1) // 2 for c in np.unique(v2, return_counts=True)[1])
                expected = tau_b * np.sqrt(np.float64(n0 - t_x) * (n0 - t_y)) / n0
            np.testing.assert_allclose(scores[i], expected, rtol=1e-3, atol=1e-4)

    def test_ci_brackets_point_estimate_distribution(self, rdm_pair):
        r1, r2 = rdm_pair
        scores = bootstrap_rdm_correlation(r1, r2, n_bootstrap=64, chunk=16)
        lo, hi = percentile_ci(scores)
        assert lo <= np.median(scores) <= hi
        assert lo < hi

    def test_reproducible(self, rdm_pair):
        r1, r2 = rdm_pair
        s1 = bootstrap_rdm_correlation(r1, r2, n_bootstrap=16, seed=42)
        s2 = bootstrap_rdm_correlation(r1, r2, n_bootstrap=16, seed=42)
        np.testing.assert_array_equal(s1, s2)

    def test_chunk_padding_irrelevant(self, rdm_pair):
        """n_bootstrap not divisible by chunk must give identical scores."""
        r1, r2 = rdm_pair
        s1 = bootstrap_rdm_correlation(r1, r2, n_bootstrap=10, chunk=4)
        s2 = bootstrap_rdm_correlation(r1, r2, n_bootstrap=10, chunk=10)
        np.testing.assert_allclose(s1, s2, atol=1e-6)
