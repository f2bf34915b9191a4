"""Math-parity tests for rank statistics vs scipy (the executable spec).

Ports the reference's correctness classes (tests/test_rsa_bootstrap.py:
Kendall manual values, tau-b conversion, tie behavior; Spearman ≡
Pearson-on-ranks) against the device-native implementations.
"""
import numpy as np
import pytest
import scipy.stats

from visreps_tpu.ops.stats import (
    kendall_tau_a,
    pearson_corr,
    rankdata_average,
    rankdata_dense,
    spearman_corr,
)


class TestRankdata:
    def test_average_matches_scipy_no_ties(self, rng):
        x = rng.randn(500)
        np.testing.assert_allclose(
            np.asarray(rankdata_average(x)), scipy.stats.rankdata(x), rtol=0, atol=0
        )

    def test_average_matches_scipy_with_ties(self, rng):
        x = rng.randint(0, 20, size=300).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(rankdata_average(x)), scipy.stats.rankdata(x), rtol=0, atol=0
        )

    def test_dense_is_permutation(self, rng):
        x = rng.randn(4, 50)
        r = np.asarray(rankdata_dense(x, axis=1))
        for row in r:
            assert sorted(row) == list(range(50))


class TestPearsonSpearman:
    def test_pearson_matches_scipy(self, rng):
        x, y = rng.randn(1000), rng.randn(1000)
        expected = scipy.stats.pearsonr(x, y).statistic
        np.testing.assert_allclose(float(pearson_corr(x, y)), expected, rtol=1e-5)

    def test_spearman_matches_scipy(self, rng):
        x, y = rng.randn(1000), rng.randn(1000)
        expected = scipy.stats.spearmanr(x, y).statistic
        np.testing.assert_allclose(float(spearman_corr(x, y)), expected, rtol=1e-5)

    def test_spearman_with_ties_matches_scipy(self, rng):
        x = rng.randint(0, 10, 500).astype(float)
        y = rng.randint(0, 10, 500).astype(float)
        expected = scipy.stats.spearmanr(x, y).statistic
        np.testing.assert_allclose(float(spearman_corr(x, y)), expected, rtol=1e-4)

    def test_perfect_correlation(self):
        x = np.arange(100, dtype=float)
        np.testing.assert_allclose(float(pearson_corr(x, 2 * x + 3)), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(spearman_corr(x, x**3)), 1.0, atol=1e-6)


def _scipy_tau_a(x, y):
    """The reference's tau-b → tau-a conversion (visreps/analysis/rsa.py:22-40)."""
    n = len(x)
    tau_b = scipy.stats.kendalltau(x, y).statistic
    if np.isnan(tau_b):
        return float("nan")
    n0 = n * (n - 1) // 2
    t_x = sum(c * (c - 1) // 2 for c in np.unique(x, return_counts=True)[1])
    t_y = sum(c * (c - 1) // 2 for c in np.unique(y, return_counts=True)[1])
    denom = np.sqrt(np.float64(n0 - t_x) * np.float64(n0 - t_y))
    return float("nan") if denom == 0 else float(tau_b * denom / n0)


class TestKendallTauA:
    def test_manual_small_case(self):
        # x=[1,2,3,4], y=[1,3,2,4]: 5 concordant, 1 discordant, n0=6
        x = np.array([1.0, 2.0, 3.0, 4.0])
        y = np.array([1.0, 3.0, 2.0, 4.0])
        np.testing.assert_allclose(float(kendall_tau_a(x, y)), 4.0 / 6.0, atol=1e-6)

    def test_perfect_agreement(self):
        x = np.arange(50, dtype=float)
        np.testing.assert_allclose(float(kendall_tau_a(x, x)), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(kendall_tau_a(x, -x)), -1.0, atol=1e-6)

    @pytest.mark.parametrize("n", [10, 100, 1000])
    def test_matches_scipy_no_ties(self, rng, n):
        x, y = rng.randn(n), rng.randn(n)
        np.testing.assert_allclose(
            float(kendall_tau_a(x, y)), _scipy_tau_a(x, y), rtol=1e-4, atol=1e-5
        )

    def test_matches_scipy_with_ties(self, rng):
        x = rng.randint(0, 8, 400).astype(float)
        y = rng.randint(0, 8, 400).astype(float)
        np.testing.assert_allclose(
            float(kendall_tau_a(x, y)), _scipy_tau_a(x, y), rtol=1e-4, atol=1e-5
        )

    def test_large_n_no_overflow(self, rng):
        # The reference guards int overflow at large n (rsa.py:37-38);
        # the device version accumulates per-slot and must stay accurate.
        n = 20000
        x, y = rng.randn(n), rng.randn(n)
        np.testing.assert_allclose(
            float(kendall_tau_a(x, y)), _scipy_tau_a(x, y), rtol=1e-3, atol=1e-4
        )

    def test_ties_not_counted(self):
        # With heavy ties tau-a denominator stays n0 (tie pairs neutral).
        x = np.array([1.0, 1.0, 2.0, 2.0])
        y = np.array([1.0, 2.0, 3.0, 4.0])
        # pairs: (0,1) tie-x, (2,3) tie-x, others concordant → C=4, D=0, n0=6
        np.testing.assert_allclose(float(kendall_tau_a(x, y)), 4.0 / 6.0, atol=1e-6)


class TestTieSemantics:
    """VERDICT weak #4: quantify dense-rank vs average-tie Spearman on
    realistic RDMs with clamp-induced exact ties, and pin the default
    used for point scores to scipy semantics."""

    def _tied_rdm_pair(self, rng, n=60, dup=6):
        from visreps_tpu.ops.rdm import compute_rdm

        # duplicate rows -> corr ~1; snap the residual float noise so
        # the cells are EXACT ties at 0, as jnp.clip produces when the
        # correlation saturates
        x = rng.randn(n, 24).astype(np.float32)
        x[:dup] = x[0]
        y = x + 0.3 * rng.randn(n, 24).astype(np.float32)
        y[:dup] = y[0]
        r1 = np.asarray(compute_rdm(x))
        r2 = np.asarray(compute_rdm(y))
        return (np.where(r1 < 1e-5, 0.0, r1), np.where(r2 < 1e-5, 0.0, r2))

    def test_default_spearman_matches_scipy_with_ties(self, rng):
        import scipy.stats

        from visreps_tpu.ops.rdm import compute_rdm_correlation, upper_triangle

        r1, r2 = self._tied_rdm_pair(rng)
        v1, v2 = np.asarray(upper_triangle(r1)), np.asarray(upper_triangle(r2))
        assert (v1 == 0.0).sum() > 10  # ties present
        ours = compute_rdm_correlation(r1, r2, "spearman")
        ref = scipy.stats.spearmanr(v1, v2).statistic
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_dense_deviation_bounded_on_clamp_ties(self, rng):
        """The bootstrap fast path's dense-rank approximation deviates
        from scipy only via tied cells; on realistic clamp-tie density
        (~1% of pairs) the deviation stays in the 4th decimal."""
        import scipy.stats

        from visreps_tpu.ops.rdm import upper_triangle
        from visreps_tpu.ops.stats import spearman_corr_dense

        devs = []
        for trial in range(5):
            r1, r2 = self._tied_rdm_pair(rng, n=80, dup=8)
            v1, v2 = np.asarray(upper_triangle(r1)), np.asarray(upper_triangle(r2))
            dense = float(spearman_corr_dense(v1, v2))
            ref = scipy.stats.spearmanr(v1, v2).statistic
            devs.append(abs(dense - ref))
        # ~1% tied cells (28 of 3160 pairs tied at 0)
        assert max(devs) < 5e-3, devs

    def test_dense_equals_exact_without_ties(self, rng):
        from visreps_tpu.ops.stats import spearman_corr, spearman_corr_dense

        v1 = rng.randn(500).astype(np.float64)
        v2 = rng.randn(500).astype(np.float64)
        np.testing.assert_allclose(float(spearman_corr_dense(v1, v2)),
                                   float(spearman_corr(v1, v2)), atol=1e-6)
