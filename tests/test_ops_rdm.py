"""RDM construction/comparison parity tests.

Ports the reference's compute_rdm unit-test obligations
(tests/test_rsa_bootstrap.py:120-236, 907-1047): symmetry, zero
diagonal, value range, Pearson equality vs scipy pairwise, and
Spearman-RDM ≡ Pearson-on-ranks.
"""
import numpy as np
import pytest
import scipy.stats

from visreps_tpu.ops.rdm import compute_rdm, compute_rdm_correlation, upper_triangle
from visreps_tpu.ops.stats import rankdata_dense


@pytest.fixture
def acts(rng):
    return rng.randn(30, 64).astype(np.float32)


class TestComputeRDM:
    def test_shape_symmetry_diag(self, acts):
        rdm = np.asarray(compute_rdm(acts))
        assert rdm.shape == (30, 30)
        np.testing.assert_allclose(rdm, rdm.T, atol=1e-6)
        np.testing.assert_allclose(np.diag(rdm), 0.0, atol=1e-6)

    def test_value_range(self, acts):
        rdm = np.asarray(compute_rdm(acts))
        assert rdm.min() >= -1e-6 and rdm.max() <= 2.0 + 1e-6

    def test_pearson_matches_scipy(self, acts):
        rdm = np.asarray(compute_rdm(acts, correlation="pearson"))
        for i in range(0, 30, 7):
            for j in range(0, 30, 5):
                if i == j:
                    continue
                expected = 1.0 - scipy.stats.pearsonr(acts[i], acts[j]).statistic
                np.testing.assert_allclose(rdm[i, j], expected, atol=2e-5)

    def test_spearman_equals_pearson_on_ranks(self, acts):
        rdm_sp = np.asarray(compute_rdm(acts, correlation="spearman"))
        ranks = np.asarray(rankdata_dense(acts, axis=1))
        rdm_pr = np.asarray(compute_rdm(ranks, correlation="pearson"))
        np.testing.assert_allclose(rdm_sp, rdm_pr, atol=1e-5)

    def test_identical_rows_zero_dissimilarity(self, rng):
        x = rng.randn(1, 50).astype(np.float32)
        acts = np.repeat(x, 4, axis=0)
        rdm = np.asarray(compute_rdm(acts))
        np.testing.assert_allclose(rdm, 0.0, atol=1e-5)

    def test_anticorrelated_rows(self, rng):
        x = rng.randn(50).astype(np.float32)
        acts = np.stack([x, -x])
        rdm = np.asarray(compute_rdm(acts))
        np.testing.assert_allclose(rdm[0, 1], 2.0, atol=1e-5)

    def test_zero_variance_row_guard(self, rng):
        acts = rng.randn(5, 40).astype(np.float32)
        acts[2] = 3.14  # constant row
        rdm = np.asarray(compute_rdm(acts))
        assert np.isfinite(rdm).all()

    def test_invalid_correlation_raises(self, acts):
        with pytest.raises(ValueError):
            compute_rdm(acts, correlation="kendall")

    def test_does_not_mutate_input(self, acts):
        before = acts.copy()
        compute_rdm(acts)
        np.testing.assert_array_equal(acts, before)


class TestRDMCorrelation:
    def _pair(self, rng, n=40):
        a = rng.randn(n, 32).astype(np.float32)
        b = (a + 0.5 * rng.randn(n, 32)).astype(np.float32)
        return np.asarray(compute_rdm(a)), np.asarray(compute_rdm(b))

    def test_upper_triangle_order(self):
        rdm = np.arange(16, dtype=np.float32).reshape(4, 4)
        v = np.asarray(upper_triangle(rdm))
        iu = np.triu_indices(4, k=1)
        np.testing.assert_array_equal(v, rdm[iu])

    @pytest.mark.parametrize("method", ["pearson", "spearman", "kendall"])
    def test_matches_scipy(self, rng, method):
        r1, r2 = self._pair(rng)
        got = compute_rdm_correlation(r1, r2, correlation=method)
        iu = np.triu_indices(r1.shape[0], k=1)
        v1, v2 = r1[iu], r2[iu]
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
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_self_correlation_is_one(self, rng):
        r1, _ = self._pair(rng)
        assert compute_rdm_correlation(r1, r1, correlation="spearman") == pytest.approx(1.0, abs=1e-5)

    def test_mismatched_shapes_raise(self, rng):
        r1, _ = self._pair(rng, n=40)
        r2, _ = self._pair(rng, n=20)
        with pytest.raises(ValueError):
            compute_rdm_correlation(r1, r2)

    def test_tiny_rdm_nan(self):
        r = np.zeros((1, 1), np.float32)
        assert np.isnan(compute_rdm_correlation(r, r, correlation="spearman"))
