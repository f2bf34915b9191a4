"""Ridge CV parity tests vs sklearn (himalaya replacement spec).

Ports the reference's encoding-score math obligations
(tests/test_encoding_score.py:225-432): znorm family, perfect-linear
recovery vs random data, leakage-free stats, per-target alpha behavior.
"""
import numpy as np
import pytest
from sklearn.linear_model import Ridge

from visreps_tpu.ops.ridge import correlation_score, default_alphas, ridge_cv
from visreps_tpu.ops.znorm import znorm, znorm_fit


class TestZnorm:
    def test_fit_stats(self, rng):
        x = rng.randn(100, 5).astype(np.float32) * 3 + 2
        xn, mean, std = znorm_fit(x)
        np.testing.assert_allclose(np.asarray(xn).mean(0), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(xn).std(0, ddof=1), 1.0, atol=1e-3)

    def test_apply_external_stats(self, rng):
        x = rng.randn(50, 4).astype(np.float32)
        _, mean, std = znorm_fit(x)
        y = rng.randn(20, 4).astype(np.float32)
        yn = np.asarray(znorm(y, mean, std))
        np.testing.assert_allclose(yn, (y - np.asarray(mean)) / np.asarray(std), atol=1e-6)


class TestRidgeCV:
    def test_single_alpha_matches_sklearn(self, rng):
        """With one alpha the CV is moot; weights must equal sklearn Ridge."""
        n, d, v = 200, 16, 3
        x = rng.randn(n, d).astype(np.float32)
        w_true = rng.randn(d, v).astype(np.float32)
        y = x @ w_true + 0.1 * rng.randn(n, v).astype(np.float32)
        alpha = 10.0
        res = ridge_cv(x, y, alphas=np.array([alpha]))
        sk = Ridge(alpha=alpha, fit_intercept=False).fit(x, y)
        np.testing.assert_allclose(np.asarray(res.weights), sk.coef_.T, rtol=1e-3, atol=1e-4)

    def test_perfect_linear_high_score(self, rng):
        n, d, v = 300, 20, 4
        x = rng.randn(n, d).astype(np.float32)
        y = x @ rng.randn(d, v).astype(np.float32)
        res = ridge_cv(x, y)
        pred = np.asarray(res.predict(x))
        r = np.asarray(correlation_score(y, pred))
        assert (r > 0.999).all()

    def test_random_data_low_score(self, rng):
        n, d, v = 200, 20, 4
        x = rng.randn(n, d).astype(np.float32)
        y_tr = rng.randn(n, v).astype(np.float32)
        x_te = rng.randn(100, d).astype(np.float32)
        y_te = rng.randn(100, v).astype(np.float32)
        res = ridge_cv(x, y_tr)
        r = np.asarray(correlation_score(y_te, res.predict(x_te)))
        assert np.abs(r).max() < 0.35

    def test_per_target_alphas(self, rng):
        """A noisy target should get heavier regularization than a clean one."""
        n, d = 400, 30
        x = rng.randn(n, d).astype(np.float32)
        w = rng.randn(d).astype(np.float32)
        y = np.stack([x @ w, rng.randn(n).astype(np.float32) * 5], axis=1)
        res = ridge_cv(x, y, alphas=default_alphas())
        assert float(res.best_alphas[1]) >= float(res.best_alphas[0])

    def test_alpha_selection_tracks_sklearn_cv(self, rng):
        """Best alpha per target should agree with an sklearn-based manual
        5-fold contiguous CV using the same R² criterion."""
        n, d, v = 150, 10, 2
        x = rng.randn(n, d).astype(np.float32)
        y = (x @ rng.randn(d, v) + rng.randn(n, v)).astype(np.float32)
        alphas = np.logspace(-2, 4, 7)
        res = ridge_cv(x, y, alphas=alphas)

        # manual CV
        folds = []
        sizes = [n // 5 + (1 if i < n % 5 else 0) for i in range(5)]
        start = 0
        for s in sizes:
            folds.append((start, start + s))
            start += s
        scores = np.zeros((len(alphas), v))
        for ai, a in enumerate(alphas):
            for lo, hi in folds:
                tr = np.r_[0:lo, hi:n]
                sk = Ridge(alpha=a, fit_intercept=False).fit(x[tr], y[tr])
                pred = sk.predict(x[lo:hi])
                yv = y[lo:hi]
                ss = ((yv - yv.mean(0)) ** 2).sum(0)
                scores[ai] += 1 - ((yv - pred) ** 2).sum(0) / ss
        manual_best = alphas[scores.argmax(axis=0)]
        np.testing.assert_allclose(np.asarray(res.best_alphas), manual_best, rtol=1e-5)

    def test_correlation_score_matches_numpy(self, rng):
        y = rng.randn(80, 6).astype(np.float32)
        p = (y + rng.randn(80, 6)).astype(np.float32)
        got = np.asarray(correlation_score(y, p))
        for j in range(6):
            expected = np.corrcoef(y[:, j], p[:, j])[0, 1]
            np.testing.assert_allclose(got[j], expected, atol=1e-5)
