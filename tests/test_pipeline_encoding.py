"""Planted-signal integration tests for the encoding-score protocol.

Reference pattern: tests/test_encoding_score.py:72-104, 438-667 —
linear planted signal, layer selection, leakage checks, bootstrap
mechanics (90% subsample via unique-score counting), determinism.
"""
import numpy as np
import pytest

from visreps_tpu.analysis.alignment import AlignmentData
from visreps_tpu.analysis.encoding import compute_encoding_score


@pytest.fixture
def planted(rng):
    """Neural responses are a noisy linear readout of 'signal_layer'."""
    n_train, n_test, d, v = 120, 40, 30, 12
    w = rng.randn(d, v).astype(np.float32)

    def make(n):
        signal = rng.randn(n, d).astype(np.float32)
        neural = signal @ w + 0.2 * rng.randn(n, v).astype(np.float32)
        noise = rng.randn(n, d).astype(np.float32)
        return AlignmentData(
            activations={"noise_layer": noise, "signal_layer": signal},
            neural=neural,
            stimulus_ids=[str(i) for i in range(n)],
        )

    return make(n_train), make(n_test)


class TestEncodingScore:
    def test_selects_planted_layer_high_score(self, planted):
        train, test = planted
        res = compute_encoding_score(train, test, bootstrap=False)[0]
        assert res["layer"] == "signal_layer"
        assert res["score"] > 0.8
        assert res["compare_method"] == "pearson"
        assert res["analysis"] == "encoding_score"

    def test_noise_layer_scores_low(self, planted):
        train, test = planted
        res = compute_encoding_score(train, test, bootstrap=False)[0]
        by_layer = {s["layer"]: s["score"] for s in res["layer_selection_scores"]}
        assert by_layer["signal_layer"] > 0.8
        assert abs(by_layer["noise_layer"]) < 0.3

    def test_bootstrap_ci(self, planted):
        train, test = planted
        res = compute_encoding_score(train, test, bootstrap=True, n_bootstrap=32)[0]
        assert res["ci_low"] < res["score"] + 0.1
        assert res["ci_low"] < res["ci_high"]
        assert len(res["bootstrap_scores"]) == 32

    def test_bootstrap_subsample_unique_counts(self, rng):
        """With n_test=10, 90% subsample w/o replacement has C(10,9)=10
        possible index sets → at most 10 unique scores
        (reference: test_encoding_score.py:723-746)."""
        n_train, n_test, d, v = 60, 10, 8, 4
        w = rng.randn(d, v).astype(np.float32)

        def make(n):
            s = rng.randn(n, d).astype(np.float32)
            return AlignmentData(
                activations={"l": s}, neural=s @ w + 0.1 * rng.randn(n, v).astype(np.float32),
                stimulus_ids=[str(i) for i in range(n)],
            )

        res = compute_encoding_score(make(n_train), make(n_test), bootstrap=True, n_bootstrap=64)[0]
        # f32 gather-order noise (~1e-7) makes identical index SETS
        # differ in the last bits; round past it before counting.
        uniq = len({round(s, 6) for s in res["bootstrap_scores"]})
        assert uniq <= 10

    def test_seed_deterministic(self, planted):
        train, test = planted
        r1 = compute_encoding_score(train, test, bootstrap=True, n_bootstrap=8, seed=42)[0]
        r2 = compute_encoding_score(train, test, bootstrap=True, n_bootstrap=8, seed=42)[0]
        assert r1["score"] == r2["score"]
        assert r1["bootstrap_scores"] == r2["bootstrap_scores"]

    def test_does_not_mutate_inputs(self, planted):
        train, test = planted
        before = {l: a.copy() for l, a in train.activations.items()}
        neural_before = train.neural.copy()
        compute_encoding_score(train, test, bootstrap=False)
        for l, a in train.activations.items():
            np.testing.assert_array_equal(a, before[l])
        np.testing.assert_array_equal(train.neural, neural_before)

    def test_pca_reconstruction_path(self, planted):
        train, test = planted
        res = compute_encoding_score(train, test, bootstrap=False, reconstruct_pca_k=5)[0]
        full = compute_encoding_score(train, test, bootstrap=False)[0]
        # PCA-5 reconstruction loses information → score should not exceed full
        assert res["score"] <= full["score"] + 0.02

    def test_4d_activations_flattened(self, rng):
        n, v = 50, 6
        acts4d = rng.randn(n, 2, 3, 4).astype(np.float32)
        flat = acts4d.reshape(n, -1)
        w = rng.randn(24, v).astype(np.float32)
        neural = flat @ w

        def make(a, y):
            return AlignmentData(activations={"l": a}, neural=y,
                                 stimulus_ids=[str(i) for i in range(len(y))])

        res = compute_encoding_score(
            make(acts4d[:40], neural[:40]), make(acts4d[40:], neural[40:]), bootstrap=False
        )[0]
        assert res["score"] > 0.95


class TestSubjectBatchedEncoding:
    """compute_encoding_scores_subject (one subject, all regions in one
    batched pass) must reproduce compute_encoding_score run per
    (region, subject) — VERDICT item 4's correctness contract."""

    def _subject_data(self, rng, n_train=120, n_test=40, d=30):
        w1 = rng.randn(d, 8).astype(np.float32)
        w2 = rng.randn(d, 5).astype(np.float32)
        sig_tr = rng.randn(n_train, d).astype(np.float32)
        sig_te = rng.randn(n_test, d).astype(np.float32)
        noise_tr = rng.randn(n_train, d).astype(np.float32)
        noise_te = rng.randn(n_test, d).astype(np.float32)
        acts_tr = {"noise_layer": noise_tr, "signal_layer": sig_tr}
        acts_te = {"noise_layer": noise_te, "signal_layer": sig_te}
        y_tr = {"regA": sig_tr @ w1 + 0.2 * rng.randn(n_train, 8).astype(np.float32),
                "regB": sig_tr @ w2 + 0.2 * rng.randn(n_train, 5).astype(np.float32)}
        y_te = {"regA": sig_te @ w1 + 0.2 * rng.randn(n_test, 8).astype(np.float32),
                "regB": sig_te @ w2 + 0.2 * rng.randn(n_test, 5).astype(np.float32)}
        return acts_tr, acts_te, y_tr, y_te

    def test_matches_per_pair_path(self, rng):
        from visreps_tpu.analysis.encoding import compute_encoding_scores_subject

        acts_tr, acts_te, y_tr, y_te = self._subject_data(rng)
        batched = compute_encoding_scores_subject(
            acts_tr, acts_te, y_tr, y_te, bootstrap=True, n_bootstrap=8
        )
        for region in ("regA", "regB"):
            train = AlignmentData(acts_tr, y_tr[region])
            test = AlignmentData(acts_te, y_te[region])
            ref = compute_encoding_score(train, test, bootstrap=True, n_bootstrap=8)[0]
            got = batched[region][0]
            assert got["layer"] == ref["layer"] == "signal_layer"
            np.testing.assert_allclose(got["score"], ref["score"], atol=2e-4)
            np.testing.assert_allclose(got["ci_low"], ref["ci_low"], atol=2e-4)
            np.testing.assert_allclose(got["ci_high"], ref["ci_high"], atol=2e-4)
            np.testing.assert_allclose(
                got["bootstrap_scores"], ref["bootstrap_scores"], atol=2e-4
            )
            gsel = {d_["layer"]: d_["score"] for d_ in got["layer_selection_scores"]}
            rsel = {d_["layer"]: d_["score"] for d_ in ref["layer_selection_scores"]}
            for l in gsel:
                np.testing.assert_allclose(gsel[l], rsel[l], atol=2e-3)

    def test_mixed_layer_widths(self, rng):
        """Layers of different widths batch per width group."""
        from visreps_tpu.analysis.encoding import compute_encoding_scores_subject

        acts_tr, acts_te, y_tr, y_te = self._subject_data(rng)
        acts_tr["wide_layer"] = rng.randn(120, 50).astype(np.float32)
        acts_te["wide_layer"] = rng.randn(40, 50).astype(np.float32)
        res = compute_encoding_scores_subject(
            acts_tr, acts_te, y_tr, y_te, bootstrap=False
        )
        for region in ("regA", "regB"):
            assert res[region][0]["layer"] == "signal_layer"
            assert len(res[region][0]["layer_selection_scores"]) == 3

    def test_pca_reconstruction(self, rng):
        from visreps_tpu.analysis.encoding import compute_encoding_scores_subject

        acts_tr, acts_te, y_tr, y_te = self._subject_data(rng)
        batched = compute_encoding_scores_subject(
            acts_tr, acts_te, y_tr, y_te, bootstrap=False, reconstruct_pca_k=5
        )
        train = AlignmentData(acts_tr, y_tr["regA"])
        test = AlignmentData(acts_te, y_te["regA"])
        ref = compute_encoding_score(
            train, test, bootstrap=False, reconstruct_pca_k=5
        )[0]
        np.testing.assert_allclose(batched["regA"][0]["score"], ref["score"], atol=2e-4)
