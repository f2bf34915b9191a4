"""Planted-signal integration tests for the RSA protocol.

The reference's dominant test pattern (tests/test_rsa_bootstrap.py:
80-113, 427-655): fixtures where one layer is neural+noise and another
pure noise; the pipeline must select the signal layer, score it highly,
not leak train→test, not mutate inputs, and be seed-deterministic.
"""
import numpy as np
import pytest

from visreps_tpu.analysis.alignment import AlignmentData
from visreps_tpu.analysis.rsa import compute_rsa, concept_average_exact
from visreps_tpu.core.config import Config


@pytest.fixture
def planted(rng):
    """Train/test AlignmentData where 'signal' tracks neural geometry."""
    n_train, n_test, v, d = 60, 30, 24, 40

    def make(n):
        neural = rng.randn(n, v).astype(np.float32)
        signal = np.hstack([neural, 0.3 * rng.randn(n, d - v)]).astype(np.float32)
        noise = rng.randn(n, d).astype(np.float32)
        return AlignmentData(
            activations={"noise_layer": noise, "signal_layer": signal},
            neural=neural,
            stimulus_ids=[str(i) for i in range(n)],
        )

    return make(n_train), make(n_test)


CFG = Config({"compare_method": "spearman", "analysis": "rsa"})


class TestComputeRSA:
    def test_selects_planted_layer(self, planted):
        train, test = planted
        res = compute_rsa(CFG, train, test, bootstrap=False)[0]
        assert res["layer"] == "signal_layer"
        assert res["score"] > 0.4
        assert res["analysis"] == "rsa"
        assert {s["layer"] for s in res["layer_selection_scores"]} == {"noise_layer", "signal_layer"}

    def test_noise_layer_scores_low(self, planted):
        train, test = planted
        res = compute_rsa(CFG, train, test, bootstrap=False)[0]
        by_layer = {s["layer"]: s["score"] for s in res["layer_selection_scores"]}
        assert by_layer["signal_layer"] > by_layer["noise_layer"] + 0.2
        assert abs(by_layer["noise_layer"]) < 0.25

    def test_bootstrap_ci_brackets_score(self, planted):
        train, test = planted
        res = compute_rsa(CFG, train, test, bootstrap=True, n_bootstrap=32)[0]
        assert res["ci_low"] is not None and res["ci_high"] is not None
        assert res["ci_low"] < res["ci_high"]
        assert len(res["bootstrap_scores"]) == 32

    def test_seed_deterministic(self, planted):
        train, test = planted
        r1 = compute_rsa(CFG, train, test, bootstrap=True, n_bootstrap=8, seed=42)[0]
        r2 = compute_rsa(CFG, train, test, bootstrap=True, n_bootstrap=8, seed=42)[0]
        assert r1["score"] == r2["score"]
        assert r1["bootstrap_scores"] == r2["bootstrap_scores"]

    def test_does_not_mutate_inputs(self, planted):
        train, test = planted
        before = {l: a.copy() for l, a in train.activations.items()}
        compute_rsa(CFG, train, test, bootstrap=False)
        for l, a in train.activations.items():
            np.testing.assert_array_equal(a, before[l])

    def test_n_select_subsample(self, planted):
        train, test = planted
        res = compute_rsa(CFG, train, test, n_select=20, bootstrap=False)[0]
        assert res["layer"] == "signal_layer"

    def test_re_extract_fn_used_for_eval(self, planted):
        train, test = planted
        calls = []

        def re_extract(layer, sids=None):
            calls.append(layer)
            return test.activations[layer] * 2.0, sids  # scale-invariant RDM

        res_exact = compute_rsa(CFG, train, test, bootstrap=False, re_extract_fn=re_extract)[0]
        res_plain = compute_rsa(CFG, train, test, bootstrap=False)[0]
        assert calls == [res_exact["layer"]]
        # Pearson RDM is scale-invariant → identical score
        np.testing.assert_allclose(res_exact["score"], res_plain["score"], atol=1e-5)

    def test_kendall_method(self, planted):
        train, test = planted
        cfg = Config({"compare_method": "kendall", "analysis": "rsa"})
        res = compute_rsa(cfg, train, test, bootstrap=False)[0]
        assert res["layer"] == "signal_layer"
        assert res["compare_method"] == "kendall"


class TestConceptAverage:
    def test_exact_average(self, rng):
        raw = rng.randn(6, 5).astype(np.float32)
        ids = ["a1", "a2", "b1", "b2", "b3", "c1"]
        data = AlignmentData(
            activations={}, neural=np.zeros((2, 1)),
            stimulus_ids=["conceptA", "conceptB"],
            concept_image_ids={"conceptA": ["a1", "a2"], "conceptB": ["b1", "b2", "b3"]},
        )
        out = concept_average_exact(raw, ids, data)
        np.testing.assert_allclose(out[0], raw[:2].mean(0), atol=1e-6)
        np.testing.assert_allclose(out[1], raw[2:5].mean(0), atol=1e-6)

    def test_missing_concept_zero_fallback(self, rng):
        raw = rng.randn(2, 3).astype(np.float32)
        data = AlignmentData(
            activations={}, neural=np.zeros((1, 1)),
            stimulus_ids=["ghost"], concept_image_ids={"ghost": ["missing_id"]},
        )
        out = concept_average_exact(raw, ["x", "y"], data)
        np.testing.assert_array_equal(out[0], np.zeros(3, np.float32))
