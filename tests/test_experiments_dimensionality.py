"""Dimensionality-experiment parity vs the ACTUAL reference metrics.

Loads /root/reference/experiments/representation_analysis/
dimensionality/metrics.py (pure numpy + sklearn NearestNeighbors) by
file path and checks every metric in dim_metrics against it on shared
fixtures — both covariance branches of the eigenspectrum Gram trick —
plus a smoke test of the four comparison figures (VERDICT r3 item 6).
"""
from __future__ import annotations

import importlib.util

import numpy as np
import pytest

from experiments.representation_analysis import dim_metrics

REF_METRICS = ("/root/reference/experiments/representation_analysis/"
               "dimensionality/metrics.py")


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_dim_metrics", REF_METRICS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module", params=["n_gt_d", "d_gt_n"])
def x(request):
    rng = np.random.RandomState(7)
    n, d = (300, 40) if request.param == "n_gt_d" else (50, 128)
    # low-rank + noise so the spectrum has structure
    z = rng.randn(n, 8) @ rng.randn(8, d)
    return (z + 0.1 * rng.randn(n, d)).astype(np.float32)


class TestMetricParity:
    def test_eigenspectrum(self, ref, x):
        ours = dim_metrics.eigenspectrum(x)
        theirs = ref.eigenspectrum(x.astype(np.float64))
        assert ours.shape == theirs.shape
        scale = theirs[0]
        np.testing.assert_allclose(ours / scale, theirs / scale, atol=2e-4)

    def test_participation_ratio(self, ref, x):
        np.testing.assert_allclose(
            dim_metrics.participation_ratio(x),
            ref.participation_ratio(x.astype(np.float64)), rtol=1e-3)

    def test_cumulative_variance(self, ref, x):
        np.testing.assert_allclose(
            dim_metrics.cumulative_variance(x),
            ref.cumulative_variance(x.astype(np.float64)), atol=1e-4)

    @pytest.mark.parametrize("threshold", [0.5, 0.9, 0.99])
    def test_n_components_for_variance(self, ref, x, threshold):
        assert dim_metrics.n_components_for_variance(x, threshold) == \
            ref.n_components_for_variance(x.astype(np.float64), threshold)

    def test_hoyer_sparsity(self, ref, x):
        np.testing.assert_allclose(
            dim_metrics.hoyer_sparsity(x),
            ref.hoyer_sparsity(x.astype(np.float64)), atol=1e-4)

    def test_hoyer_zero_rows(self, ref):
        x = np.zeros((4, 16), np.float32)
        x[0] = 1.0  # dense row
        np.testing.assert_allclose(
            dim_metrics.hoyer_sparsity(x), ref.hoyer_sparsity(x), atol=1e-5)

    def test_fraction_active(self, ref, x):
        x_relu = np.maximum(x, 0)
        np.testing.assert_allclose(
            dim_metrics.fraction_active(x_relu),
            ref.fraction_active(x_relu), atol=1e-6)

    def test_two_nn_dimension(self, ref, x):
        ours_d, ours_se = dim_metrics.two_nn_dimension(x, seed=42)
        ref_d, ref_se = ref.two_nn_dimension(x.astype(np.float64), seed=42)
        # f32 device distances vs f64 sklearn KNN: the MLE agrees tightly
        np.testing.assert_allclose(ours_d, ref_d, rtol=2e-2)
        assert np.isfinite(ours_se) and ours_se > 0

    def test_two_nn_subsample_stream(self, ref):
        # subsampled path draws the same RandomState stream as the ref
        rng = np.random.RandomState(3)
        x = rng.randn(400, 12).astype(np.float32)
        ours_d, _ = dim_metrics.two_nn_dimension(x, n_samples=128, seed=42)
        ref_d, _ = ref.two_nn_dimension(x.astype(np.float64), n_samples=128, seed=42)
        np.testing.assert_allclose(ours_d, ref_d, rtol=2e-2)

    def test_two_nn_degenerate(self, ref):
        x = np.ones((30, 5), np.float32)  # all identical -> r1 == 0
        d, se = dim_metrics.two_nn_dimension(x)
        assert np.isnan(d) and np.isnan(se)


class TestExperimentOutputs:
    def test_compute_all_and_figures(self, tmp_path):
        from experiments.representation_analysis.dimensionality import (
            render_comparison,
            write_csv,
        )

        rng = np.random.RandomState(0)
        layers = ["conv2", "conv5", "fc2"]
        feats_a = {l: rng.randn(120, 32).astype(np.float32) for l in layers}
        feats_b = {l: rng.randn(120, 32).astype(np.float32) for l in layers}
        res_a = dim_metrics.compute_all_metrics(feats_a, layers)
        res_b = dim_metrics.compute_all_metrics(feats_b, layers)
        for key in ("pr", "n90", "twonn", "sparsity", "eigenvalues"):
            assert set(res_a[key]) == set(layers)

        csv_path = tmp_path / "dim.csv"
        write_csv(res_a, layers, csv_path)
        header = csv_path.read_text().splitlines()[0]
        for col in ("participation_ratio", "n_components_90", "twonn_id",
                    "hoyer_sparsity_mean", "fraction_active"):
            assert col in header

        paths = render_comparison({"A": res_a, "B": res_b}, layers,
                                  ["A", "B"], tmp_path / "figs")
        assert len(paths) == 4
        for p in paths:
            assert (tmp_path / "figs" / p.split("/")[-1]).exists()
