"""SRP / SRHT JL-property tests and PCA reconstruction parity."""
import numpy as np
import pytest
from sklearn.decomposition import PCA as SkPCA

from visreps_tpu.ops.pca import fit_pca, reconstruct_from_pcs
from visreps_tpu.ops.srp import SRPTransform, srht_project


class TestSRP:
    def test_shapes_and_cap(self, rng):
        srp = SRPTransform(k=64, seed=0)
        x = rng.randn(8, 500).astype(np.float32)
        out = np.asarray(srp(x))
        assert out.shape == (8, 64)
        # k capped at D (reference: k = min(4096, D), models/utils.py:305)
        srp_small = SRPTransform(k=64, seed=0)
        out_small = np.asarray(srp_small(rng.randn(8, 32).astype(np.float32)))
        assert out_small.shape == (8, 32)

    def test_deterministic_from_seed(self, rng):
        x = rng.randn(4, 300).astype(np.float32)
        a = np.asarray(SRPTransform(k=32, seed=5)(x))
        b = np.asarray(SRPTransform(k=32, seed=5)(x))
        np.testing.assert_array_equal(a, b)
        c = np.asarray(SRPTransform(k=32, seed=6)(x))
        assert not np.array_equal(a, c)

    def test_linear(self, rng):
        srp = SRPTransform(k=32, seed=1)
        x = rng.randn(2, 200).astype(np.float32)
        y = np.asarray(srp(x[0:1] + x[1:2]))
        y2 = np.asarray(srp(x[0:1])) + np.asarray(srp(x[1:2]))
        # bf16 inputs: linearity holds up to bf16 rounding of the operands
        np.testing.assert_allclose(y, y2, rtol=5e-2, atol=5e-2)

    def test_jl_distance_preservation(self, rng):
        """Pairwise distances preserved within JL distortion at k=1024."""
        d, k, n = 2000, 1024, 12
        srp = SRPTransform(k=k, seed=3)
        x = rng.randn(n, d).astype(np.float32)
        y = np.asarray(srp(x))
        for i in range(0, n, 3):
            for j in range(i + 1, n, 3):
                d_orig = np.linalg.norm(x[i] - x[j])
                d_proj = np.linalg.norm(y[i] - y[j])
                assert abs(d_proj / d_orig - 1) < 0.25

    def test_correlation_structure_preserved(self, rng):
        """RDMs from projected activations track RDMs of the originals —
        the property the reference's SRP relies on for layer selection."""
        from visreps_tpu.ops.rdm import compute_rdm, compute_rdm_correlation

        # Structured (low-rank + noise) activations: the realistic case
        # where the RDM carries signal above the JL distortion floor.
        z = rng.randn(40, 10).astype(np.float32)
        x = (z @ rng.randn(10, 3000) + 0.5 * rng.randn(40, 3000)).astype(np.float32)
        srp = SRPTransform(k=1024, seed=2)
        rdm_orig = compute_rdm(x)
        rdm_proj = compute_rdm(np.asarray(srp(x)))
        score = compute_rdm_correlation(rdm_orig, rdm_proj, correlation="spearman")
        assert score > 0.95


class TestSRHT:
    def test_shape_and_determinism(self, rng):
        x = rng.randn(6, 700).astype(np.float32)
        a = np.asarray(srht_project(x, 128, seed=0))
        assert a.shape == (6, 128)
        b = np.asarray(srht_project(x, 128, seed=0))
        np.testing.assert_array_equal(a, b)

    def test_jl_distance_preservation(self, rng):
        d, k, n = 1500, 512, 10
        x = rng.randn(n, d).astype(np.float32)
        y = np.asarray(srht_project(x, k, seed=1))
        for i in range(0, n, 2):
            for j in range(i + 1, n, 2):
                ratio = np.linalg.norm(y[i] - y[j]) / np.linalg.norm(x[i] - x[j])
                assert abs(ratio - 1) < 0.3


class TestPCA:
    def test_reconstruction_matches_sklearn(self, rng):
        x = rng.randn(60, 30).astype(np.float32) @ rng.randn(30, 30).astype(np.float32)
        k = 5
        ours = np.asarray(reconstruct_from_pcs({"l": x}, k)["l"])
        sk = SkPCA(n_components=k)
        expected = sk.inverse_transform(sk.fit_transform(x))
        np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-3)

    def test_full_rank_reconstruction_exact(self, rng):
        x = rng.randn(20, 8).astype(np.float32)
        rec = np.asarray(reconstruct_from_pcs({"l": x}, 8)["l"])
        np.testing.assert_allclose(rec, x, atol=1e-4)

    def test_explained_variance_matches_sklearn(self, rng):
        x = rng.randn(100, 12).astype(np.float32)
        pca = fit_pca(x, 4)
        sk = SkPCA(n_components=4).fit(x)
        np.testing.assert_allclose(
            np.asarray(pca.explained_variance), sk.explained_variance_, rtol=1e-3
        )

    def test_k_capped_at_dim(self, rng):
        x = rng.randn(10, 4).astype(np.float32)
        rec = np.asarray(reconstruct_from_pcs({"l": x}, 99)["l"])
        np.testing.assert_allclose(rec, x, atol=1e-4)

    def test_preserves_dtype_and_ndim_flatten(self, rng):
        x = rng.randn(10, 2, 3, 4).astype(np.float32)
        out = reconstruct_from_pcs({"l": x}, 2)["l"]
        assert out.shape == (10, 24)
