"""Pallas fused RDM kernel parity tests (interpreter mode on CPU)."""
import numpy as np
import pytest

from visreps_tpu.ops.rdm import compute_rdm
from visreps_tpu.ops.rdm_pallas import compute_rdm_pallas


class TestPallasRDM:
    @pytest.mark.parametrize("n,d", [(64, 128), (300, 700), (130, 513)])
    def test_f32_matches_reference_kernel(self, rng, n, d):
        x = rng.randn(n, d).astype(np.float32)
        ref = np.asarray(compute_rdm(x))
        got = np.asarray(
            compute_rdm_pallas(x, interpret=True, bf16=False, block_n=64, block_k=128)
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_bf16_close(self, rng):
        x = rng.randn(200, 400).astype(np.float32)
        ref = np.asarray(compute_rdm(x))
        got = np.asarray(
            compute_rdm_pallas(x, interpret=True, bf16=True, block_n=64, block_k=128)
        )
        assert np.abs(got - ref).max() < 3e-3

    def test_spearman_variant(self, rng):
        x = rng.randn(100, 64).astype(np.float32)
        ref = np.asarray(compute_rdm(x, correlation="spearman"))
        got = np.asarray(
            compute_rdm_pallas(x, correlation="spearman", interpret=True,
                               bf16=False, block_n=64, block_k=64)
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_diagonal_zero_and_symmetric(self, rng):
        x = rng.randn(96, 100).astype(np.float32)
        got = np.asarray(
            compute_rdm_pallas(x, interpret=True, bf16=False, block_n=32, block_k=128)
        )
        np.testing.assert_allclose(np.diag(got), 0.0, atol=1e-6)
        np.testing.assert_allclose(got, got.T, atol=1e-5)
