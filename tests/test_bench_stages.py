"""Smoke tests for the benchmark stages (tiny sizes, CPU)."""
import numpy as np

from visreps_tpu.benchmarks import stages


class TestStages:
    def test_rdm_stage(self):
        out = stages.stage_rdm(n=64, d=32)
        assert out["rdm_ms"] > 0

    def test_bootstrap_stage(self):
        out = stages.stage_bootstrap(n=40, n_bootstrap=8, chunk=4)
        assert out["bootstraps_per_sec"] > 0

    def test_selection_stage(self):
        out = stages.stage_selection(n_sel=30, k=16, n_taps=2)
        assert out["selection_s"] > 0

    def test_ridge_stage(self):
        out = stages.stage_ridge(n=60, d=8, v=4)
        assert out["ridge_cv_s"] > 0

    def test_extract_stage_small(self):
        out = stages.stage_extract(
            batch_size=2, iters=1, model="TinyCustomCNN", srp_k=64,
            image_size=64, return_nodes=("conv5", "fc1"),
        )
        assert out["images_per_sec"] > 0

    def test_extract_bf16_consistency(self, rng):
        """bf16 extraction stays close to f32 (JL noise dominates)."""
        import jax.numpy as jnp

        from visreps_tpu.models.extractor import FeatureExtractor
        from visreps_tpu.models.zoo import init_model

        state = init_model("TinyCustomCNN", 8, seed=0)
        kw = dict(return_nodes=["conv5", "fc1"], srp_k=64, batch_size=2, image_size=64)
        ex32 = FeatureExtractor(state, **kw)
        ex16 = FeatureExtractor(state, compute_dtype="bf16", **kw)
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        o32 = ex32._srp_step(state.variables, ex32._proj_dict(), x)
        o16 = ex16._srp_step(state.variables, ex16._proj_dict(), x)
        for k in o32:
            a, b = np.asarray(o32[k]), np.asarray(o16[k])
            denom = np.abs(a).mean() + 1e-6
            assert np.abs(a - b).mean() / denom < 0.1
