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

    def test_exact_ties_matches_scipy_on_tied_values(self, rng):
        """The sort-free exact-tie Spearman kernel (static tie-segment
        gathers, no per-iteration sort) must match scipy's average-tie
        spearmanr on heavily tied triangles."""
        n = 40
        a = rng.randn(n, 8).astype(np.float32)
        r1 = np.asarray(compute_rdm(a))
        r2 = np.asarray(compute_rdm(a + 0.5 * rng.randn(n, 8).astype(np.float32)))
        # inject ties: quantize one matrix coarsely, clamp-tie the other
        r1 = np.round(r1, 1)
        r2 = np.minimum(r2, np.percentile(r2, 80.0))
        n_boot = 6
        idx = bootstrap_indices(n, n_boot, seed=42)
        scores = bootstrap_rdm_correlation(
            r1, r2, n_bootstrap=n_boot, seed=42, method="spearman",
            chunk=3, exact_ties=True)
        for i in range(n_boot):
            ix = idx[i]
            iu = np.triu_indices(len(ix), k=1)
            v1 = r1[np.ix_(ix, ix)][iu]
            v2 = r2[np.ix_(ix, ix)][iu]
            expected = scipy.stats.spearmanr(v1, v2).statistic
            np.testing.assert_allclose(scores[i], expected, rtol=1e-4, atol=1e-5)
            # the dense-rank fast path genuinely differs on these inputs
        dense = bootstrap_rdm_correlation(
            r1, r2, n_bootstrap=n_boot, seed=42, method="spearman",
            chunk=3, exact_ties=False)
        assert np.max(np.abs(dense - scores)) > 1e-6

    def test_exact_ties_equals_fast_path_when_tie_free(self, rdm_pair):
        r1, r2 = rdm_pair
        s_fast = bootstrap_rdm_correlation(
            r1, r2, n_bootstrap=8, seed=42, exact_ties=False)
        s_exact = bootstrap_rdm_correlation(
            r1, r2, n_bootstrap=8, seed=42, exact_ties=True)
        np.testing.assert_allclose(s_fast, s_exact, atol=1e-4)

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


class TestKendallFastKernel:
    """The masked-inversion Kendall kernel (ops/kendall.py) must match
    the general gathered-triangle path (itself scipy-parity-tested
    above) EXACTLY, including tie handling."""

    def _general(self, r1, r2, idx):
        from visreps_tpu.ops.bootstrap import _bootstrap_scores
        import jax.numpy as jnp

        return np.asarray(_bootstrap_scores(
            jnp.asarray(r1), jnp.asarray(r2), jnp.asarray(idx), "kendall", 4
        ))

    def _fast(self, r1, r2, idx):
        from visreps_tpu.ops.kendall import bootstrap_kendall_fast
        import jax.numpy as jnp

        return np.asarray(bootstrap_kendall_fast(
            jnp.asarray(r1, jnp.float32), jnp.asarray(r2, jnp.float32),
            jnp.asarray(idx), 4
        ))

    def test_matches_general_path(self, rdm_pair):
        r1, r2 = rdm_pair
        idx = bootstrap_indices(r1.shape[0], 8, seed=42)
        np.testing.assert_allclose(
            self._fast(r1, r2, idx), self._general(r1, r2, idx), atol=1e-5
        )

    def test_heavy_ties(self, rng):
        """Quantized RDMs force tie groups in both va and vb (and joint
        ties); tau-a's tie corrections must match exactly."""
        a = np.round(np.asarray(compute_rdm(rng.randn(30, 8).astype(np.float32))), 1)
        b = np.round(np.asarray(compute_rdm(rng.randn(30, 8).astype(np.float32))), 1)
        idx = bootstrap_indices(30, 6, seed=1)
        np.testing.assert_allclose(
            self._fast(a, b, idx), self._general(a, b, idx), atol=1e-5
        )

    def test_non_pow2_triangle(self, rng):
        """n=17 → M=136 pairs (pads to 256) exercises padding slots."""
        a = np.asarray(compute_rdm(rng.randn(17, 12).astype(np.float32)))
        b = np.asarray(compute_rdm(rng.randn(17, 12).astype(np.float32)))
        idx = bootstrap_indices(17, 5, seed=3)
        np.testing.assert_allclose(
            self._fast(a, b, idx), self._general(a, b, idx), atol=1e-5
        )

    def test_dispatcher_routes_kendall(self, rdm_pair):
        """bootstrap_rdm_correlation(method='kendall') must use the fast
        kernel and still match the general path."""
        r1, r2 = rdm_pair
        idx = bootstrap_indices(r1.shape[0], 6, seed=42)
        via_dispatch = bootstrap_rdm_correlation(
            r1, r2, n_bootstrap=6, seed=42, method="kendall"
        )
        np.testing.assert_allclose(via_dispatch, self._general(r1, r2, idx), atol=1e-5)

    def test_sharded_matches(self, rdm_pair):
        from visreps_tpu.parallel.mesh import make_mesh

        r1, r2 = rdm_pair
        mesh = make_mesh(data=8, model=1)
        ref = bootstrap_rdm_correlation(r1, r2, n_bootstrap=16, seed=42, method="kendall")
        got = bootstrap_rdm_correlation(
            r1, r2, n_bootstrap=16, seed=42, method="kendall", mesh=mesh
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestGroupedBootstrap:
    """bootstrap_rdm_correlation_grouped: one program for every
    (pair -> layer) bootstrap, average-tie exact."""

    def test_matches_per_pair_exact_kernel(self, rng):
        from visreps_tpu.ops.bootstrap import bootstrap_rdm_correlation_grouped

        n = 40
        layers = {
            f"l{i}": np.asarray(compute_rdm(rng.randn(n, 16).astype(np.float32)))
            for i in range(3)
        }
        pair_neural, pair_layer = {}, {}
        for p in range(5):
            pair_neural[("r", p)] = np.asarray(
                compute_rdm(rng.randn(n, 8).astype(np.float32)))
            pair_layer[("r", p)] = f"l{p % 3}"
        idx = bootstrap_indices(n, 12, seed=42)
        got = bootstrap_rdm_correlation_grouped(
            layers, pair_neural, pair_layer, idx, chunk=5)
        for k in pair_neural:
            ref = bootstrap_rdm_correlation(
                layers[pair_layer[k]], pair_neural[k], indices=idx,
                exact_ties=True)
            np.testing.assert_allclose(got[k], ref, atol=1e-5)

    def test_scipy_parity_on_tied_values(self, rng):
        """Quantized RDM values force ties; every iteration must match
        a direct scipy spearmanr over the gathered sub-triangle."""
        from visreps_tpu.ops.bootstrap import bootstrap_rdm_correlation_grouped

        n = 24
        a = np.round(np.asarray(compute_rdm(
            rng.randn(n, 6).astype(np.float32))) * 8) / 8
        b = np.round(np.asarray(compute_rdm(
            rng.randn(n, 6).astype(np.float32))) * 8) / 8
        idx = bootstrap_indices(n, 6, seed=1)
        got = bootstrap_rdm_correlation_grouped(
            {"l": a}, {("r", 0): b}, {("r", 0): "l"}, idx, chunk=3)[("r", 0)]
        for i, ix in enumerate(idx):
            iu, ju = np.triu_indices(len(ix), k=1)
            v1 = a[ix[iu], ix[ju]]
            v2 = b[ix[iu], ix[ju]]
            expected = scipy.stats.spearmanr(v1, v2).statistic
            np.testing.assert_allclose(got[i], expected, atol=1e-5)

    def test_layer_sharing_isolated_per_pair(self, rng):
        """Two pairs sharing one layer must score independently against
        their own neural RDMs."""
        from visreps_tpu.ops.bootstrap import bootstrap_rdm_correlation_grouped

        n = 30
        shared = np.asarray(compute_rdm(rng.randn(n, 10).astype(np.float32)))
        nb1 = np.asarray(compute_rdm(
            (rng.randn(n, 10) * 0.1).astype(np.float32)))
        nb2 = np.asarray(compute_rdm(rng.randn(n, 10).astype(np.float32)))
        idx = bootstrap_indices(n, 8, seed=9)
        got = bootstrap_rdm_correlation_grouped(
            {"L": shared}, {"p1": nb1, "p2": nb2}, {"p1": "L", "p2": "L"}, idx)
        for key, neural in [("p1", nb1), ("p2", nb2)]:
            ref = bootstrap_rdm_correlation(
                shared, neural, indices=idx, exact_ties=True)
            np.testing.assert_allclose(got[key], ref, atol=1e-5)


class TestGroupedScoring:
    """grouped_scoring: the whole scoring phase (neural RDMs + point
    scores + bootstrap) as one program (VERDICT r3 item 3)."""

    def _fixture(self, rng, n=36, n_layers=3, n_pairs=5):
        layers = {
            f"l{i}": np.asarray(compute_rdm(rng.randn(n, 16).astype(np.float32)))
            for i in range(n_layers)
        }
        neural_mats, pair_layer = {}, {}
        for p in range(n_pairs):
            # per-pair voxel widths differ, like real NSD regions
            neural_mats[("r", p)] = rng.randn(n, 6 + 2 * p).astype(np.float32)
            pair_layer[("r", p)] = f"l{p % n_layers}"
        return layers, neural_mats, pair_layer, n

    def test_bootstrap_matches_grouped_kernel(self, rng):
        from visreps_tpu.ops.bootstrap import (
            bootstrap_rdm_correlation_grouped,
            grouped_scoring,
        )

        layers, neural_mats, pair_layer, n = self._fixture(rng)
        idx = bootstrap_indices(n, 10, seed=42)
        boots, _ = grouped_scoring(layers, neural_mats, pair_layer, idx, chunk=4)
        neural_rdms = {k: np.asarray(compute_rdm(v)) for k, v in neural_mats.items()}
        ref = bootstrap_rdm_correlation_grouped(
            layers, neural_rdms, pair_layer, idx, chunk=4)
        for k in neural_mats:
            np.testing.assert_allclose(boots[k], ref[k], atol=1e-5)

    def test_point_scores_match_scipy(self, rng):
        from visreps_tpu.ops.bootstrap import grouped_scoring

        layers, neural_mats, pair_layer, n = self._fixture(rng)
        idx = bootstrap_indices(n, 4, seed=42)
        _, points = grouped_scoring(layers, neural_mats, pair_layer, idx)
        iu, ju = np.triu_indices(n, k=1)
        for k, y in neural_mats.items():
            nr = np.asarray(compute_rdm(y))
            mr = layers[pair_layer[k]]
            expected = scipy.stats.spearmanr(mr[iu, ju], nr[iu, ju]).statistic
            np.testing.assert_allclose(points[k], expected, atol=1e-5)

    def test_point_scores_scipy_exact_on_ties(self, rng):
        """Quantized RDMs force ties; the full-triangle point score
        must use scipy's average ranks."""
        from visreps_tpu.ops.bootstrap import grouped_scoring

        n = 24
        a = np.round(np.asarray(compute_rdm(
            rng.randn(n, 6).astype(np.float32))) * 8) / 8
        y = rng.randn(n, 5).astype(np.float32)
        # quantize the neural responses so the neural RDM ties too
        y = np.round(y * 2) / 2
        idx = bootstrap_indices(n, 3, seed=1)
        _, points = grouped_scoring({"l": a}, {("r", 0): y}, {("r", 0): "l"}, idx)
        nr = np.asarray(compute_rdm(y))
        iu, ju = np.triu_indices(n, k=1)
        expected = scipy.stats.spearmanr(a[iu, ju], nr[iu, ju]).statistic
        np.testing.assert_allclose(points[("r", 0)], expected, atol=1e-5)


class TestSinglePairScoring:
    """single_pair_scoring: RDMs + point + bootstrap fused from the raw
    activation matrices (VERDICT r4 item 6 — the THINGS scoring path)."""

    def test_matches_scipy_point_and_exact_bootstrap(self, rng):
        from visreps_tpu.ops.bootstrap import (
            bootstrap_rdm_correlation,
            single_pair_scoring,
        )

        n = 30
        acts = rng.randn(n, 12).astype(np.float32)
        neural = rng.randn(n, 7).astype(np.float32)
        idx = bootstrap_indices(n, 8, seed=42)
        boot, point = single_pair_scoring(acts, neural, idx)
        mr, nr = np.asarray(compute_rdm(acts)), np.asarray(compute_rdm(neural))
        iu, ju = np.triu_indices(n, k=1)
        expected = scipy.stats.spearmanr(mr[iu, ju], nr[iu, ju]).statistic
        np.testing.assert_allclose(point, expected, atol=1e-5)
        ref = bootstrap_rdm_correlation(mr, nr, indices=idx, exact_ties=True)
        np.testing.assert_allclose(boot, ref, atol=1e-5)

    def test_scipy_exact_on_tied_triangles(self, rng):
        from visreps_tpu.ops.bootstrap import single_pair_scoring

        n = 20
        acts = np.round(rng.randn(n, 4) * 2).astype(np.float32) / 2
        neural = np.round(rng.randn(n, 3) * 2).astype(np.float32) / 2
        idx = bootstrap_indices(n, 5, seed=1)
        _, point = single_pair_scoring(acts, neural, idx)
        mr, nr = np.asarray(compute_rdm(acts)), np.asarray(compute_rdm(neural))
        iu, ju = np.triu_indices(n, k=1)
        expected = scipy.stats.spearmanr(mr[iu, ju], nr[iu, ju]).statistic
        np.testing.assert_allclose(point, expected, atol=1e-5)

    def test_mesh_matches_single_device(self, rng):
        from visreps_tpu.parallel.mesh import make_mesh
        from visreps_tpu.ops.bootstrap import single_pair_scoring

        n = 24
        acts = rng.randn(n, 8).astype(np.float32)
        neural = rng.randn(n, 5).astype(np.float32)
        idx = bootstrap_indices(n, 11, seed=3)
        boot_s, point_s = single_pair_scoring(acts, neural, idx)
        boot_m, point_m = single_pair_scoring(acts, neural, idx,
                                              mesh=make_mesh(data=8, model=1))
        np.testing.assert_allclose(boot_m, boot_s, atol=1e-5)
        np.testing.assert_allclose(point_m, point_s, atol=1e-6)
