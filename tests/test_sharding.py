"""Mesh/sharding tests on the virtual 8-device CPU mesh.

The TPU-build analog of the reference's missing distributed tests
(SURVEY.md §4): the same math under jax.sharding on 1-vs-N devices.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visreps_tpu.ops.rdm import compute_rdm
from visreps_tpu.parallel.mesh import data_sharding, make_mesh, replicated, shard_params_tp
from visreps_tpu.parallel.shard import rdm_sharded


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(data=8, model=1)


@pytest.fixture(scope="module")
def mesh42():
    return make_mesh(data=4, model=2)


class TestShardedRDM:
    @pytest.mark.parametrize("n", [64, 100])  # 100 tests the pad path
    def test_matches_single_device(self, rng, mesh8, n):
        x = rng.randn(n, 256).astype(np.float32)
        expected = np.asarray(compute_rdm(x))
        got = np.asarray(rdm_sharded(x, mesh8))
        np.testing.assert_allclose(got, expected, atol=2e-5)

    def test_spearman_variant(self, rng, mesh8):
        x = rng.randn(64, 128).astype(np.float32)
        expected = np.asarray(compute_rdm(x, correlation="spearman"))
        got = np.asarray(rdm_sharded(x, mesh8, correlation="spearman"))
        np.testing.assert_allclose(got, expected, atol=2e-5)

    def test_2d_mesh(self, rng, mesh42):
        x = rng.randn(48, 64).astype(np.float32)
        expected = np.asarray(compute_rdm(x))
        got = np.asarray(rdm_sharded(x, mesh42))
        np.testing.assert_allclose(got, expected, atol=2e-5)


class TestDataParallelTrainStep:
    def test_sharded_step_matches_replicated(self, rng):
        """One train step on a 8-way sharded batch == single-device step."""
        from visreps_tpu.core.config import Config
        from visreps_tpu.models.zoo import init_model
        from visreps_tpu.train.optim import setup_optimizer
        from visreps_tpu.train.trainer import make_train_step

        cfg = Config({
            "optimizer": "adamw", "learning_rate": 1e-3, "weight_decay": 1e-3,
            "grad_clip": 1.0, "lr_scheduler": "cosineannealinglr",
            "num_epochs": 2, "warmup_epochs": 0,
        })
        state = init_model("TinyCustomCNN", 8, seed=0)
        tx, _ = setup_optimizer(state.params, cfg, steps_per_epoch=1)
        step = make_train_step(state.module, tx)

        images = rng.randn(16, 64, 64, 3).astype(np.float32)
        labels = (np.arange(16) % 8).astype(np.int32)
        key = jax.random.PRNGKey(0)

        # single-device
        p1, s1, o1, loss1, gn1 = step(
            jax.tree_util.tree_map(jnp.array, state.params),
            jax.tree_util.tree_map(jnp.array, state.batch_stats),
            tx.init(state.params), jnp.asarray(images), jnp.asarray(labels), key,
        )

        # 8-way data parallel
        mesh = make_mesh(data=8, model=1)
        rep = replicated(mesh)
        params = jax.device_put(state.params, rep)
        stats = jax.device_put(state.batch_stats, rep)
        opt = jax.device_put(tx.init(state.params), rep)
        im = jax.device_put(jnp.asarray(images), data_sharding(mesh))
        lb = jax.device_put(jnp.asarray(labels), data_sharding(mesh))
        with mesh:
            p8, s8, o8, loss8, gn8 = step(params, stats, opt, im, lb, key)

        np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
        np.testing.assert_allclose(float(gn1), float(gn8), rtol=1e-3)
        # Adam's m/√v normalizes each update to ~lr, so a near-zero
        # gradient whose SIGN flips under cross-device reduction order
        # moves a param by up to 2·lr — bound the comparison there.
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)
        # BatchNorm batch stats must be GLOBAL-batch stats in both cases
        for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestTensorParallel:
    def test_tp_forward_matches_replicated(self, rng):
        from visreps_tpu.models.zoo import init_model

        state = init_model("CustomCNN", 16, seed=0, input_size=64)
        x = rng.randn(4, 64, 64, 3).astype(np.float32)
        logits_ref, _ = state.module.apply(state.variables, jnp.asarray(x), train=False, capture=())

        mesh = make_mesh(data=4, model=2)
        params = shard_params_tp(state.params, mesh)
        stats = jax.device_put(state.batch_stats, replicated(mesh))
        with mesh:
            logits_tp, _ = state.module.apply(
                {"params": params, "batch_stats": stats},
                jax.device_put(jnp.asarray(x), data_sharding(mesh)),
                train=False, capture=(),
            )
        np.testing.assert_allclose(np.asarray(logits_ref), np.asarray(logits_tp), atol=1e-4)


class TestDefaultMesh:
    def test_auto_builds_over_all_devices(self):
        from visreps_tpu.parallel.auto import default_mesh

        mesh = default_mesh()
        assert mesh is not None
        assert mesh.shape == {"data": 8, "model": 1}

    def test_disabled_by_config(self):
        from visreps_tpu.core.config import Config
        from visreps_tpu.parallel.auto import default_mesh

        assert default_mesh(Config({"use_mesh": False})) is None

    def test_model_axis_from_config(self):
        from visreps_tpu.core.config import Config
        from visreps_tpu.parallel.auto import default_mesh

        mesh = default_mesh(Config({"mesh_model_axis": 2}))
        assert mesh.shape == {"data": 4, "model": 2}

    def test_bad_model_axis_raises(self):
        from visreps_tpu.core.config import Config
        from visreps_tpu.parallel.auto import default_mesh

        with pytest.raises(ValueError):
            default_mesh(Config({"mesh_model_axis": 3}))


class TestShardedBootstrap:
    @pytest.mark.parametrize("method", ["spearman", "pearson"])
    def test_matches_single_device(self, rng, mesh8, method):
        from visreps_tpu.ops.bootstrap import bootstrap_rdm_correlation
        from visreps_tpu.ops.rdm import compute_rdm

        a = np.asarray(compute_rdm(rng.randn(40, 32).astype(np.float32)))
        b = np.asarray(compute_rdm(rng.randn(40, 16).astype(np.float32)))
        ref = bootstrap_rdm_correlation(a, b, n_bootstrap=24, seed=42, method=method)
        got = bootstrap_rdm_correlation(a, b, n_bootstrap=24, seed=42, method=method, mesh=mesh8)
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_nonmultiple_iteration_count(self, rng, mesh8):
        """n_bootstrap not divisible by n_devices pads then slices."""
        from visreps_tpu.ops.bootstrap import bootstrap_rdm_correlation
        from visreps_tpu.ops.rdm import compute_rdm

        a = np.asarray(compute_rdm(rng.randn(30, 16).astype(np.float32)))
        b = np.asarray(compute_rdm(rng.randn(30, 8).astype(np.float32)))
        ref = bootstrap_rdm_correlation(a, b, n_bootstrap=13, seed=42)
        got = bootstrap_rdm_correlation(a, b, n_bootstrap=13, seed=42, mesh=mesh8)
        np.testing.assert_allclose(got, ref, atol=1e-6)


class TestShardedGroupedScoring:
    """VERDICT r4 item 2: the flagship one-program scoring path must
    run under the mesh — iteration-sharded, bit-equal to one device."""

    def _fixture(self, rng, n=40, n_boot=16):
        from visreps_tpu.ops.bootstrap import bootstrap_indices

        layers = {f"tap{i}": compute_rdm(
            rng.randn(n, 64).astype(np.float32)) for i in range(3)}
        pairs = {("r0", s): rng.randn(n, 8 + 4 * s).astype(np.float32)
                 for s in range(4)}
        pair_layer = {k: f"tap{i % 3}" for i, k in enumerate(pairs)}
        idx = bootstrap_indices(n, n_boot, seed=42)
        return layers, pairs, pair_layer, idx

    def test_matches_single_device(self, rng, mesh8):
        from visreps_tpu.ops.bootstrap import grouped_scoring

        layers, pairs, pair_layer, idx = self._fixture(rng)
        boot_s, point_s = grouped_scoring(layers, pairs, pair_layer, idx)
        boot_m, point_m = grouped_scoring(layers, pairs, pair_layer, idx,
                                          mesh=mesh8)
        assert set(boot_s) == set(boot_m)
        for k in boot_s:
            np.testing.assert_allclose(boot_m[k], boot_s[k], atol=1e-5)
            np.testing.assert_allclose(point_m[k], point_s[k], atol=1e-6)

    def test_nonmultiple_iteration_count(self, rng, mesh8):
        """B not divisible by ndev: pad path must not duplicate/drop."""
        from visreps_tpu.ops.bootstrap import grouped_scoring

        layers, pairs, pair_layer, idx = self._fixture(rng, n_boot=13)
        boot_s, _ = grouped_scoring(layers, pairs, pair_layer, idx)
        boot_m, _ = grouped_scoring(layers, pairs, pair_layer, idx,
                                    mesh=mesh8)
        for k in boot_s:
            assert boot_m[k].shape == (13,)
            np.testing.assert_allclose(boot_m[k], boot_s[k], atol=1e-5)

    def test_2d_mesh(self, rng, mesh42):
        from visreps_tpu.ops.bootstrap import grouped_scoring

        layers, pairs, pair_layer, idx = self._fixture(rng)
        boot_s, _ = grouped_scoring(layers, pairs, pair_layer, idx)
        boot_m, _ = grouped_scoring(layers, pairs, pair_layer, idx,
                                    mesh=mesh42)
        for k in boot_s:
            np.testing.assert_allclose(boot_m[k], boot_s[k], atol=1e-5)


class TestMeshEncoding:
    """VERDICT r4 item 4: row-sharded encoding inputs must reproduce
    the single-device numbers on IDENTICAL inputs (GSPMD partitions
    the Gram/eigh/CV programs; XLA inserts the psums)."""

    def test_subject_scores_match(self, rng, mesh8):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from visreps_tpu.analysis.encoding import compute_encoding_scores_subject

        n_tr, n_te, d = 32, 16, 8
        acts_tr = {f"t{i}": rng.randn(n_tr, d).astype(np.float32)
                   for i in range(2)}
        acts_te = {f"t{i}": rng.randn(n_te, d).astype(np.float32)
                   for i in range(2)}
        w = rng.randn(d, 6).astype(np.float32)
        y_tr = {"r": acts_tr["t1"] @ w + 0.1 * rng.randn(n_tr, 6).astype(np.float32)}
        y_te = {"r": acts_te["t1"] @ w + 0.1 * rng.randn(n_te, 6).astype(np.float32)}

        single = compute_encoding_scores_subject(
            acts_tr, acts_te, y_tr, y_te, bootstrap=True, n_bootstrap=6)

        row = NamedSharding(mesh8, P("data", None))
        put = lambda t: {k: jax.device_put(jnp.asarray(v), row)  # noqa: E731
                         for k, v in t.items()}
        meshed = compute_encoding_scores_subject(
            put(acts_tr), put(acts_te), put(y_tr), put(y_te),
            bootstrap=True, n_bootstrap=6)

        for r in single:
            s, m = single[r][0], meshed[r][0]
            assert s["layer"] == m["layer"] == "t1"
            np.testing.assert_allclose(m["score"], s["score"], atol=1e-4)
            np.testing.assert_allclose(m["bootstrap_scores"],
                                       s["bootstrap_scores"], atol=1e-4)


class TestMeshExtractor:
    def _extractor(self, mesh=None, batch_size=8):
        from visreps_tpu.models.extractor import FeatureExtractor
        from visreps_tpu.models.zoo import init_model

        state = init_model("TinyCustomCNN", 8, seed=0)
        return FeatureExtractor(
            state, ["conv4", "conv5", "fc1"], srp_k=64,
            batch_size=batch_size, image_size=64, mesh=mesh,
        )

    def test_batch_sharding_introspection(self, mesh8):
        from jax.sharding import PartitionSpec as P

        ex = self._extractor(mesh8)
        batch = np.zeros((8, 64, 64, 3), np.float32)
        arr = ex._to_device(batch)
        assert arr.sharding.spec == P("data")
        assert len(arr.sharding.device_set) == 8

    def test_batch_size_rounded_to_mesh(self, mesh8):
        ex = self._extractor(mesh8, batch_size=12)
        assert ex.batch_size == 16

    def test_activations_match_single_device(self, rng, mesh8):
        ex1 = self._extractor(None)
        ex8 = self._extractor(mesh8)
        batches = [
            ((rng.rand(8, 64, 64, 3).astype(np.float32)), [str(8 * b + i) for i in range(8)])
            for b in range(3)
        ]
        acts1, ids1 = ex1.get_activations(iter(batches))
        acts8, ids8 = ex8.get_activations(iter(batches))
        assert ids1 == ids8
        for name in acts1:
            np.testing.assert_allclose(acts8[name], acts1[name], atol=2e-2)

    def test_single_layer_matches(self, rng, mesh8):
        ex1 = self._extractor(None)
        ex8 = self._extractor(mesh8)
        batches = [(rng.rand(8, 64, 64, 3).astype(np.float32), [str(i) for i in range(8)])]
        a1, _ = ex1.extract_single_layer(iter(batches), "fc1_post")
        a8, _ = ex8.extract_single_layer(iter(batches), "fc1_post")
        np.testing.assert_allclose(a8, a1, atol=1e-4)


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
