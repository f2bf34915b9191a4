"""Model architecture tests: shapes, tap contract, param counts, modes.

Mirrors the reference's architecture facts: CustomCNN ≈ 34M params at
1000 classes (manuscript/methods.md:56), 14 extraction points for 7
return_nodes (models/utils.py:49-53), frozen-BN semantics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visreps_tpu.models.extractor import expand_return_nodes
from visreps_tpu.models.zoo import TORCHVISION_RETURN_NODES, init_model


def _fwd(state, x, **kw):
    return state.module.apply(state.variables, jnp.asarray(x), **kw)


class TestCustomCNN:
    @pytest.fixture(scope="class")
    def state(self):
        return init_model("CustomCNN", 1000, seed=0)

    def test_param_count_close_to_reference(self, state):
        # Reference: ~34M params at 1000 classes (manuscript/methods.md:56)
        n = state.num_params()
        assert 30e6 < n < 40e6, n

    def test_logit_shape(self, state):
        x = np.zeros((2, 224, 224, 3), np.float32)
        logits, taps = _fwd(state, x, train=False, capture=())
        assert logits.shape == (2, 1000)
        assert taps == {}

    def test_14_extraction_points(self, state):
        nodes = ["conv1", "conv2", "conv3", "conv4", "conv5", "fc1", "fc2"]
        points, alias = expand_return_nodes(state.module, nodes, extract_pre_and_post=True)
        assert len(points) == 14
        x = np.random.RandomState(0).randn(2, 224, 224, 3).astype(np.float32)
        _, taps = _fwd(state, x, train=False, capture=tuple(points))
        assert set(taps) == set(points)
        # conv tap spatial shapes (NHWC): conv1 55x55x96 ... conv5 13x13x256
        assert taps["conv1_pre"].shape == (2, 55, 55, 96)
        assert taps["conv5_post"].shape == (2, 13, 13, 256)
        assert taps["fc2_post"].shape == (2, 4096)

    def test_post_is_relu_of_normed_pre(self, state):
        x = np.random.RandomState(1).randn(2, 224, 224, 3).astype(np.float32)
        _, taps = _fwd(state, x, train=False, capture=("conv3_pre", "conv3_post"))
        assert float(jnp.min(taps["conv3_post"])) >= 0.0
        assert float(jnp.min(taps["conv3_pre"])) < 0.0

    def test_trainable_mask(self):
        state = init_model("CustomCNN", 10, seed=0, cfg={"arch": {"conv_trainable": "00111", "fc_trainable": "110"}})
        mask = state.module.trainable_mask()
        assert mask == {
            "conv1": False, "conv2": False, "conv3": True, "conv4": True, "conv5": True,
            "fc1": True, "fc2": True, "fc3": False,
        }

    def test_dropout_requires_rng_only_in_train(self, state):
        x = np.zeros((2, 224, 224, 3), np.float32)
        logits, _ = _fwd(state, x, train=False, capture=())
        out = state.module.apply(
            state.variables, jnp.asarray(x), train=True, capture=(),
            rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
        )
        (logits_t, _), updates = out
        assert "batch_stats" in updates


class TestTinyCustomCNN:
    def test_shapes(self):
        state = init_model("TinyCustomCNN", 200, seed=0)
        x = np.zeros((2, 64, 64, 3), np.float32)
        logits, taps = _fwd(state, x, train=False, capture=("conv5_post", "fc1_post"))
        assert logits.shape == (2, 200)
        assert taps["fc1_post"].shape == (2, 2048)


class TestStandardModels:
    def test_alexnet_shapes_and_params(self):
        state = init_model("AlexNet", 1000, seed=0)
        # torchvision alexnet has 61.1M params
        assert 57e6 < state.num_params() < 65e6
        x = np.zeros((2, 224, 224, 3), np.float32)
        logits, taps = _fwd(state, x, train=False,
                            capture=("conv1_pre", "conv5_post", "fc2_post"))
        assert logits.shape == (2, 1000)
        assert taps["conv1_pre"].shape == (2, 55, 55, 64)
        assert taps["conv5_post"].shape == (2, 13, 13, 256)

    def test_resnet18_shapes(self):
        state = init_model("ResNet18", 1000, seed=0)
        assert 11e6 < state.num_params() < 12.5e6  # torch: 11.7M
        x = np.zeros((1, 224, 224, 3), np.float32)
        logits, taps = _fwd(state, x, train=False, capture=("conv1", "block8", "fc1"))
        assert logits.shape == (1, 1000)
        assert taps["conv1"].shape == (1, 112, 112, 64)
        assert taps["block8"].shape == (1, 7, 7, 512)

    def test_resnet50_param_count(self):
        state = init_model("ResNet50", 1000, seed=0)
        assert 24e6 < state.num_params() < 27e6  # torch: 25.6M

    def test_vit_shapes(self):
        state = init_model("ViTBase", 1000, seed=0)
        assert 80e6 < state.num_params() < 92e6  # torch: 86.6M
        x = np.zeros((1, 224, 224, 3), np.float32)
        logits, taps = _fwd(state, x, train=False, capture=("patch_embed", "block12", "head"))
        assert logits.shape == (1, 1000)
        assert taps["block12"].shape == (1, 197, 768)

    def test_vgg16_param_count(self):
        state = init_model("VGG16", 1000, seed=0)
        assert 130e6 < state.num_params() < 145e6  # torch: 138M

    def test_ecnet_weight_tying(self):
        state = init_model("ECTiedNet", 10, seed=0)
        x = np.zeros((1, 224, 224, 3), np.float32)
        logits, taps = _fwd(state, x, train=False, capture=("block1", "block4"))
        assert logits.shape == (1, 10)
        # tied weights: only ONE block's params exist
        assert "block" in state.params
        assert "block_1" not in state.params and "block2" not in state.params


class TestReturnNodeExpansion:
    def test_resnet_nodes_single_points(self):
        state = init_model("ResNet18", 10, seed=0)
        points, alias = expand_return_nodes(
            state.module, TORCHVISION_RETURN_NODES["ResNet18"], extract_pre_and_post=True
        )
        # ResNet taps have no pre/post split (reference keeps single entries)
        assert points == TORCHVISION_RETURN_NODES["ResNet18"]

    def test_post_only_mode_plain_names(self):
        state = init_model("AlexNet", 10, seed=0)
        points, alias = expand_return_nodes(state.module, ["conv1", "fc1"], extract_pre_and_post=False)
        assert points == ["conv1_post", "fc1_post"]
        assert alias == {"conv1_post": "conv1", "fc1_post": "fc1"}


class TestMultiLayerExact:
    def test_matches_single_layer(self):
        """extract_layers_exact == per-layer extract_single_layer."""
        import numpy as np

        from visreps_tpu.models.extractor import FeatureExtractor
        from visreps_tpu.models.zoo import init_model

        rng = np.random.RandomState(3)
        state = init_model("TinyCustomCNN", 8, seed=0)
        ex = FeatureExtractor(state, return_nodes=["conv5", "fc1"], srp_k=16,
                              batch_size=4, image_size=64)
        batches = [(rng.randn(4, 64, 64, 3).astype(np.float32),
                    [f"s{i}_{j}" for j in range(4)]) for i in range(3)]
        layers = ["conv5_post", "fc1_pre"]
        sids = [f"s{i}_{j}" for i in (2, 0) for j in (1, 3)]  # reorder+filter
        multi, ids_m = ex.extract_layers_exact(iter(batches), layers, sids)
        assert ids_m == sids
        for layer in layers:
            single, ids_s = ex.extract_single_layer(iter(batches), layer, sids)
            assert ids_s == ids_m
            np.testing.assert_allclose(multi[layer], single, rtol=1e-6)

    def test_device_store_matches_host(self):
        import numpy as np

        from visreps_tpu.models.extractor import FeatureExtractor
        from visreps_tpu.models.zoo import init_model

        rng = np.random.RandomState(4)
        state = init_model("TinyCustomCNN", 8, seed=0)
        ex = FeatureExtractor(state, return_nodes=["fc1"], srp_k=16,
                              batch_size=4, image_size=64)
        batches = [(rng.randn(4, 64, 64, 3).astype(np.float32),
                    [f"s{i}_{j}" for j in range(4)]) for i in range(2)]
        sids = ["s1_2", "s0_0"]
        host, ids_h = ex.extract_layers_exact(iter(batches), ["fc1_post"], sids,
                                              store="host")
        dev, ids_d = ex.extract_layers_exact(iter(batches), ["fc1_post"], sids,
                                             store="device")
        assert ids_h == ids_d == sids
        np.testing.assert_allclose(np.asarray(dev["fc1_post"]),
                                   host["fc1_post"], rtol=1e-6)


class TestDeviceStorePaths:
    """get_activations device-store variants: the in-place preallocated
    store (one donated dynamic_update_slice program per batch) and the
    superbatched feed must match the chunked-concat path bit-for-bit on
    the valid rows; padded tail rows are never referenced (every
    consumer gathers rows via the ids map)."""

    @pytest.fixture()
    def setup(self):
        import numpy as np

        from visreps_tpu.models.extractor import FeatureExtractor
        from visreps_tpu.models.zoo import init_model

        rng = np.random.RandomState(0)
        state = init_model("TinyCustomCNN", 8, seed=0)
        ex = FeatureExtractor(state, return_nodes=["conv1", "fc1"],
                              extract_pre_and_post=True, srp_k=16,
                              batch_size=8, image_size=64)
        batches = [(rng.randint(0, 256, (8, 64, 64, 3), np.uint8),
                    [f"s{i}_{j}" for j in range(8)]) for i in range(4)]
        batches.append((rng.randint(0, 256, (3, 64, 64, 3), np.uint8),
                        [f"s4_{j}" for j in range(3)]))

        class Loader:
            dataset = [None] * 35

            def __iter__(self):
                return iter(batches)

        return ex, Loader()

    @pytest.mark.parametrize("superbatch", ["1", "2"])
    def test_store_matches_chunks(self, setup, monkeypatch, superbatch):
        import numpy as np

        ex, loader = setup
        monkeypatch.setenv("VISREPS_STORE_UPDATE", "0")
        chunks, ids_c = ex.get_activations(loader, store="device")
        monkeypatch.setenv("VISREPS_STORE_UPDATE", "1")
        monkeypatch.setenv("VISREPS_SUPERBATCH", superbatch)
        stored, ids_s = ex.get_activations(loader, store="device")
        assert ids_c == ids_s and len(ids_s) == 35
        for k in chunks:
            assert chunks[k].shape[0] == 35
            assert stored[k].shape[0] % (8 * int(superbatch)) == 0
            np.testing.assert_allclose(
                np.asarray(chunks[k], np.float32),
                np.asarray(stored[k][:35], np.float32), rtol=2e-5, atol=2e-5)


class TestStandaloneExtractorVariants:
    """analysis/extract_representations: SRP / exact / spatial-pool
    variants (reference extract_representations.py:52-157)."""

    def _loader(self, rng, n_batches=2, bs=4):
        return [(rng.randn(bs, 64, 64, 3).astype(np.float32),
                 [f"im{i}_{j}" for j in range(bs)]) for i in range(n_batches)]

    def test_three_variants(self):
        import numpy as np

        from visreps_tpu.analysis.extract_representations import (
            extract_representations,
        )
        from visreps_tpu.models.zoo import init_model

        rng = np.random.RandomState(0)
        state = init_model("TinyCustomCNN", 8, seed=0)

        srp_acts, ids = extract_representations(
            state, self._loader(rng), ["conv5", "fc1"], srp_k=16,
            batch_size=4, image_size=64)
        assert srp_acts["conv5_post"].shape == (8, 16)

        exact_acts, ids2 = extract_representations(
            state, self._loader(rng), ["conv5", "fc1"], srp_k=0,
            batch_size=4, image_size=64)
        assert exact_acts["fc1_post"].shape[0] == 8
        assert exact_acts["conv5_post"].shape[1] > 16  # full flattened dim

        pooled, ids3 = extract_representations(
            state, self._loader(rng), ["conv5"], srp_k=0, spatial_pool=True,
            batch_size=4, image_size=64)
        # global mean pool -> one value per channel
        n_channels = state.params["conv5"]["conv"]["kernel"].shape[-1]
        assert pooled["conv5"].shape == (8, n_channels)
        assert ids3 == ids2 == ids


class TestInitParamCache:
    def test_put_parallel_exact_roundtrip(self, rng):
        """Chunked parallel upload reassembles every leaf bit-exactly,
        including leaves large enough to split."""
        import jax.numpy as jnp

        from visreps_tpu.models.zoo import _put_parallel

        tree = {
            "big": rng.randn(64, 33).astype(np.float32),   # split at 1 KB
            "small": rng.randn(3).astype(np.float32),
            "nested": {"w": rng.randn(8, 8).astype(np.float32)},
        }
        out = _put_parallel(tree, streams=3, split_bytes=1024)
        assert isinstance(out["big"], jnp.ndarray)
        np.testing.assert_array_equal(np.asarray(out["big"]), tree["big"])
        np.testing.assert_array_equal(np.asarray(out["small"]), tree["small"])
        np.testing.assert_array_equal(
            np.asarray(out["nested"]["w"]), tree["nested"]["w"])

    def test_init_cache_hit_matches_fresh_init(self, tmp_path, monkeypatch):
        """Second init_model call (cache hit, parallel upload) returns
        the same params as the first (cache write)."""
        import jax

        from visreps_tpu.models.zoo import init_model

        monkeypatch.setenv("VISREPS_INIT_CACHE_DIR", str(tmp_path))
        s1 = init_model("TinyCustomCNN", 10, seed=3)
        assert any(tmp_path.iterdir())  # cache written
        s2 = init_model("TinyCustomCNN", 10, seed=3)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            s1.params, s2.params)
