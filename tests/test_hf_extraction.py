"""CLIP/DINO extraction paths with config-initialized (weightless) HF
models — runnable in zero-egress environments. Round 4: the scripts
forward through the flax towers (torch only converts weights), so the
end-to-end checks here are differential vs the reference's torch
pipeline (VERDICT r3 item 5)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_clip():
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig.from_text_vision_configs(
        transformers.CLIPTextConfig(hidden_size=16, intermediate_size=32,
                                    num_hidden_layers=1, num_attention_heads=2,
                                    vocab_size=64, max_position_embeddings=8),
        transformers.CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                      num_hidden_layers=1, num_attention_heads=2,
                                      image_size=32, patch_size=16),
        projection_dim=8,
    )
    return CLIPModel(cfg).eval()


class TestClipExtract:
    def test_tiny_clip_embeddings(self):
        from scripts.extract_representations.clip_representations import build_extract

        extract = build_extract(_tiny_clip())
        batch = np.random.RandomState(0).randn(3, 24, 24, 3).astype(np.float32)
        emb = extract(batch)
        assert emb.shape == (3, 8)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)

    def test_jax_matches_torch_reference(self):
        """Identity-size batch (no resize): the JAX script pipeline
        (renorm → tower → L2) must match the reference's torch
        get_image_features pipeline."""
        from scripts.extract_representations.clip_representations import (
            CLIP_MEAN,
            CLIP_STD,
            IMGNET_MEAN,
            IMGNET_STD,
            build_extract,
        )

        model = _tiny_clip()
        extract = build_extract(model)
        batch = np.random.RandomState(1).randn(3, 32, 32, 3).astype(np.float32)
        ours = extract(batch)

        with torch.no_grad():
            x = batch * IMGNET_STD + IMGNET_MEAN
            x = (x - CLIP_MEAN) / CLIP_STD
            t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).float()
            ref = model.get_image_features(pixel_values=t)
            ref = (ref / ref.norm(dim=-1, keepdim=True)).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestDinoExtract:
    def test_tiny_dinov2_cls(self):
        from transformers import Dinov2Config, Dinov2Model

        from scripts.extract_representations.dino_representations import build_extract

        cfg = Dinov2Config(hidden_size=16, intermediate_size=32,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=32, patch_size=16)
        model = Dinov2Model(cfg).eval()
        extract = build_extract(model)
        batch = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
        feats = extract(batch)
        assert feats.shape == (2, 16)
        assert np.isfinite(feats).all()

    def test_jax_matches_torch_reference(self):
        from transformers import Dinov2Config, Dinov2Model

        from scripts.extract_representations.dino_representations import build_extract

        cfg = Dinov2Config(hidden_size=16, intermediate_size=32,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=32, patch_size=16)
        model = Dinov2Model(cfg).eval()
        extract = build_extract(model)
        batch = np.random.RandomState(2).randn(2, 32, 32, 3).astype(np.float32)
        ours = extract(batch)
        with torch.no_grad():
            t = torch.from_numpy(np.transpose(batch, (0, 3, 1, 2))).float()
            ref = model(pixel_values=t).last_hidden_state[:, 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-4)
