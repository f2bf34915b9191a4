"""CLIP/DINO extraction paths with config-initialized (weightless) HF
models — VERDICT item 8's 'CLIP/DINO untested end-to-end' gap, runnable
in zero-egress environments."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


class TestClipExtract:
    def test_tiny_clip_embeddings(self):
        from transformers import CLIPConfig, CLIPModel

        from scripts.extract_representations.clip_representations import build_extract

        cfg = CLIPConfig.from_text_vision_configs(
            transformers.CLIPTextConfig(hidden_size=16, intermediate_size=32,
                                        num_hidden_layers=1, num_attention_heads=2,
                                        vocab_size=64, max_position_embeddings=8),
            transformers.CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                          num_hidden_layers=1, num_attention_heads=2,
                                          image_size=32, patch_size=16),
            projection_dim=8,
        )
        model = CLIPModel(cfg).eval()
        extract = build_extract(model)
        batch = np.random.RandomState(0).randn(3, 24, 24, 3).astype(np.float32)
        emb = extract(batch)
        assert emb.shape == (3, 8)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


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
