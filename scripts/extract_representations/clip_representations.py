"""CLIP ViT-L/14 image features (L2-normalized) for all ImageNet images.

Reference parity: scripts/extract_representations/clip_representations.py
— encode_image embeddings, L2-normalized, saved to features_clip.npz.
Uses HuggingFace transformers (baked in); requires the model weights in
the local HF cache (zero-egress environments must pre-seed it).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from scripts.extract_representations.utils import extract_and_save


def build_extract(model):
    """Batch (N,H,W,3 ImageNet-normalized) -> L2-normalized CLIP
    embeddings. Split out from main so offline tests can drive it with
    a config-initialized (weightless) CLIPModel."""
    import torch

    # CLIP normalization stats differ from ImageNet's
    clip_mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    clip_std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    imgnet_mean = np.array([0.485, 0.456, 0.406], np.float32)
    imgnet_std = np.array([0.229, 0.224, 0.225], np.float32)
    size = int(model.config.vision_config.image_size)

    @torch.no_grad()
    def extract(batch):
        # un-normalize from ImageNet stats, re-normalize with CLIP stats
        x = batch * imgnet_std + imgnet_mean
        x = (x - clip_mean) / clip_std
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).float()
        t = torch.nn.functional.interpolate(t, size=size, mode="bilinear",
                                            align_corners=False)
        emb = model.get_image_features(pixel_values=t)
        emb = emb / emb.norm(dim=-1, keepdim=True)
        return emb.numpy()

    return extract


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="openai/clip-vit-large-patch14")
    parser.add_argument("--out", default="features_clip.npz")
    parser.add_argument("--batch-size", type=int, default=128)
    args = parser.parse_args(argv)

    from transformers import CLIPModel

    model = CLIPModel.from_pretrained(args.model, local_files_only=True).eval()
    extract_and_save(build_extract(model), args.out, batch_size=args.batch_size)


if __name__ == "__main__":
    main()
