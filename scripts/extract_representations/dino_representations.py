"""DINOv2 CLS features for all ImageNet images.

Reference parity: scripts/extract_representations/dino_representations.py.
Requires DINOv2 weights in the local HF cache.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from scripts.extract_representations.utils import extract_and_save


def build_extract(model):
    """Batch (N,H,W,3) -> CLS-token features. Split out from main so
    offline tests can drive it with a config-initialized model."""
    import torch

    @torch.no_grad()
    def extract(batch):
        t = torch.from_numpy(np.transpose(batch, (0, 3, 1, 2))).float()
        out = model(pixel_values=t)
        return out.last_hidden_state[:, 0].numpy()  # CLS token

    return extract


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="facebook/dinov2-large")
    parser.add_argument("--out", default="features_dino.npz")
    parser.add_argument("--batch-size", type=int, default=128)
    args = parser.parse_args(argv)

    from transformers import AutoModel

    model = AutoModel.from_pretrained(args.model, local_files_only=True).eval()
    extract_and_save(build_extract(model), args.out, batch_size=args.batch_size)


if __name__ == "__main__":
    main()
