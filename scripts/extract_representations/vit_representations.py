"""ViT-L CLS features for all ImageNet images.

Reference parity: scripts/extract_representations/vit_representations.py.
Uses our flax ViT-B when no torch weights are available, or a local
HF ViT-L when present.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from scripts.extract_representations.utils import extract_and_save


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="google/vit-large-patch16-224")
    parser.add_argument("--out", default="features_vit.npz")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--backend", choices=["hf", "flax"], default="hf")
    args = parser.parse_args(argv)

    if args.backend == "hf":
        import torch
        from transformers import AutoModel

        model = AutoModel.from_pretrained(args.model, local_files_only=True).eval()

        @torch.no_grad()
        def extract(batch):
            t = torch.from_numpy(np.transpose(batch, (0, 3, 1, 2))).float()
            out = model(pixel_values=t)
            return out.last_hidden_state[:, 0].numpy()
    else:
        import jax
        import jax.numpy as jnp

        from visreps_tpu.models.torch_import import load_pretrained_torch
        from visreps_tpu.models.zoo import init_model

        state = init_model("ViTBase", 1000, seed=0)
        state = load_pretrained_torch(state, "ViTBase", 1000)

        @jax.jit
        def fwd(variables, x):
            _, taps = state.module.apply(variables, x, train=False, capture=("block12",))
            return taps["block12"][:, 0]  # CLS token

        def extract(batch):
            return fwd(state.variables, jnp.asarray(batch))

    extract_and_save(extract, args.out, batch_size=args.batch_size)


if __name__ == "__main__":
    main()
