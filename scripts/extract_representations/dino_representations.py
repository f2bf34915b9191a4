"""DINOv2 CLS features for all ImageNet images — JAX forward.

Reference parity: scripts/extract_representations/dino_representations.py
(CLS-token features → features_dino.npz). TPU-native: the forward runs
through the flax DINOv2Tower (visreps_tpu/models/hf_vit.py,
golden-parity-tested vs HF torch); torch appears only inside the
ONE-TIME weight conversion. Position embeddings are interpolated to
the extraction resolution at conversion time (the HF torch model does
this per forward).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from scripts.extract_representations.utils import extract_and_save


def build_extract_jax(module, params):
    """(N,H,W,3) float32 → CLS-token features, one jitted program."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def extract(p, x):
        pooled, _ = module.apply({"params": p}, x, train=False, capture=())
        return pooled

    return lambda batch: np.asarray(extract(params, jnp.asarray(batch, jnp.float32)))


def build_extract(model, image_size: int | None = None):
    """HF torch Dinov2Model → JAX extract fn (weights converted once).

    Kept as the offline-test entry: config-initialized (weightless)
    torch models drive the same conversion + jitted forward used by
    main(). image_size (default: the model's configured size) fixes
    the position-embedding grid.
    """
    from visreps_tpu.models.hf_vit import interpolate_positions, tower_from_hf_dinov2

    import jax.numpy as jnp

    module, params = tower_from_hf_dinov2(model)
    size = int(image_size or model.config.image_size)
    n_patches = (size // module.patch) ** 2
    params["pos_embedding"] = jnp.asarray(interpolate_positions(
        np.asarray(params["pos_embedding"]), n_patches))
    return build_extract_jax(module, params)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="facebook/dinov2-large")
    parser.add_argument("--out", default="features_dino.npz")
    parser.add_argument("--batch-size", type=int, default=128)
    args = parser.parse_args(argv)

    from visreps_tpu.models.hf_vit import load_tower

    state = load_tower(args.model, pretrained=True)
    extract = build_extract_jax(state.module, state.params)
    extract_and_save(extract, args.out, batch_size=args.batch_size)


if __name__ == "__main__":
    main()
