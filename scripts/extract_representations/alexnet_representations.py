"""AlexNet fc2 features for all ImageNet images (PCA-label source).

Reference parity: scripts/extract_representations/alexnet_representations.py
— penultimate (fc2, 4096-d) features from IMAGENET1K AlexNet, saved to
features_alexnet.npz. Runs the jitted flax forward with the fc2_post tap.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from scripts.extract_representations.utils import extract_and_save
from visreps_tpu.models.zoo import init_model


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="features_alexnet.npz")
    parser.add_argument("--batch-size", type=int, default=256)
    args = parser.parse_args(argv)

    from visreps_tpu.models.torch_import import load_pretrained_torch

    state = init_model("AlexNet", 1000, seed=0)
    state = load_pretrained_torch(state, "AlexNet", 1000)

    @jax.jit
    def fwd(variables, x):
        _, taps = state.module.apply(variables, x, train=False, capture=("fc2_post",))
        return taps["fc2_post"]

    def extract(batch):
        return fwd(state.variables, jnp.asarray(batch))

    extract_and_save(extract, args.out, batch_size=args.batch_size)


if __name__ == "__main__":
    main()
