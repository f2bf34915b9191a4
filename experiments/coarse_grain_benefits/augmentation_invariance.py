"""Augmentation invariance of checkpoint representations.

Mirrors the reference's augmentation-invariance experiment: cosine
similarity between a tap's activations for clean vs augmented (flip /
small-rotation) versions of the same images — higher = more invariant.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp

from visreps_tpu.core.config import Config
from visreps_tpu.core.logging import rprint
from visreps_tpu.data.augment import augment_batch
from visreps_tpu.data.loader import PrefetchLoader
from visreps_tpu.data.obj_cls import TinyImageNetDataset
from visreps_tpu.data.transforms import get_transform
from visreps_tpu.models.extractor import FeatureExtractor
from visreps_tpu.models.zoo import load_model


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--cfg-id", required=True)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--checkpoint-model", default="checkpoint_epoch_20.pth")
    parser.add_argument("--layers", nargs="+", default=["conv5", "fc2"])
    parser.add_argument("--probe-dataset", required=True)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--max-batches", type=int, default=8)
    args = parser.parse_args(argv)

    cfg = Config({
        "load_model_from": "checkpoint", "seed": args.seed, "cfg_id": args.cfg_id,
        "checkpoint_dir": args.checkpoint_dir, "checkpoint_model": args.checkpoint_model,
    })
    state = load_model(cfg)
    extractor = FeatureExtractor(state, args.layers, srp_k=4096,
                                 batch_size=args.batch_size, image_size=224)
    proj = extractor._proj_dict()

    ds = TinyImageNetDataset(args.probe_dataset, "val", get_transform("imgnet"))
    loader = PrefetchLoader(ds, batch_size=args.batch_size, shuffle=False, num_workers=8)

    sims: dict[str, list] = {}
    key = jax.random.PRNGKey(0)
    for i, (batch, _) in enumerate(loader):
        if i >= args.max_batches:
            break
        x = jnp.asarray(batch)
        if x.shape[0] < args.batch_size:
            break
        key, ak = jax.random.split(key)
        x_aug = augment_batch(ak, x)
        clean = extractor._srp_step(state.variables, proj, x)
        aug = extractor._srp_step(state.variables, proj, x_aug)
        for name in clean:
            a, b = np.asarray(clean[name]), np.asarray(aug[name])
            num = (a * b).sum(axis=1)
            den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-8
            sims.setdefault(name, []).extend((num / den).tolist())

    for name, vals in sims.items():
        rprint(f"{name}: augmentation cosine invariance "
               f"{np.mean(vals):.4f} ± {np.std(vals):.4f} (n={len(vals)})",
               style="highlight")


if __name__ == "__main__":
    main()
