"""Linear probes on frozen checkpoint features.

Does coarse-label pretraining produce linearly decodable features for
a downstream task? Extracts a chosen tap for train/test splits of a
folder dataset, fits a multinomial linear probe (ridge-regularized
least squares to one-hot targets — one device solve), reports top-1.

Mirrors the reference's coarse_grain_benefits/linear_probe experiment.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax.numpy as jnp

from visreps_tpu.core.config import Config
from visreps_tpu.core.logging import rprint
from visreps_tpu.data.loader import PrefetchLoader
from visreps_tpu.data.obj_cls import TinyImageNetDataset
from visreps_tpu.data.transforms import get_transform
from visreps_tpu.models.extractor import FeatureExtractor
from visreps_tpu.models.zoo import load_model
from visreps_tpu.ops.ridge import ridge_cv


def extract_features(state, dataset, layer: str, batch_size: int, image_size: int):
    class _WithIdx:
        def __init__(self, base):
            self.base = base

        def __len__(self):
            return len(self.base)

        def __getitem__(self, idx):
            img, label = self.base[idx]
            return img, (idx, label)

    extractor = FeatureExtractor(state, [layer.split("_")[0]], srp_k=4096,
                                 batch_size=batch_size, image_size=image_size)
    loader = PrefetchLoader(_WithIdx(dataset), batch_size=batch_size,
                            shuffle=False, num_workers=8)
    acts, metas = extractor.get_activations(loader)
    labels = np.asarray([m[1] for m in metas], np.int32)
    return acts[layer], labels


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--cfg-id", required=True)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--checkpoint-model", default="checkpoint_epoch_20.pth")
    parser.add_argument("--layer", default="fc2_post")
    parser.add_argument("--probe-dataset", required=True, help="ImageFolder-style root")
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--batch-size", type=int, default=128)
    args = parser.parse_args(argv)

    cfg = Config({
        "load_model_from": "checkpoint", "seed": args.seed, "cfg_id": args.cfg_id,
        "checkpoint_dir": args.checkpoint_dir, "checkpoint_model": args.checkpoint_model,
    })
    state = load_model(cfg)

    tfm = get_transform("imgnet", image_size=args.image_size)
    train_ds = TinyImageNetDataset(args.probe_dataset, "train", tfm)
    test_ds = TinyImageNetDataset(args.probe_dataset, "val", tfm)
    n_classes = train_ds.num_classes

    x_tr, y_tr = extract_features(state, train_ds, args.layer, args.batch_size, args.image_size)
    x_te, y_te = extract_features(state, test_ds, args.layer, args.batch_size, args.image_size)

    # Ridge to one-hot targets; argmax readout.
    one_hot = np.eye(n_classes, dtype=np.float32)[y_tr]
    model = ridge_cv(jnp.asarray(x_tr), jnp.asarray(one_hot))
    pred = np.asarray(model.predict(jnp.asarray(x_te)))
    top1 = 100.0 * float((pred.argmax(1) == y_te).mean())
    rprint(f"Linear probe ({args.layer}) top-1: {top1:.2f}% "
           f"({n_classes} classes, {len(y_tr)} train / {len(y_te)} test)", style="highlight")
    return top1


if __name__ == "__main__":
    main()
