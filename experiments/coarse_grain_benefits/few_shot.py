"""k-shot classification from frozen checkpoint features.

Nearest-class-mean probe over episodes: sample k examples per class,
classify the rest by cosine distance to class prototypes.

Transfer dataset: the reference probes CIFAR-100
(reference: experiments/coarse_grain_benefits/few_shot_learning.py:53-66,
torchvision download + logistic-regression head); this build supports
the same CIFAR-100 probe from a LOCAL copy (--dataset-type cifar100;
zero-egress environments must pre-download the archive) and defaults
to TinyImageNet (--dataset-type tinyimagenet) as the in-tree
substitute when no CIFAR copy exists. The probe head also differs by
design: nearest-class-mean episodes instead of the reference's
sklearn LogisticRegression — prototype probes are deterministic,
solver-free, and run as one matmul.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from visreps_tpu.core.config import Config
from visreps_tpu.core.logging import rprint
from visreps_tpu.data.obj_cls import TinyImageNetDataset
from visreps_tpu.data.transforms import get_transform
from visreps_tpu.models.zoo import load_model
from experiments.coarse_grain_benefits.linear_probe import extract_features


class CIFAR100Probe:
    """(img, label) view over a local torchvision CIFAR-100 copy.

    Matches the reference's transfer dataset
    (few_shot_learning.py:53-66). download=False: pre-seed the root
    with cifar-100-python/ (zero-egress environments cannot fetch it).
    """

    def __init__(self, root: str, split: str, transform):
        from torchvision.datasets import CIFAR100

        self.base = CIFAR100(root, train=(split == "train"), download=False)
        self.transform = transform

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx):
        img, label = self.base[idx]
        return self.transform(img), label


def few_shot_episodes(features, labels, k_shot, n_episodes, seed=0):
    rng = np.random.RandomState(seed)
    feats = features / (np.linalg.norm(features, axis=1, keepdims=True) + 1e-8)
    classes = np.unique(labels)
    accs = []
    for _ in range(n_episodes):
        protos, test_x, test_y = [], [], []
        for c in classes:
            idx = np.where(labels == c)[0]
            if len(idx) <= k_shot:
                continue
            pick = rng.choice(idx, size=k_shot, replace=False)
            rest = np.setdiff1d(idx, pick)
            protos.append(feats[pick].mean(0))
            test_x.append(feats[rest])
            test_y.append(np.full(len(rest), len(protos) - 1))
        protos = np.stack(protos)
        test_x = np.concatenate(test_x)
        test_y = np.concatenate(test_y)
        pred = (test_x @ protos.T).argmax(1)
        accs.append(100.0 * (pred == test_y).mean())
    return float(np.mean(accs)), float(np.std(accs))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--cfg-id", required=True)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--checkpoint-model", default="checkpoint_epoch_20.pth")
    parser.add_argument("--layer", default="fc2_post")
    parser.add_argument("--probe-dataset", required=True)
    parser.add_argument("--dataset-type", choices=["tinyimagenet", "cifar100"],
                        default="tinyimagenet",
                        help="cifar100 matches the reference's transfer "
                             "dataset (local copy required)")
    parser.add_argument("--k-shot", type=int, nargs="+", default=[1, 5, 10, 20])
    parser.add_argument("--episodes", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=128)
    args = parser.parse_args(argv)

    cfg = Config({
        "load_model_from": "checkpoint", "seed": args.seed, "cfg_id": args.cfg_id,
        "checkpoint_dir": args.checkpoint_dir, "checkpoint_model": args.checkpoint_model,
    })
    state = load_model(cfg)
    tfm = get_transform("imgnet")
    if args.dataset_type == "cifar100":
        ds = CIFAR100Probe(args.probe_dataset, "test", tfm)
    else:
        ds = TinyImageNetDataset(args.probe_dataset, "val", tfm)
    feats, labels = extract_features(state, ds, args.layer, args.batch_size, 224)

    for k in args.k_shot:
        mean, std = few_shot_episodes(feats, labels, k, args.episodes)
        rprint(f"{k}-shot: {mean:.2f}% ± {std:.2f} ({args.episodes} episodes)",
               style="highlight")


if __name__ == "__main__":
    main()
