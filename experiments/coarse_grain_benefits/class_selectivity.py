"""Class-selectivity index of units across checkpoints.

Mirrors the reference's coarse_grain_benefits class-selectivity
experiment: for each unit in a tap, selectivity =
(μ_max − μ_rest) / (μ_max + μ_rest) over per-class mean activations
(Morcos et al. 2018). Reports the distribution per layer.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from experiments.coarse_grain_benefits.linear_probe import extract_features
from visreps_tpu.core.config import Config
from visreps_tpu.core.logging import rprint
from visreps_tpu.data.obj_cls import TinyImageNetDataset
from visreps_tpu.data.transforms import get_transform
from visreps_tpu.models.zoo import load_model


def class_selectivity(features: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """(n, units) × (n,) → per-unit selectivity index in [0, 1]."""
    classes = np.unique(labels)
    means = np.stack([features[labels == c].mean(axis=0) for c in classes])  # (C, U)
    mu_max = means.max(axis=0)
    mu_rest = (means.sum(axis=0) - mu_max) / max(len(classes) - 1, 1)
    denom = mu_max + mu_rest
    denom = np.where(np.abs(denom) < 1e-9, 1.0, denom)
    return np.clip((mu_max - mu_rest) / denom, 0.0, 1.0)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--cfg-id", required=True)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--checkpoint-model", default="checkpoint_epoch_20.pth")
    parser.add_argument("--layers", nargs="+", default=["conv5_post", "fc2_post"])
    parser.add_argument("--probe-dataset", required=True)
    parser.add_argument("--batch-size", type=int, default=128)
    args = parser.parse_args(argv)

    cfg = Config({
        "load_model_from": "checkpoint", "seed": args.seed, "cfg_id": args.cfg_id,
        "checkpoint_dir": args.checkpoint_dir, "checkpoint_model": args.checkpoint_model,
    })
    state = load_model(cfg)
    ds = TinyImageNetDataset(args.probe_dataset, "val", get_transform("imgnet"))

    for layer in args.layers:
        feats, labels = extract_features(state, ds, layer, args.batch_size, 224)
        sel = class_selectivity(feats, labels)
        rprint(
            f"{layer}: selectivity mean {sel.mean():.3f}, median {np.median(sel):.3f}, "
            f"frac>0.5 {float((sel > 0.5).mean()):.3f} ({feats.shape[1]} units)",
            style="highlight",
        )


if __name__ == "__main__":
    main()
