"""Effective dimensionality + Two-NN intrinsic dim across layers.

Mirrors the reference's representation_analysis/dimensionality
experiment: participation-ratio effective dim and Facco Two-NN ID for
every tap of a checkpoint on a stimulus folder.
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


from visreps_tpu.analysis.compute_eigenspectra import analyze_layer_pca
from visreps_tpu.analysis.compute_twonn_id import intrinsic_dim_layer
from visreps_tpu.core.config import Config
from visreps_tpu.core.logging import rprint
from visreps_tpu.data.loader import make_stimuli_loader
from visreps_tpu.data.transforms import get_transform
from visreps_tpu.models.extractor import configure_feature_extractor
from visreps_tpu.models.zoo import load_model


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--cfg-id", required=True)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--checkpoint-model", default="checkpoint_epoch_20.pth")
    parser.add_argument("--stimuli-dir", required=True)
    parser.add_argument("--return-nodes", nargs="+",
                        default=["conv1", "conv2", "conv3", "conv4", "conv5", "fc1", "fc2"])
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--out", default="dimensionality.csv")
    args = parser.parse_args(argv)

    cfg = Config({
        "load_model_from": "checkpoint", "seed": args.seed, "cfg_id": args.cfg_id,
        "checkpoint_dir": args.checkpoint_dir, "checkpoint_model": args.checkpoint_model,
        "return_nodes": args.return_nodes, "batchsize": args.batch_size,
    })
    state = load_model(cfg)
    extractor = configure_feature_extractor(cfg, state)

    stimuli = {
        os.path.splitext(f)[0]: os.path.join(args.stimuli_dir, f)
        for f in sorted(os.listdir(args.stimuli_dir))
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    }
    loader = make_stimuli_loader(stimuli, get_transform("imgnet"), args.batch_size)
    acts, _ = extractor.get_activations(loader)

    import csv

    with open(args.out, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["layer", "effective_dim", "twonn_id",
                                               "twonn_half_mean", "n"])
        writer.writeheader()
        for layer, a in acts.items():
            spec = analyze_layer_pca(a)
            idr = intrinsic_dim_layer(a)
            writer.writerow({
                "layer": layer,
                "effective_dim": round(spec["effective_dim"], 2),
                "twonn_id": round(idr["id"], 2),
                "twonn_half_mean": round(idr["id_half_mean"], 2),
                "n": idr["n_samples"],
            })
            rprint(f"{layer}: eff-dim {spec['effective_dim']:.1f}, "
                   f"Two-NN {idr['id']:.1f}", style="info")
    rprint(f"Saved {args.out}", style="success")


if __name__ == "__main__":
    main()
