"""Cross-model RDM comparison matrices over a shared stimulus set.

For each (model, layer) pair, build the Pearson RDM of its activations
on a stimulus folder, then compute the pairwise Spearman similarity of
all RDMs — the model-zoo comparison from the reference's
representation_analysis experiments (and BASELINE.json config #4).

Usage:
  python experiments/representation_analysis/rsm_comparison.py \
      --stimuli-dir /path/to/images \
      --models AlexNet ResNet18 --layers-per-model 3 --out rsm_cmp.npz
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from visreps_tpu.core.logging import rprint
from visreps_tpu.data.loader import make_stimuli_loader
from visreps_tpu.data.transforms import get_transform
from visreps_tpu.models.extractor import FeatureExtractor
from visreps_tpu.models.zoo import TORCHVISION_RETURN_NODES, init_model
from visreps_tpu.ops.rdm import compute_rdm, compute_rdm_correlation

import jax.numpy as jnp


def collect_rdms(model_name: str, stimuli: dict, batch_size: int,
                 max_layers: int | None, pretrained: str) -> dict:
    state = init_model(model_name, 1000, seed=0)
    if pretrained == "imagenet1k":
        from visreps_tpu.models.torch_import import load_pretrained_torch

        state = load_pretrained_torch(state, model_name, 1000)
    nodes = TORCHVISION_RETURN_NODES[model_name]
    if max_layers:
        step = max(1, len(nodes) // max_layers)
        nodes = nodes[::step][:max_layers]
    extractor = FeatureExtractor(state, nodes, srp_k=4096,
                                 batch_size=batch_size, image_size=224)
    loader = make_stimuli_loader(stimuli, get_transform("imgnet"), batch_size)
    acts, _ = extractor.get_activations(loader)
    return {
        f"{model_name}/{layer}": np.asarray(compute_rdm(jnp.asarray(a)))
        for layer, a in acts.items()
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--stimuli-dir", required=True)
    parser.add_argument("--models", nargs="+", default=["AlexNet", "ResNet18"])
    parser.add_argument("--pretrained", default="none", choices=["none", "imagenet1k"])
    parser.add_argument("--layers-per-model", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--compare-method", default="spearman")
    parser.add_argument("--out", default="rsm_comparison.npz")
    args = parser.parse_args(argv)

    stimuli = {
        os.path.splitext(f)[0]: os.path.join(args.stimuli_dir, f)
        for f in sorted(os.listdir(args.stimuli_dir))
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    }
    rprint(f"{len(stimuli)} stimuli", style="info")

    rdms: dict = {}
    for model in args.models:
        rprint(f"Extracting {model}...", style="setup")
        rdms.update(collect_rdms(model, stimuli, args.batch_size,
                                 args.layers_per_model, args.pretrained))

    names = list(rdms)
    sim = np.zeros((len(names), len(names)))
    for a in range(len(names)):
        for b in range(a, len(names)):
            s = compute_rdm_correlation(
                jnp.asarray(rdms[names[a]]), jnp.asarray(rdms[names[b]]),
                correlation=args.compare_method,
            )
            sim[a, b] = sim[b, a] = s
    np.savez(args.out, similarity=sim, names=np.asarray(names))
    rprint(f"Saved {args.out} ({len(names)} x {len(names)})", style="success")


if __name__ == "__main__":
    main()
