"""Standalone feature-extraction CLI → .npz (offline analyses).

Reference parity: visreps/analysis/extract_representations.py:17-324 —
extract model activations for a dataset with optional SRP and optional
spatial pooling, saved as one .npz with a key per layer plus image_ids.

Usage:
  python -m visreps_tpu.analysis.extract_representations \
      --model AlexNet --dataset imagenet-mini-50 \
      --return-nodes conv5 fc1 fc2 --srp-k 4096 --out feats.npz
"""
from __future__ import annotations

import argparse

import numpy as np

from visreps_tpu.core.config import Config
from visreps_tpu.core.logging import rprint


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="AlexNet")
    parser.add_argument("--pretrained-dataset", default="none")
    parser.add_argument("--load-from", default="standard",
                        choices=["standard", "checkpoint"])
    parser.add_argument("--checkpoint-dir", default="checkpoints")
    parser.add_argument("--cfg-id", type=int, default=1)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--checkpoint-model", default="checkpoint_epoch_20.pth")
    parser.add_argument("--dataset", default="imagenet")
    parser.add_argument("--dataset-path", default=None)
    parser.add_argument("--return-nodes", nargs="+", default=["conv5", "fc1", "fc2"])
    parser.add_argument("--no-pre-post", action="store_true")
    parser.add_argument("--srp-k", type=int, default=4096, help="0 disables SRP")
    parser.add_argument("--spatial-pool", action="store_true",
                        help="global-average-pool conv taps (exact mode; "
                        "reference extract_representations.py:97-110)")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--out", default="features.npz")
    args = parser.parse_args(argv)

    from visreps_tpu.data.loader import PrefetchLoader
    from visreps_tpu.data.obj_cls import get_obj_cls_loader
    from visreps_tpu.models.extractor import FeatureExtractor
    from visreps_tpu.models.zoo import init_model

    cfg = Config({
        "dataset": args.dataset, "dataset_path": args.dataset_path,
        "batchsize": args.batch_size, "num_workers": 16,
        "pca_labels": False, "data_augment": False,
    })
    datasets, _ = get_obj_cls_loader(cfg, shuffle=False, train_test_split=False)
    ds = datasets["all"]

    class _WithIds:
        def __init__(self, base):
            self.base = base

        def __len__(self):
            return len(self.base)

        def __getitem__(self, idx):
            img, _ = self.base[idx]
            return img, self.base.samples[idx][2]

    loader = PrefetchLoader(_WithIds(ds), batch_size=args.batch_size,
                            shuffle=False, num_workers=16)

    if args.load_from == "checkpoint":
        import os

        from visreps_tpu.train.checkpoint import load_checkpoint

        seed_letter = chr(ord("a") + args.seed - 1)
        path = os.path.join(args.checkpoint_dir,
                            f"cfg{args.cfg_id}{seed_letter}",
                            args.checkpoint_model)
        state, _ = load_checkpoint(path)
    else:
        state = init_model(args.model, 1000, seed=0)
        if args.pretrained_dataset == "imagenet1k":
            from visreps_tpu.models.torch_import import load_pretrained_torch

            state = load_pretrained_torch(state, args.model, 1000)

    acts, ids = extract_representations(
        state, loader, args.return_nodes,
        pre_and_post=not args.no_pre_post, srp_k=args.srp_k,
        spatial_pool=args.spatial_pool, batch_size=args.batch_size,
    )
    np.savez(args.out, image_ids=np.asarray(ids), **acts)
    rprint(f"Saved {args.out}: {list(acts)} x {len(ids)} images", style="success")


def extract_representations(state, loader, return_nodes, pre_and_post=True,
                            srp_k=4096, spatial_pool=False, batch_size=128,
                            image_size=224):
    """(acts dict, ids) with the reference's three variants:

      * srp_k>0 — fused on-device SRP (reference's inline-SRP path,
        extract_representations.py:110-120, redesigned as MXU matmuls);
      * srp_k=0 + spatial_pool — conv taps global-mean-pooled over
        H x W before flattening (reference :97-108), one jitted pass;
      * srp_k=0 — exact flattened taps, all layers in one pass.
    """
    from visreps_tpu.models.extractor import FeatureExtractor

    if srp_k > 0:
        extractor = FeatureExtractor(
            state, return_nodes, extract_pre_and_post=pre_and_post,
            srp_k=srp_k, batch_size=batch_size, image_size=image_size,
        )
        return extractor.get_activations(loader)

    if spatial_pool:
        import jax
        import jax.numpy as jnp

        from visreps_tpu.models.pooling import make_pooled_extractor

        layers = list(return_nodes)
        step = make_pooled_extractor(state, layers, pool_size=1,
                                     l2_normalize=False)
        feats = {l: [] for l in layers}
        ids = []
        for x, keys in loader:
            host = jax.device_get(step(jnp.asarray(np.asarray(x))))
            for l in layers:
                feats[l].append(host[l])
            ids.extend(keys)
        return {l: np.concatenate(v) for l, v in feats.items()}, ids

    extractor = FeatureExtractor(
        state, return_nodes, extract_pre_and_post=pre_and_post,
        srp_k=1 << 30, batch_size=batch_size, image_size=image_size,
    )
    names = list(extractor.return_nodes)
    return extractor.extract_layers_exact(loader, names)


if __name__ == "__main__":
    main()
