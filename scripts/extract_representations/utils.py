"""Shared feature-extraction utilities for the source-model pipelines.

Reference parity: scripts/extract_representations/utils.py:14-78 —
stream the full (train_test_split=False) ImageNet through a feature
fn, save (features, image_ids) to .npz.
"""
from __future__ import annotations

import numpy as np

from visreps_tpu.core.config import Config
from visreps_tpu.core.logging import rprint
from visreps_tpu.data.obj_cls import get_obj_cls_loader


def iterate_imagenet(cfg_overrides: dict | None = None, batch_size: int = 256):
    """Yield (images (b,h,w,3) float32, image_ids) over ALL ImageNet images."""
    cfg = Config({
        "dataset": "imagenet",
        "batchsize": batch_size,
        "num_workers": 16,
        "pca_labels": False,
        "data_augment": False,
        **(cfg_overrides or {}),
    })
    datasets, _ = get_obj_cls_loader(cfg, shuffle=False, train_test_split=False)
    ds = datasets["all"]

    from visreps_tpu.data.loader import PrefetchLoader

    class _WithIds:
        def __init__(self, base):
            self.base = base

        def __len__(self):
            return len(self.base)

        def __getitem__(self, idx):
            img, _ = self.base[idx]
            return img, self.base.samples[idx][2]  # (image, img_id)

    loader = PrefetchLoader(_WithIds(ds), batch_size=batch_size, shuffle=False, num_workers=16)
    return loader, len(ds)


def extract_and_save(extract_fn, out_path: str, cfg_overrides=None, batch_size: int = 256):
    """Run extract_fn(batch)->(b, D) features over all images; save npz."""
    loader, total = iterate_imagenet(cfg_overrides, batch_size)
    feats, ids = [], []
    done = 0
    for batch, batch_ids in loader:
        feats.append(np.asarray(extract_fn(batch), np.float32))
        ids.extend(batch_ids)
        done += len(batch_ids)
        if done % (batch_size * 20) == 0:
            rprint(f"  {done}/{total} images", style="info")
    features = np.concatenate(feats, axis=0)
    np.savez(out_path, features=features, image_ids=np.asarray(ids))
    rprint(f"Saved {out_path}: {features.shape}", style="success")
    return out_path
