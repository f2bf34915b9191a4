"""Object-classification datasets (ImageNet / Tiny-ImageNet / mini) + PCA labels.

Reference parity: visreps/dataloaders/obj_cls.py —
  * flat-folder ImageNet scan with folder_labels.json wnid→label map,
    deterministic filename sort, seeded (42) 80/20 train/test split of
    the train directory (torch randperm is used for the permutation so
    the split matches the reference exactly), train_fraction subsample;
  * PCADataset: labels replaced from pca_labels CSVs
    (columns image, pca_label), samples filtered to labeled ones;
  * TinyImageNet ImageFolder layout; imagenet-mini-N sibling dirs.
"""
from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from visreps_tpu.core.env import get_env_var
from visreps_tpu.core.logging import rprint
from visreps_tpu.data.loader import LabeledDataset, PrefetchLoader
from visreps_tpu.data.transforms import get_transform


def _torch_randperm(n: int, seed: int = 42) -> list[int]:
    """torch.randperm with a fixed generator — bit-exact split parity
    with the reference (obj_cls.py:157-163). Falls back to numpy if
    torch is unavailable (split then differs but stays deterministic)."""
    try:
        import torch

        g = torch.Generator().manual_seed(seed)
        return torch.randperm(n, generator=g).tolist()
    except ImportError:
        return np.random.RandomState(seed).permutation(n).tolist()


class ImageNetDataset(LabeledDataset):
    """Flat-folder ImageNet with JSON label map and seeded split."""

    def __init__(self, base_path, split="train", transform=None, train_ratio=0.8,
                 train_fraction=1.0, label_file=None):
        assert split in ["train", "test", "all"], f"Invalid split: {split}"
        label_file = label_file or os.path.join(get_env_var("IMAGENET_LOCAL_DIR"), "folder_labels.json")
        self.num_classes = 1000
        with open(label_file) as f:
            self.folder_labels = json.load(f)

        samples = []
        valid = set(self.folder_labels)
        if not os.path.isdir(base_path):
            raise FileNotFoundError(f"ImageNet base path not found: {base_path}")
        for folder in os.listdir(base_path):
            if not folder.startswith("n"):
                continue
            folder_path = os.path.join(base_path, folder)
            if not os.path.isdir(folder_path) or folder not in valid:
                continue
            label = int(self.folder_labels[folder])
            for fname in os.listdir(folder_path):
                if fname.lower().endswith((".jpeg", ".jpg")):
                    samples.append((os.path.join(folder_path, fname), label, fname))
        samples.sort(key=lambda s: s[2])
        total = len(samples)

        if split in ("train", "test") and total > 0:
            indices = _torch_randperm(total, 42)
            split_idx = int(total * train_ratio)
            keep = indices[:split_idx] if split == "train" else indices[split_idx:]
            samples = [samples[i] for i in keep]

        if split == "train" and train_fraction < 1.0 and samples:
            n_keep = max(1, int(len(samples) * train_fraction))
            idx = sorted(_torch_randperm(len(samples), 42)[:n_keep])
            samples = [samples[i] for i in idx]

        super().__init__(samples, transform)

    def get_wnid_from_label(self, label_idx: int) -> str:
        for wnid, idx in self.folder_labels.items():
            if int(idx) == label_idx:
                return wnid
        raise ValueError(f"Label index {label_idx} not found.")

    def get_wordnet_synset(self, label_idx: int):
        """NLTK Synset for a class index (reference: obj_cls.py:193-206)."""
        try:
            import nltk
            from nltk.corpus import wordnet as wn
        except ImportError:
            rprint("nltk not installed; get_wordnet_synset unavailable", style="warning")
            return None
        try:
            wn.ensure_loaded()
        except LookupError:
            nltk.download("wordnet")
            nltk.download("omw-1.4")
        wnid = self.get_wnid_from_label(label_idx)
        try:
            return wn.synset_from_pos_and_offset("n", int(wnid[1:]))
        except Exception as e:
            rprint(f"Error retrieving synset for {wnid}: {e}", style="warning")
            return None


class TinyImageNetDataset(LabeledDataset):
    """ImageFolder-style loader for Tiny ImageNet (class subdirs)."""

    def __init__(self, base_path: str, split: str, transform=None):
        folder = "train" if split == "train" else "val"
        root = os.path.join(base_path, folder)
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.classes = classes
        self.num_classes = len(classes)
        samples = []
        for label, cls in enumerate(classes):
            cls_dir = os.path.join(root, cls)
            for dirpath, _, files in sorted(os.walk(cls_dir)):
                for fname in sorted(files):
                    if fname.lower().endswith((".jpeg", ".jpg", ".png")):
                        p = os.path.join(dirpath, fname)
                        samples.append((p, label, os.path.relpath(p, root)))
        super().__init__(samples, transform)


class PCADataset(LabeledDataset):
    """Replace labels with PCA-derived ones from a CSV; filter unlabeled.

    Reference: visreps/dataloaders/obj_cls.py:49-97.
    """

    def __init__(self, base_dataset: LabeledDataset, pca_labels_path: str, num_classes: int):
        import pandas as pd

        df = pd.read_csv(pca_labels_path)
        for col in ("image", "pca_label"):
            if col not in df.columns:
                raise ValueError(f"PCA CSV must include '{col}'")
        if df["pca_label"].dtype.kind not in "iu" or df["pca_label"].min() < 0:
            raise ValueError("PCA labels must be non-negative integers")
        label_map = {os.path.basename(r["image"]): int(r["pca_label"]) for _, r in df.iterrows()}

        total = len(base_dataset.samples)
        samples = [
            (p, label_map[os.path.basename(img_id)], img_id)
            for (p, _, img_id) in base_dataset.samples
            if os.path.basename(img_id) in label_map
        ]
        kept = len(samples)
        rprint(
            f"Filtered dataset from {total} to {kept} samples with PCA labels "
            f"({100.0 * kept / max(total, 1):.1f}%)"
        )
        self.num_classes = num_classes
        super().__init__(samples, base_dataset.transform)


def wrap_with_pca(dataset, base_path, cfg, split):
    n_classes = cfg.get("pca_n_classes")
    if n_classes is None:
        raise ValueError("pca_n_classes must be specified in config when pca_labels=True")
    pca_path = os.path.join(base_path, f"n_classes_{n_classes}.csv")
    rprint(f"Applying PCA labels for {split} from {pca_path}")
    return PCADataset(dataset, pca_path, num_classes=n_classes)


def _make_loader(dataset, cfg, shuffle):
    return PrefetchLoader(
        dataset,
        batch_size=cfg.get("batchsize", 128),
        shuffle=shuffle,
        num_workers=cfg.get("num_workers", 16),
        seed=cfg.get("seed", 0),
    )


def prepare_imgnet_data(cfg, pca_labels, shuffle, preprocess, train_test_split, base_path=None):
    if base_path is None:
        base_path = cfg.get("dataset_path", get_env_var("IMAGENET_DATA_DIR"))
    datasets, loaders = {}, {}
    splits = ["train", "test"] if train_test_split else ["all"]
    info = []
    for split in splits:
        augment = cfg.get("data_augment", False) and split == "train" and shuffle and preprocess
        tfm = get_transform("imgnet", data_augment=augment, image_size=224, preprocess=preprocess)
        ds = ImageNetDataset(
            base_path, split=split, transform=tfm,
            train_fraction=cfg.get("train_fraction", 1.0),
            label_file=cfg.get("label_file"),
        )
        if pca_labels:
            ds = wrap_with_pca(ds, os.path.join("pca_labels", cfg.get("pca_labels_folder")), cfg, split)
        datasets[split] = ds
        loaders[split] = _make_loader(ds, cfg, shuffle)
        info.append(f"{split}={len(ds)}")
    rprint(f"ImageNet: {', '.join(info)}")
    return datasets, loaders


def prepare_tinyimgnet_data(cfg, pca_labels, shuffle, preprocess, train_test_split):
    base_path = cfg.get("dataset_path", get_env_var("TINY_IMAGENET_DATA_DIR"))
    datasets, loaders = {}, {}
    splits = ["train", "val"] if train_test_split else ["val"]
    info = []
    for split in splits:
        augment = cfg.get("data_augment", True) and split == "train" and shuffle and preprocess
        tfm = get_transform("tiny-imagenet", data_augment=augment, preprocess=preprocess)
        ds = TinyImageNetDataset(base_path, split, tfm)

        frac = cfg.get("train_fraction", 1.0)
        if split == "train" and frac < 1.0 and ds.samples:
            n_keep = max(1, int(len(ds.samples) * frac))
            idx = sorted(_torch_randperm(len(ds.samples), 42)[:n_keep])
            ds.samples = [ds.samples[i] for i in idx]

        if pca_labels:
            ds = wrap_with_pca(ds, os.path.join("pca_labels", cfg.get("pca_labels_folder")), cfg, split)

        key = "all" if not train_test_split and split == "val" else split
        datasets[key] = ds
        loaders[key] = _make_loader(ds, cfg, shuffle)
        info.append(f"{key}={len(ds)}")
    rprint(f"Tiny ImageNet: {', '.join(info)}")
    return datasets, loaders


def get_obj_cls_loader(cfg, shuffle=True, preprocess=True, train_test_split=True):
    """Return (datasets, loaders). Reference: obj_cls.py:394-420."""
    name = cfg.get("dataset", "tiny-imagenet")
    pca_labels = cfg.get("pca_labels", False)

    if name == "tiny-imagenet":
        return prepare_tinyimgnet_data(cfg, pca_labels, shuffle, preprocess, train_test_split)
    if name == "imagenet":
        return prepare_imgnet_data(cfg, pca_labels, shuffle, preprocess, train_test_split)
    if name.startswith("imagenet-mini-"):
        try:
            n = int(name.split("-")[-1])
        except ValueError:
            raise ValueError(f"Invalid imagenet-mini format: {name}")
        base = Path(cfg.get("dataset_path") or get_env_var("IMAGENET_DATA_DIR"))
        mini = base.parent / f"imagenet-mini-{n}"
        if not mini.exists():
            raise ValueError(f"ImageNet mini dataset not found at {mini}")
        return prepare_imgnet_data(cfg, pca_labels, shuffle, preprocess, train_test_split,
                                   base_path=str(mini))
    raise ValueError(f"Unsupported dataset: {name}")
