"""ImageNet-C robustness of representations via linear probes.

Mirrors the reference's coarse_grain_benefits/imagenet_c_robustness.py:
(1) extract clean features for N validation images per model, (2) fit
a logistic-regression probe on a train split, (3) corrupt the test
images with all 15 ImageNet-C corruption types at a fixed severity and
measure probe accuracy; report clean vs corrupted accuracy and
relative robustness per (model, corruption) in a CSV.

TPU redesign: corruptions run as jitted batch programs on device
(experiments/coarse_grain_benefits/corruptions.py) instead of the
CPU-per-image `imagecorruptions` loop, and feature extraction is the
framework's jitted tap extractor.

Usage:
  python experiments/coarse_grain_benefits/imagenet_c_robustness.py \
      --checkpoints "64way=ckpt_dir_a" "1000way=ckpt_dir_b" \
      --probe-dataset /path/tiny-imagenet --n-images 2000
"""
from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from experiments.coarse_grain_benefits.corruptions import CORRUPTIONS, corrupt_batch
from visreps_tpu.core.logging import rprint
from visreps_tpu.data.transforms import DS_MEAN, DS_STD
from visreps_tpu.models.extractor import FeatureExtractor
from visreps_tpu.train.checkpoint import load_checkpoint

SEED = 42


def _normalize(images_u8: np.ndarray) -> np.ndarray:
    x = images_u8.astype(np.float32) / 255.0
    return (x - np.asarray(DS_MEAN["imgnet"])) / np.asarray(DS_STD["imgnet"])


def extract_features(extractor: FeatureExtractor, layer: str,
                     images_u8: np.ndarray, batch_size: int) -> np.ndarray:
    batches = [
        (_normalize(images_u8[i:i + batch_size]),
         [str(j) for j in range(i, min(i + batch_size, len(images_u8)))])
        for i in range(0, len(images_u8), batch_size)
    ]
    feats, _ = extractor.extract_single_layer(iter(batches), layer)
    return feats


def fit_probe(train_feats, train_labels):
    from sklearn.linear_model import LogisticRegression
    from sklearn.preprocessing import StandardScaler

    scaler = StandardScaler().fit(train_feats)
    clf = LogisticRegression(max_iter=1000, solver="lbfgs", n_jobs=-1)
    clf.fit(scaler.transform(train_feats), train_labels)
    return scaler, clf


def load_images(probe_dataset: str, n_images: int, image_size: int):
    """Raw uint8 images + labels from an ImageFolder-style directory."""
    from PIL import Image

    root = Path(probe_dataset)
    classes = sorted(p.name for p in root.iterdir() if p.is_dir())
    images, labels = [], []
    per_class = max(1, n_images // max(len(classes), 1))
    for ci, cname in enumerate(classes):
        files = sorted((root / cname).rglob("*"))
        files = [f for f in files if f.suffix.lower() in (".jpeg", ".jpg", ".png")]
        for f in files[:per_class]:
            img = Image.open(f).convert("RGB").resize((image_size, image_size))
            images.append(np.asarray(img, np.uint8))
            labels.append(ci)
    return np.stack(images), np.asarray(labels)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoints", nargs="+", required=True,
                        help="name=checkpoint_path pairs (framework .pth)")
    parser.add_argument("--probe-dataset", required=True,
                        help="ImageFolder directory for probe images")
    parser.add_argument("--layer", default="fc2_post")
    parser.add_argument("--n-images", type=int, default=5000)
    parser.add_argument("--severity", type=int, default=3)
    parser.add_argument("--train-fraction", type=float, default=0.6)
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--corruptions", nargs="+", default=list(CORRUPTIONS))
    parser.add_argument("--out", default="experiments/coarse_grain_benefits/results/imagenet_c_robustness.csv")
    args = parser.parse_args(argv)

    images, labels = load_images(args.probe_dataset, args.n_images, args.image_size)
    rng = np.random.RandomState(SEED)
    perm = rng.permutation(len(images))
    split = int(args.train_fraction * len(images))
    tr_idx, te_idx = perm[:split], perm[split:]
    rprint(f"{len(images)} images: {len(tr_idx)} train / {len(te_idx)} test",
           style="info")

    trained = {}
    results = []
    for spec in args.checkpoints:
        name, _, path = spec.partition("=")
        state, _ = load_checkpoint(path)
        layer_base = args.layer.replace("_pre", "").replace("_post", "")
        ex = FeatureExtractor(state, [layer_base], batch_size=args.batch_size,
                              image_size=args.image_size)
        train_feats = extract_features(ex, args.layer, images[tr_idx], args.batch_size)
        test_feats = extract_features(ex, args.layer, images[te_idx], args.batch_size)
        scaler, clf = fit_probe(train_feats, labels[tr_idx])
        clean_acc = clf.score(scaler.transform(test_feats), labels[te_idx])
        rprint(f"  {name}: clean acc {clean_acc*100:.2f}%", style="highlight")
        trained[name] = (ex, scaler, clf, clean_acc)

    for corruption in args.corruptions:
        corrupted = corrupt_batch(corruption, images[te_idx],
                                  severity=args.severity, seed=SEED).astype(np.uint8)
        for name, (ex, scaler, clf, clean_acc) in trained.items():
            feats = extract_features(ex, args.layer, corrupted, args.batch_size)
            acc = clf.score(scaler.transform(feats), labels[te_idx])
            rel = acc / clean_acc if clean_acc > 0 else 0.0
            rprint(f"  {corruption:<18} {name}: {acc*100:.2f}% (rel {rel:.3f})",
                   style="info")
            results.append({
                "model_name": name, "layer": args.layer,
                "corruption": corruption, "severity": args.severity,
                "clean_acc": clean_acc, "corrupt_acc": acc,
                "relative_robustness": rel,
            })

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(results[0].keys()))
        writer.writeheader()
        writer.writerows(results)
    rprint(f"Saved {len(results)} rows -> {args.out}", style="success")
    return results


if __name__ == "__main__":
    main()
