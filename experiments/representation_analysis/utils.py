"""Shared utilities for the representation-analysis experiments.

Mirrors reference experiments/representation_analysis/utils.py: shared
config constants, model loading, and multi-layer pooled feature
extraction — redesigned for the TPU pipeline. Extraction is ONE jitted
program per batch computing every requested tap, with conv taps
average-pooled to `pool_size`² on device before the L2 normalize
(reference pools with nn.AdaptiveAvgPool2d on GPU, utils.py:100-160).

Model sources:
  * init_model / load_model (visreps_tpu.models.zoo) for live nets;
  * `load_feature_npz` for precomputed features, so every analysis CLI
    also runs where no weights are cached (zero-egress environments).
"""
from __future__ import annotations

import os
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp

from visreps_tpu.core.logging import rprint

DATASET = "imagenet-mini-50"
LAYER = "fc2"
ALL_LAYERS = ["conv1", "conv2", "conv3", "conv4", "conv5", "fc1", "fc2"]
MODEL_NAMES = ["Pretrained (1000-way)", "32-way Trained"]
OUTPUT_DIR = str(Path(__file__).resolve().parent)
SEED = 42


# Library home: visreps_tpu/models/pooling.py (re-exported here so the
# experiment scripts' import surface is unchanged).
from visreps_tpu.models.pooling import (  # noqa: E402,F401
    adaptive_avg_pool as _adaptive_avg_pool,
    make_pooled_extractor,
)


def extract_pooled_layers(state, loader, layers=None, pool_size: int | None = 3,
                          l2_normalize: bool = True):
    """{layer: np.ndarray (N, d)} over a loader of (batch, labels)."""
    layers = list(layers or ALL_LAYERS)
    step = make_pooled_extractor(state, layers, pool_size, l2_normalize)
    feats = {l: [] for l in layers}
    labels_all = []
    for x, y in loader:
        out = jax.device_get(step(jnp.asarray(np.asarray(x))))
        for l in layers:
            feats[l].append(out[l])
        labels_all.extend(np.asarray(y).tolist())
    return ({l: np.concatenate(v) for l, v in feats.items()},
            np.asarray(labels_all))


def load_feature_npz(path: str):
    """Load a {layer: features, 'labels': ...} npz produced elsewhere."""
    data = np.load(path, allow_pickle=True)
    feats = {k: data[k] for k in data.files if k != "labels"}
    labels = data["labels"] if "labels" in data.files else None
    return feats, labels


def ensure_output_dir(path: str | None = None) -> str:
    out = path or OUTPUT_DIR
    os.makedirs(out, exist_ok=True)
    return out


def load_labels(samples, pca_labels_path: str | None = None,
                semantic_labels_path: str | None = None):
    """(pca_labels, sem_labels, synsets, img_paths) for dataset samples.

    Reference utils.py:131-180: joins the 32-class PCA-label CSV and
    the semantic-category CSV on image filename; the synset is the
    filename prefix. Missing entries get label -1.
    """
    import csv

    def read_map(path):
        if not path or not os.path.exists(path):
            return {}
        with open(path) as f:
            return {r["image"]: int(r["pca_label"]) for r in csv.DictReader(f)}

    pca_map = read_map(pca_labels_path)
    sem_map = read_map(semantic_labels_path)
    pca_labels, sem_labels, synsets, img_paths = [], [], [], []
    for img_path, _, img_id in samples:
        pca_labels.append(pca_map.get(img_id, -1))
        sem_labels.append(sem_map.get(img_id, -1))
        synsets.append(img_id.split("_")[0])
        img_paths.append(os.path.abspath(img_path))
    return (np.asarray(pca_labels), np.asarray(sem_labels),
            np.asarray(synsets), np.asarray(img_paths))


def embed_2d(feats: np.ndarray, seed: int = SEED, metric: str = "cosine"):
    """2-D neighbor embedding: umap when installed, else sklearn t-SNE
    (this environment has no umap; the fallback keeps every figure CLI
    runnable and is noted on the axis labels via the returned name)."""
    try:
        import umap

        reducer = umap.UMAP(n_neighbors=30, min_dist=0.1, metric=metric,
                            random_state=seed, verbose=False)
        return reducer.fit_transform(feats.astype(np.float32)), "UMAP"
    except ImportError:
        from sklearn.manifold import TSNE

        perplexity = min(30, max(2, feats.shape[0] // 4))
        reducer = TSNE(n_components=2, metric=metric, random_state=seed,
                       perplexity=perplexity, init="pca")
        return reducer.fit_transform(feats.astype(np.float32)), "t-SNE"


def load_models_pair(cfg_id: int = 32, seed: int = 1, checkpoint_dir: str | None = None):
    """(pretrained 1000-way, coarse-trained) ModelStates.

    Reference utils.py:54-63; the pretrained branch needs torch AlexNet
    weights in the local cache (zero-egress gate).
    """
    from visreps_tpu.core.config import Config
    from visreps_tpu.models.zoo import load_model

    pre_cfg = Config({
        "load_model_from": "torchvision", "model_name": "AlexNet",
        "pretrained_dataset": "imagenet1k",
    })
    pretrained = load_model(pre_cfg)
    ckpt_cfg = Config({
        "load_model_from": "checkpoint", "seed": seed, "cfg_id": cfg_id,
        "checkpoint_dir": checkpoint_dir or os.environ.get("CHECKPOINT_DIR", "checkpoints"),
        "checkpoint_model": "checkpoint_epoch_20.pth",
    })
    trained = load_model(ckpt_cfg)
    rprint(f"Loaded pretrained + cfg{cfg_id}{'abc'[seed - 1]} models", style="success")
    return pretrained, trained
