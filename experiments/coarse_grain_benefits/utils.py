"""Shared helpers for the coarse-grain-benefits experiments.

Port of reference experiments/coarse_grain_benefits/utils.py:32-215 —
model-config enumeration and checkpoint loading mapped onto the
framework's zoo/checkpoint API, plus jitted single-layer feature
extraction (no torch device juggling: jit owns placement).
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

OUTPUT_DIR = str(Path(__file__).resolve().parent / "results")
DEFAULT_CHECKPOINT_MODEL = "checkpoint_epoch_20.pth"


def ensure_output_dir(path: str | None = None) -> str:
    out = path or OUTPUT_DIR
    os.makedirs(out, exist_ok=True)
    return out


def get_config_name(cfg_id, seed) -> str:
    """'cfg32a'-style name (reference utils.py:215-221)."""
    if cfg_id == "pretrained":
        return "pretrained"
    return f"cfg{cfg_id}{chr(ord('a') + seed - 1)}"


def get_model_configs(cfg_ids=None, seeds=None, include_pretrained=False):
    """(cfg_id, seed) pairs to evaluate (reference utils.py:76-104)."""
    cfg_ids = cfg_ids if cfg_ids is not None else [32, 64, 1000]
    seeds = seeds if seeds is not None else [1]
    configs = [(c, s) for c in cfg_ids for s in seeds]
    if include_pretrained:
        configs.append(("pretrained", None))
    return configs


def load_model_by_config(cfg_id, seed, checkpoint_dir=None,
                         checkpoint_model=DEFAULT_CHECKPOINT_MODEL):
    """ModelState for a (cfg_id, seed) pair or torchvision pretrained."""
    from visreps_tpu.core.config import Config
    from visreps_tpu.models.zoo import load_model

    if cfg_id == "pretrained":
        return load_model(Config({
            "load_model_from": "torchvision", "model_name": "AlexNet",
            "pretrained_dataset": "imagenet1k",
        }))
    checkpoint_dir = checkpoint_dir or os.environ.get("CHECKPOINT_DIR", "checkpoints")
    path = os.path.join(checkpoint_dir, get_config_name(cfg_id, seed),
                        checkpoint_model)
    if not os.path.exists(path):
        raise FileNotFoundError(f"Checkpoint not found: {path}")
    from visreps_tpu.train.checkpoint import load_checkpoint

    state, _ = load_checkpoint(path)
    return state


def extract_features(state, loader, layer: str = "fc2", post_relu: bool = True):
    """(N, d) f32 features of one tap over a loader of (batch, *rest).

    Reference utils.py:149-213 (per-batch hook extraction); here one
    jitted capture program per batch.
    """
    point = f"{layer}_{'post' if post_relu else 'pre'}"

    @jax.jit
    def step(variables, x):
        _, taps = state.module.apply(variables, x, train=False, capture=(point,))
        t = taps[point]
        return t.reshape(t.shape[0], -1).astype(jnp.float32)

    run = partial(step, state.variables)
    parts = []
    for batch in loader:
        x = batch[0] if isinstance(batch, (tuple, list)) else batch
        parts.append(np.asarray(run(jnp.asarray(np.asarray(x)))))
    feats = np.concatenate(parts)
    rprint(f"  extracted {layer}: {feats.shape}", style="info")
    return feats
