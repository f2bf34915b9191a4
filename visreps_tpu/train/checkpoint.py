"""Pytree checkpoints with the reference's directory contract.

Reference parity: visreps/models/utils.py:474-520 — directory
``model_checkpoints/{dir}/cfg{K}{seed_letter}`` (seed 1→a, 2→b, 3→c),
``config.json`` sidecar with param counts, files named
``checkpoint_epoch_{e}.pth``, optimizer state deliberately NOT saved.
The payload is a numpy-ified flax pytree + model constructor config
(instead of a pickled nn.Module), so checkpoints are
framework-version-robust and loadable without the module object.

Improvement over the reference: ``save_checkpoint`` also accepts
optimizer state for true mid-training resume (reference has none —
SURVEY.md §5.4), written as a separate ``resume_epoch_{e}.pkl`` so the
eval-side format stays lean.
"""
from __future__ import annotations

import json
import os
import pickle
from pathlib import Path

import jax
import numpy as np

from visreps_tpu.core.config import get_seed_letter


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def setup_checkpoint_dir(cfg, state) -> tuple[str, dict]:
    """Create checkpoint dir + config.json. Reference: models/utils.py:474-506."""
    seed_letter = get_seed_letter(cfg.seed)
    if cfg.get("pca_labels", False):
        cfg_num = cfg.pca_n_classes
    else:
        cfg_num = 200 if cfg.get("dataset") == "tiny-imagenet" else 1000

    subdir = f"cfg{cfg_num}{seed_letter}"
    path = os.path.join("model_checkpoints", cfg.checkpoint_dir, subdir)
    os.makedirs(path, exist_ok=True)

    n_params = state.num_params()
    mask = state.module.trainable_mask() if hasattr(state.module, "trainable_mask") else {}
    trainable = 0
    for name, sub in state.params.items():
        if mask.get(name, True):
            trainable += sum(p.size for p in jax.tree_util.tree_leaves(sub))
    cfg_dict = {
        "total_params": int(n_params),
        "trainable_params": int(trainable if mask else n_params),
        **(cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)),
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=2)
    return path, cfg_dict


def _module_spec(module) -> dict:
    """Serializable constructor spec for a flax module."""
    spec = {"class": type(module).__name__}
    for f in getattr(module, "__dataclass_fields__", {}):
        if f in ("parent", "name"):
            continue
        v = getattr(module, f)
        if isinstance(v, (int, float, str, bool, tuple, list, type(None))):
            spec[f] = v
        elif isinstance(v, type):  # e.g. ResNet block_cls
            spec[f] = f"__class__:{v.__name__}"
    return spec


def _build_from_spec(spec: dict):
    from visreps_tpu.models import resnet as _resnet
    from visreps_tpu.models.zoo import MODEL_REGISTRY

    name = spec["class"]
    kwargs = {}
    for k, v in spec.items():
        if k == "class":
            continue
        if isinstance(v, str) and v.startswith("__class__:"):
            v = getattr(_resnet, v.split(":", 1)[1])
        if isinstance(v, list):
            v = tuple(v)
        kwargs[k] = v
    if name == "ResNet":
        return _resnet.ResNet(**kwargs)
    ctor = MODEL_REGISTRY.get(name)
    if ctor is None:
        raise ValueError(f"Unknown module class in checkpoint: {name}")
    return ctor(**kwargs)


def save_checkpoint(checkpoint_dir: str, epoch: int, state, metrics: dict, cfg_dict: dict,
                    opt_state=None) -> str:
    payload = {
        "epoch": epoch,
        "module_spec": _module_spec(state.module),
        "params": _to_numpy_tree(jax_unfreeze(state.params)),
        "batch_stats": _to_numpy_tree(jax_unfreeze(state.batch_stats))
        if state.batch_stats is not None else None,
        "input_size": state.input_size,
        "metrics": metrics,
        "config": cfg_dict,
    }
    path = os.path.join(checkpoint_dir, f"checkpoint_epoch_{epoch}.pth")
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    if opt_state is not None:
        with open(os.path.join(checkpoint_dir, f"resume_epoch_{epoch}.pkl"), "wb") as f:
            pickle.dump(_to_numpy_tree(opt_state), f)
    return path


def jax_unfreeze(tree):
    if tree is None:
        return None
    if hasattr(tree, "unfreeze"):
        return tree.unfreeze()
    return tree


def load_checkpoint(path: str | Path):
    """Returns (ModelState, payload_dict).

    Accepts both this framework's pytree pickles and the reference's
    torch whole-module checkpoints (zip magic 'PK') — the latter are
    converted on the fly via models/torch_import.py.
    """
    from visreps_tpu.models.zoo import ModelState

    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"PK":  # torch zipfile checkpoint from the reference
        from visreps_tpu.models.torch_import import load_reference_checkpoint

        state, config = load_reference_checkpoint(str(path))
        return state, {"config": config}

    with open(path, "rb") as f:
        payload = pickle.load(f)
    module = _build_from_spec(payload["module_spec"])
    state = ModelState(
        module=module,
        params=payload["params"],
        batch_stats=payload.get("batch_stats"),
        input_size=payload.get("input_size", 224),
    )
    return state, payload


def load_resume_state(checkpoint_dir: str, epoch: int):
    p = os.path.join(checkpoint_dir, f"resume_epoch_{epoch}.pkl")
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        return pickle.load(f)
