"""One-way torch → flax weight conversion.

Reference checkpoints and torchvision pretrained weights are torch
state dicts (the reference even pickles whole nn.Modules,
visreps/models/utils.py:434-438). This module maps those tensors onto
our flax parameter trees:

  * Conv (O,I,H,W) → (H,W,I,O); Linear (O,I) → (I,O).
  * BatchNorm weight/bias → params.scale/bias; running stats →
    batch_stats mean/var.
  * Linears that follow a spatial flatten keep torch's channel-major
    feature order because our models transpose NHWC→NCHW before
    flattening.

torchvision weight FILES are looked up under $TORCH_WEIGHTS_DIR or
~/.cache/torch/hub/checkpoints (no network fetch in this environment);
absence degrades to the randomly-initialized model with a warning.
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from visreps_tpu.core.logging import rprint

# torchvision release filenames for IMAGENET1K weights
_WEIGHT_FILES = {
    "AlexNet": "alexnet-owt-7be5be79.pth",
    "VGG16": "vgg16-397923af.pth",
    "ResNet18": "resnet18-f37072fd.pth",
    "ResNet50": "resnet50-11ad3fa6.pth",  # IMAGENET1K_V2
    "ViTBase": "vit_b_16-c867db91.pth",
}


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _lin(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _set(tree: dict, path: tuple, value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _bn(params, stats, flax_path, sd, torch_prefix):
    _set(params, flax_path + ("scale",), _np(sd[f"{torch_prefix}.weight"]))
    _set(params, flax_path + ("bias",), _np(sd[f"{torch_prefix}.bias"]))
    _set(stats, flax_path + ("mean",), _np(sd[f"{torch_prefix}.running_mean"]))
    _set(stats, flax_path + ("var",), _np(sd[f"{torch_prefix}.running_var"]))


def _conv_layer(params, flax_path, sd, torch_prefix, bias=True):
    _set(params, flax_path + ("kernel",), _conv(_np(sd[f"{torch_prefix}.weight"])))
    if bias and f"{torch_prefix}.bias" in sd:
        _set(params, flax_path + ("bias",), _np(sd[f"{torch_prefix}.bias"]))


def _lin_layer(params, flax_path, sd, torch_prefix):
    _set(params, flax_path + ("kernel",), _lin(_np(sd[f"{torch_prefix}.weight"])))
    if f"{torch_prefix}.bias" in sd:
        _set(params, flax_path + ("bias",), _np(sd[f"{torch_prefix}.bias"]))


# ── per-family state-dict → flax tree converters ──────────────────


def convert_alexnet(sd, num_classes=1000):
    params, stats = {}, {}
    conv_idx = [0, 3, 6, 8, 10]
    for i, idx in enumerate(conv_idx, start=1):
        _conv_layer(params, (f"conv{i}",), sd, f"features.{idx}")
    for i, idx in zip((1, 2, 3), (1, 4, 6)):
        if i == 3 and _np(sd[f"classifier.{idx}.weight"]).shape[0] != num_classes:
            continue  # head replaced — keep fresh init
        _lin_layer(params, (f"fc{i}",), sd, f"classifier.{idx}")
    return params, stats


def convert_vgg16(sd, num_classes=1000):
    params, stats = {}, {}
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, idx in enumerate(conv_idx, start=1):
        _conv_layer(params, (f"conv{i}",), sd, f"features.{idx}")
    for i, idx in zip((1, 2, 3), (0, 3, 6)):
        if i == 3 and _np(sd[f"classifier.{idx}.weight"]).shape[0] != num_classes:
            continue
        _lin_layer(params, (f"fc{i}",), sd, f"classifier.{idx}")
    return params, stats


def convert_resnet(sd, stage_sizes, num_classes=1000):
    params, stats = {}, {}
    _conv_layer(params, ("conv1",), sd, "conv1", bias=False)
    _bn(params, stats, ("bn1",), sd, "bn1")
    for stage, n in enumerate(stage_sizes, start=1):
        for b in range(n):
            t = f"layer{stage}.{b}"
            f = f"layer{stage}_{b}"
            for conv_name in ("conv1", "conv2", "conv3"):
                if f"{t}.{conv_name}.weight" in sd:
                    _conv_layer(params, (f, conv_name), sd, f"{t}.{conv_name}", bias=False)
                    _bn(params, stats, (f, conv_name.replace("conv", "bn")), sd,
                        f"{t}.{conv_name.replace('conv', 'bn')}")
            if f"{t}.downsample.0.weight" in sd:
                _conv_layer(params, (f, "downsample_conv"), sd, f"{t}.downsample.0", bias=False)
                _bn(params, stats, (f, "downsample_bn"), sd, f"{t}.downsample.1")
    if _np(sd["fc.weight"]).shape[0] == num_classes:
        _lin_layer(params, ("fc",), sd, "fc")
    return params, stats


def convert_vit(sd, num_classes=1000, num_layers=12, hidden=768, heads=12):
    params, stats = {}, {}
    _conv_layer(params, ("conv_proj",), sd, "conv_proj")
    _set(params, ("cls_token",), _np(sd["class_token"]))
    _set(params, ("pos_embedding",), _np(sd["encoder.pos_embedding"]))
    hd = hidden // heads
    for i in range(num_layers):
        t = f"encoder.layers.encoder_layer_{i}"
        f = f"encoder_layer_{i}"
        for ln in ("ln_1", "ln_2"):
            _set(params, (f, ln, "scale"), _np(sd[f"{t}.{ln}.weight"]))
            _set(params, (f, ln, "bias"), _np(sd[f"{t}.{ln}.bias"]))
        w_in = _np(sd[f"{t}.self_attention.in_proj_weight"])  # (3h, h)
        b_in = _np(sd[f"{t}.self_attention.in_proj_bias"])
        for j, name in enumerate(("query", "key", "value")):
            w = w_in[j * hidden:(j + 1) * hidden].T.reshape(hidden, heads, hd)
            b = b_in[j * hidden:(j + 1) * hidden].reshape(heads, hd)
            _set(params, (f, "self_attention", name, "kernel"), w)
            _set(params, (f, "self_attention", name, "bias"), b)
        w_out = _lin(_np(sd[f"{t}.self_attention.out_proj.weight"])).reshape(heads, hd, hidden)
        _set(params, (f, "self_attention", "out", "kernel"), w_out)
        _set(params, (f, "self_attention", "out", "bias"),
             _np(sd[f"{t}.self_attention.out_proj.bias"]))
        for flax_name, torch_name in (("mlp_0", "mlp.0"), ("mlp_3", "mlp.3")):
            _lin_layer(params, (f, flax_name), sd, f"{t}.{torch_name}")
    _set(params, ("ln", "scale"), _np(sd["encoder.ln.weight"]))
    _set(params, ("ln", "bias"), _np(sd["encoder.ln.bias"]))
    if _np(sd["heads.head.weight"]).shape[0] == num_classes:
        _lin_layer(params, ("head",), sd, "heads.head")
    return params, stats


def convert_custom_cnn(sd, num_classes=1000):
    """Reference CustomCNN/TinyCustomCNN state dict → flax tree.

    Sequential index map (reference custom_model.py:146-185): convs at
    features indices depend on pool placement; BNs follow each conv.
    """
    # Derive conv/bn indices by scanning keys
    params, stats = {}, {}
    conv_indices = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("features.") and k.endswith(".weight")
         and sd[k].ndim == 4}
    )
    for i, idx in enumerate(conv_indices, start=1):
        _conv_layer(params, (f"conv{i}", "conv"), sd, f"features.{idx}", bias=False)
        _bn(params, stats, (f"conv{i}", "bn"), sd, f"features.{idx + 1}")
    lin_indices = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("classifier.") and k.endswith(".weight")
         and sd[k].ndim == 2}
    )
    for i, idx in enumerate(lin_indices[:-1], start=1):
        _lin_layer(params, (f"fc{i}", "fc"), sd, f"classifier.{idx}")
        _bn(params, stats, (f"fc{i}", "bn"), sd, f"classifier.{idx + 1}")
    head_idx = lin_indices[-1]
    if _np(sd[f"classifier.{head_idx}.weight"]).shape[0] == num_classes:
        _lin_layer(params, ("fc3",), sd, f"classifier.{head_idx}")
    return params, stats


_CONVERTERS = {
    "AlexNet": convert_alexnet,
    "VGG16": convert_vgg16,
    "ResNet18": lambda sd, n=1000: convert_resnet(sd, (2, 2, 2, 2), n),
    "ResNet50": lambda sd, n=1000: convert_resnet(sd, (3, 4, 6, 3), n),
    "ViTBase": convert_vit,
    "CustomCNN": convert_custom_cnn,
    "TinyCustomCNN": convert_custom_cnn,
}


def _merge_into(template: dict, imported: dict, path=()) -> dict:
    """Overlay imported leaves onto the template tree, checking shapes."""
    out = {}
    for k, v in template.items():
        if k in imported:
            if isinstance(v, dict):
                out[k] = _merge_into(v, imported[k], path + (k,))
            else:
                got = np.asarray(imported[k])
                if got.shape != v.shape:
                    raise ValueError(
                        f"Shape mismatch at {'.'.join(path + (k,))}: "
                        f"imported {got.shape} vs model {v.shape}"
                    )
                out[k] = got.astype(np.float32)
        else:
            out[k] = v
    return out


def apply_torch_state_dict(state, model_name: str, sd: dict, num_classes: int | None = None):
    """Overlay a torch state dict onto a ModelState (returns new state)."""
    from visreps_tpu.models.zoo import ModelState

    if model_name not in _CONVERTERS:
        raise ValueError(f"No torch converter for {model_name}")
    n = num_classes or 1000
    imported_params, imported_stats = _CONVERTERS[model_name](sd, n)
    import flax

    params = flax.core.unfreeze(state.params) if hasattr(state.params, "unfreeze") else dict(state.params)
    params = _merge_into(jax_tree_to_dict(params), imported_params)
    new_stats = state.batch_stats
    if imported_stats and state.batch_stats is not None:
        stats = jax_tree_to_dict(dict(state.batch_stats))
        new_stats = _merge_into(stats, imported_stats)
    return ModelState(
        module=state.module, params=params, batch_stats=new_stats,
        input_size=state.input_size,
    )


def jax_tree_to_dict(tree):
    if isinstance(tree, dict):
        return {k: jax_tree_to_dict(v) for k, v in tree.items()}
    if hasattr(tree, "items"):
        return {k: jax_tree_to_dict(v) for k, v in tree.items()}
    return tree


def find_torch_weight_file(model_name: str) -> Path | None:
    fname = _WEIGHT_FILES.get(model_name)
    if fname is None:
        return None
    for root in (
        os.environ.get("TORCH_WEIGHTS_DIR", ""),
        os.path.expanduser("~/.cache/torch/hub/checkpoints"),
    ):
        if root and (Path(root) / fname).exists():
            return Path(root) / fname
    return None


def load_reference_checkpoint(path: str, num_classes: int | None = None,
                              model_name: str = "CustomCNN"):
    """Import a reference visreps checkpoint (whole pickled nn.Module).

    The reference pickles entire torch modules
    (visreps/models/utils.py:509-520), so unpickling needs the original
    class objects. Stub classes are registered under the reference's
    module paths (including the legacy 'visreps.models.custom_cnn'
    alias) — torch restores the module tree onto them, and the state
    dict is then converted to our flax parameters.
    """
    import sys
    import types

    import torch
    import torch.nn as nn

    def _make_stub_module(qualname: str, class_names):
        mod = types.ModuleType(qualname)
        for cname in class_names:
            mod.__dict__[cname] = type(cname, (nn.Module,), {})
        sys.modules.setdefault(qualname, mod)
        # ensure parent packages exist
        parts = qualname.split(".")
        for i in range(1, len(parts)):
            parent = ".".join(parts[:i])
            sys.modules.setdefault(parent, types.ModuleType(parent))
        return mod

    for qualname in ("visreps.models.custom_model", "visreps.models.custom_cnn",
                     "visreps.models.standard_model", "visreps.models.ecnet"):
        _make_stub_module(qualname, ["CustomCNN", "TinyCustomCNN", "BaseCNN",
                                     "ECTiedNet", "ECBlock", "DivisiveNorm", "BlurPool2d"])

    payload = torch.load(path, map_location="cpu", weights_only=False)
    torch_model = payload["model"] if isinstance(payload, dict) and "model" in payload else payload
    sd = torch_model.state_dict()

    # Infer class count from the final classifier weight
    head_keys = [k for k in sd if k.endswith(".weight") and sd[k].ndim == 2]
    n_cls = num_classes or int(sd[head_keys[-1]].shape[0])

    from visreps_tpu.models.zoo import init_model

    name = "TinyCustomCNN" if model_name.lower().startswith("tiny") else model_name
    state = init_model(name, n_cls, seed=0)
    state = apply_torch_state_dict(state, name, sd, n_cls)
    config = payload.get("config") if isinstance(payload, dict) else None
    rprint(f"  Imported reference checkpoint: {path} ({n_cls} classes)", style="success")
    return state, config


def load_pretrained_torch(state, model_name: str, num_classes: int | None = None):
    """Import IMAGENET1K torchvision weights if the file is on disk."""
    path = find_torch_weight_file(model_name)
    if path is None:
        rprint(
            f"Pretrained weights for {model_name} not found locally "
            f"(set TORCH_WEIGHTS_DIR); using random init.",
            style="warning",
        )
        return state
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    rprint(f"  Imported torchvision weights: {path.name}", style="success")
    return apply_torch_state_dict(state, model_name, sd, num_classes)
