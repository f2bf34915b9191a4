"""Torchvision-equivalent AlexNet and VGG16 in flax (NHWC).

Reference parity: visreps/models/standard_model.py:5-40 — same
architectures as torchvision alexnet/vgg16 (so imported torch weights
drop in via models/torch_import.py), head replacement for
num_classes != 1000 with xavier-uniform init.

Tap contract mirrors the reference FeatureExtractor for Sequential
models (visreps/models/utils.py:122-134, 156-196): convN/fcN semantic
names, each expanded to _pre (raw conv/linear out) and _post
(post-ReLU); the final classifier linear has no downstream ReLU and
keeps a single un-suffixed point.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from visreps_tpu.models.layers import Taps, adaptive_avg_pool, max_pool, xavier_uniform

ALEXNET_TAPS = {
    **{f"conv{i}": (f"conv{i}_pre", f"conv{i}_post") for i in range(1, 6)},
    "fc1": ("fc1_pre", "fc1_post"),
    "fc2": ("fc2_pre", "fc2_post"),
    "fc3": ("fc3",),
}


class AlexNet(nn.Module):
    """torchvision.models.alexnet architecture (NHWC)."""

    num_classes: int = 1000
    dropout: float = 0.5

    TAPS = ALEXNET_TAPS

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Sequence[str] = ()):
        taps = Taps(capture)
        specs = [  # (features, kernel, stride, padding, pool_after)
            (64, 11, 4, 2, True),
            (192, 5, 1, 2, True),
            (384, 3, 1, 1, False),
            (256, 3, 1, 1, False),
            (256, 3, 1, 1, True),
        ]
        for i, (f, k, s, p, pool) in enumerate(specs, start=1):
            x = nn.Conv(f, (k, k), strides=(s, s), padding=[(p, p)] * 2, name=f"conv{i}")(x)
            taps.add(f"conv{i}_pre", x)
            x = nn.relu(x)
            taps.add(f"conv{i}_post", x)
            if pool:
                x = max_pool(x, 3, 2)

        x = adaptive_avg_pool(x, 6, 6)
        # channel-major flatten to match torch's NCHW view for weight import
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)

        for i in (1, 2):
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = nn.Dense(4096, name=f"fc{i}")(x)
            taps.add(f"fc{i}_pre", x)
            x = nn.relu(x)
            taps.add(f"fc{i}_post", x)
        x = nn.Dense(self.num_classes, kernel_init=xavier_uniform, name="fc3")(x)
        taps.add("fc3", x)
        return x, taps.out


# VGG16 conv plan: (out_channels per conv, pool after flags)
_VGG16_PLAN = [
    (64, False), (64, True),
    (128, False), (128, True),
    (256, False), (256, False), (256, True),
    (512, False), (512, False), (512, True),
    (512, False), (512, False), (512, True),
]

VGG16_TAPS = {
    **{f"conv{i}": (f"conv{i}_pre", f"conv{i}_post") for i in range(1, 14)},
    "fc1": ("fc1_pre", "fc1_post"),
    "fc2": ("fc2_pre", "fc2_post"),
    "fc3": ("fc3",),
}


class VGG16(nn.Module):
    """torchvision.models.vgg16 architecture (NHWC)."""

    num_classes: int = 1000
    dropout: float = 0.5

    TAPS = VGG16_TAPS

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Sequence[str] = ()):
        taps = Taps(capture)
        for i, (f, pool) in enumerate(_VGG16_PLAN, start=1):
            x = nn.Conv(f, (3, 3), padding=[(1, 1)] * 2, name=f"conv{i}")(x)
            taps.add(f"conv{i}_pre", x)
            x = nn.relu(x)
            taps.add(f"conv{i}_post", x)
            if pool:
                x = max_pool(x, 2, 2)

        x = adaptive_avg_pool(x, 7, 7)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)

        for i in (1, 2):
            x = nn.Dense(4096, name=f"fc{i}")(x)
            taps.add(f"fc{i}_pre", x)
            x = nn.relu(x)
            taps.add(f"fc{i}_post", x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, kernel_init=xavier_uniform, name="fc3")(x)
        taps.add("fc3", x)
        return x, taps.out
