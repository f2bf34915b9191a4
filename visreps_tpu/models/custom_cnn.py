"""CustomCNN / TinyCustomCNN — the paper's model family, in flax.

Reference parity: visreps/models/custom_model.py. Architecture
(AlexNet-blueprint 5-conv/3-fc with BatchNorm everywhere, configurable
pooling/dropout), per-layer trainability masks ('11111'/'111' strings,
frozen layers keep their BN in eval mode permanently), He init with a
N(0, 1/√fan_in) classifier head, adaptive-avg-pool 3×3 (4×4 tiny).

TPU-native differences: NHWC layout; activation taps are explicit
outputs (conv1..conv5, fc1, fc2 with _pre/_post points) selected by a
static ``capture`` tuple; frozen-parameter masking is applied by the
optimizer (train/optim.py) from :meth:`trainable_mask`.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from visreps_tpu.models.layers import (
    ConvBNReLU,
    DenseBNReLU,
    Taps,
    adaptive_avg_pool,
    avg_pool,
    head_init,
    max_pool,
)

# Tap metadata: semantic layer → extraction point names (pre/post pairs;
# the final classifier has no downstream activation → single point).
CUSTOM_CNN_TAPS = {
    **{f"conv{i}": (f"conv{i}_pre", f"conv{i}_post") for i in range(1, 6)},
    "fc1": ("fc1_pre", "fc1_post"),
    "fc2": ("fc2_pre", "fc2_post"),
    "fc3": ("fc3",),
}


class CustomCNN(nn.Module):
    """AlexNet-style CNN for 224×224 inputs (~34M params @ 1000 cls)."""

    num_classes: int = 1000
    conv_trainable: str = "11111"
    fc_trainable: str = "111"
    dropout: float = 0.5
    pooling_type: str = "max"

    TAPS = CUSTOM_CNN_TAPS

    def _pool(self, x, k=3, s=2):
        return max_pool(x, k, s) if self.pooling_type == "max" else avg_pool(x, k, s)

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Sequence[str] = ()):
        taps = Taps(capture)
        ct, ft = self.conv_trainable, self.fc_trainable
        # conv specs: (features, kernel, stride, padding, pool_after)
        specs = [
            (96, 11, 4, 2, True),
            (256, 5, 1, 2, True),
            (384, 3, 1, 1, False),
            (384, 3, 1, 1, False),
            (256, 3, 1, 1, True),
        ]
        for i, (f, k, s, p, pool) in enumerate(specs, start=1):
            frozen = i <= len(ct) and ct[i - 1] == "0"
            x = ConvBNReLU(f, k, s, p, frozen_bn=frozen, name=f"conv{i}")(
                x, train, f"conv{i}", taps
            )
            if pool:
                x = self._pool(x)

        x = adaptive_avg_pool(x, 3, 3)
        # channel-major flatten (torch NCHW view) for checkpoint import parity
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)

        for i, feats in enumerate([4096, 4096], start=1):
            frozen = i <= len(ft) and ft[i - 1] == "0"
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = DenseBNReLU(feats, frozen_bn=frozen, name=f"fc{i}")(x, train, f"fc{i}", taps)

        x = nn.Dense(self.num_classes, kernel_init=head_init, name="fc3")(x)
        taps.add("fc3", x)
        return x, taps.out

    def trainable_mask(self) -> dict:
        """{module_name: bool} trainability from the binary mask strings.

        Reference: custom_model.py:36-61 — the i-th BN freezes with the
        i-th conv/fc (here BN params live inside the same module).
        """
        mask = {}
        for i in range(1, 6):
            mask[f"conv{i}"] = i > len(self.conv_trainable) or self.conv_trainable[i - 1] == "1"
        for i in range(1, 3):
            mask[f"fc{i}"] = i > len(self.fc_trainable) or self.fc_trainable[i - 1] == "1"
        mask["fc3"] = len(self.fc_trainable) < 3 or self.fc_trainable[2] == "1"
        return mask


class TinyCustomCNN(nn.Module):
    """CNN for Tiny ImageNet (64×64 inputs). Reference: custom_model.py:93-137."""

    num_classes: int = 200
    conv_trainable: str = "11111"
    fc_trainable: str = "111"
    dropout: float = 0.3
    pooling_type: str = "max"

    TAPS = CUSTOM_CNN_TAPS

    def _pool(self, x, k=2, s=2):
        return max_pool(x, k, s) if self.pooling_type == "max" else avg_pool(x, k, s)

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Sequence[str] = ()):
        taps = Taps(capture)
        ct, ft = self.conv_trainable, self.fc_trainable
        specs = [
            (64, 5, 2, 2, True),
            (128, 3, 1, 1, False),
            (256, 3, 1, 1, True),
            (512, 3, 1, 1, False),
            (512, 3, 1, 1, False),
        ]
        for i, (f, k, s, p, pool) in enumerate(specs, start=1):
            frozen = i <= len(ct) and ct[i - 1] == "0"
            x = ConvBNReLU(f, k, s, p, frozen_bn=frozen, name=f"conv{i}")(
                x, train, f"conv{i}", taps
            )
            if pool:
                x = self._pool(x)

        x = adaptive_avg_pool(x, 4, 4)
        # channel-major flatten (torch NCHW view) for checkpoint import parity
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)

        for i in (1, 2):
            frozen = i <= len(ft) and ft[i - 1] == "0"
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = DenseBNReLU(2048, frozen_bn=frozen, name=f"fc{i}")(x, train, f"fc{i}", taps)

        x = nn.Dense(self.num_classes, kernel_init=head_init, name="fc3")(x)
        taps.add("fc3", x)
        return x, taps.out

    trainable_mask = CustomCNN.trainable_mask
