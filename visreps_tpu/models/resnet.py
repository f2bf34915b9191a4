"""ResNet-18 / ResNet-50 in flax (NHWC), torchvision-equivalent.

Reference parity: visreps/models/standard_model.py:42-80 plus the
FeatureExtractor's ResNet tap map (visreps/models/utils.py:80-101):
``conv1`` = raw stem conv output (pre-BN), ``block{i}`` = each
residual block's post-ReLU output, ``fc1`` = logits.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from visreps_tpu.models.layers import Taps, TorchBatchNorm, max_pool, xavier_uniform


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, use_bias=False, name="conv1")(x)
        y = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2, use_bias=False, name="conv2")(y)
        y = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="downsample_conv")(x)
            identity = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4 * features
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out_feats = self.features * 4
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, use_bias=False, name="conv2")(y)
        y = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_feats, (1, 1), use_bias=False, name="conv3")(y)
        y = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_feats:
            identity = nn.Conv(out_feats, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="downsample_conv")(x)
            identity = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    stage_sizes: tuple = (2, 2, 2, 2)
    block_cls: type = BasicBlock
    num_classes: int = 1000

    @property
    def TAPS(self):
        n_blocks = sum(self.stage_sizes)
        return {
            "conv1": ("conv1",),
            **{f"block{i}": (f"block{i}",) for i in range(1, n_blocks + 1)},
            "fc1": ("fc1",),
        }

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Sequence[str] = ()):
        taps = Taps(capture)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, name="conv1")(x)
        taps.add("conv1", x)  # raw conv output, pre-BN (reference tap point)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = max_pool(x, 3, 2)

        block_id = 1
        widths = (64, 128, 256, 512)
        for stage, (n, w) in enumerate(zip(self.stage_sizes, widths)):
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = self.block_cls(w, stride, name=f"layer{stage + 1}_{b}")(x, train)
                taps.add(f"block{block_id}", x)
                block_id += 1

        x = x.mean(axis=(1, 2))
        x = nn.Dense(self.num_classes, kernel_init=xavier_uniform, name="fc")(x)
        taps.add("fc1", x)
        return x, taps.out


def ResNet18(num_classes: int = 1000) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, num_classes=num_classes)


def ResNet50(num_classes: int = 1000) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, num_classes=num_classes)
