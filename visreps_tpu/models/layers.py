"""Shared model building blocks (NHWC, TPU-friendly).

Activation capture design: instead of the reference's forward hooks
(visreps/models/utils.py:232-256), every model takes a static
``capture`` tuple and returns ``(logits, taps)`` where ``taps`` maps
tap names → activations. Unrequested taps are never part of the jitted
program's outputs, so XLA dead-code-eliminates their storage.
"""
from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# He-normal fan_out with ReLU gain — torch kaiming_normal_(mode="fan_out")
he_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
xavier_uniform = nn.initializers.xavier_uniform()


def head_init(key, shape, dtype=jnp.float32):
    """Final-classifier init: N(0, 1/sqrt(fan_in)).

    Reference: visreps/models/custom_model.py:79-81.
    """
    fan_in = shape[0]
    return jax.random.normal(key, shape, dtype) / math.sqrt(fan_in)


class Taps:
    """Collects requested intermediate activations during a forward pass."""

    def __init__(self, capture: Sequence[str] = ()):
        self.capture = frozenset(capture)
        self.out: dict[str, jnp.ndarray] = {}

    def add(self, name: str, value: jnp.ndarray) -> None:
        if name in self.capture:
            self.out[name] = value


def max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2) -> jnp.ndarray:
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding="VALID")


def avg_pool(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    return nn.avg_pool(x, (window, window), strides=(stride, stride), padding="VALID")


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics for NHWC (static shapes).

    Window boundaries: start = floor(i*H/out), end = ceil((i+1)*H/out).
    Unrolled over the (small) output grid; XLA fuses the slices.
    """
    _, h, w, _ = x.shape
    rows = []
    for i in range(out_h):
        h0, h1 = (i * h) // out_h, -(-(i + 1) * h // out_h)
        cols = []
        for j in range(out_w):
            w0, w1 = (j * w) // out_w, -(-(j + 1) * w // out_w)
            cols.append(x[:, h0:h1, w0:w1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (b, out_h, out_w, c)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact running-statistics semantics.

    flax.linen.BatchNorm updates the running variance with the BIASED
    batch variance; torch.nn.BatchNorm updates it with the UNBIASED one
    (var · n/(n−1)) while still normalizing with the biased variance
    (reference models train under torch BN — custom_model.py:146-185).
    The n/(n−1) gap compounds over a 20-epoch run (≈3 %/step on the
    update term for a bs-32 fc BN), silently diverging eval-mode
    trajectories; matching torch keeps one-step train parity exact
    (tests/test_train_parity.py). Variable names ('scale'/'bias',
    batch_stats 'mean'/'var') match flax.linen.BatchNorm so checkpoints
    and torch_import mappings are unchanged.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean(jnp.square(x - mean), axis=axes)  # biased (normalization)
            n = 1
            for a in axes:
                n *= x.shape[a]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * unbiased)
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return y * scale + bias


class ConvBNReLU(nn.Module):
    """Conv → BatchNorm → ReLU with pre/post taps and freezable BN.

    Mirrors the reference CustomCNN block structure
    (visreps/models/custom_model.py:146-171): conv has no bias (BN
    absorbs it); a frozen layer's BN stays in eval mode permanently
    (custom_model.py:56-68).
    """

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool, tap_name: str | None, taps: Taps):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=False,
            kernel_init=he_normal_fan_out,
            name="conv",
        )(x)
        if tap_name:
            taps.add(f"{tap_name}_pre", x)
        use_running = (not train) or self.frozen_bn
        x = TorchBatchNorm(
            use_running_average=use_running, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        x = nn.relu(x)
        if tap_name:
            taps.add(f"{tap_name}_post", x)
        return x


class DenseBNReLU(nn.Module):
    """Linear → BatchNorm1d → ReLU with pre/post taps."""

    features: int
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool, tap_name: str | None, taps: Taps):
        x = nn.Dense(self.features, kernel_init=he_normal_fan_out, name="fc")(x)
        if tap_name:
            taps.add(f"{tap_name}_pre", x)
        use_running = (not train) or self.frozen_bn
        x = TorchBatchNorm(
            use_running_average=use_running, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        x = nn.relu(x)
        if tap_name:
            taps.add(f"{tap_name}_post", x)
        return x
