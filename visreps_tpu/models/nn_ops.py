"""Factory helpers for normalization / nonlinearity / pooling / init.

Reference parity: visreps/models/nn_ops.py:5-125 (factories are part
of the public surface even though current models mostly hard-code
their choices).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from visreps_tpu.models.layers import TorchBatchNorm, avg_pool, max_pool


def get_normalization(norm_type: str, features: int, train: bool = True):
    """Return a norm module constructor by name."""
    norm_type = (norm_type or "none").lower()
    if norm_type in ("batch", "batchnorm"):
        return TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)
    if norm_type in ("instance", "instancenorm"):
        return nn.GroupNorm(num_groups=features)
    if norm_type in ("layer", "layernorm"):
        return nn.LayerNorm()
    if norm_type == "none":
        return lambda x: x
    raise ValueError(f"Unknown normalization: {norm_type}")


def get_nonlinearity(name: str):
    name = (name or "relu").lower()
    fns = {
        "relu": nn.relu,
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "elu": nn.elu,
        "silu": nn.silu,
        "gelu": nn.gelu,
        "none": lambda x: x,
    }
    if name not in fns:
        raise ValueError(f"Unknown nonlinearity: {name}")
    return fns[name]


def get_pooling_fn(name: str, window: int = 3, stride: int = 2):
    name = (name or "max").lower()
    if name == "max":
        return lambda x: max_pool(x, window, stride)
    if name in ("avg", "average"):
        return lambda x: avg_pool(x, window, stride)
    if name == "adaptive":
        from visreps_tpu.models.layers import adaptive_avg_pool

        return lambda x: adaptive_avg_pool(x, 1, 1)
    raise ValueError(f"Unknown pooling: {name}")


def get_initializer(name: str):
    name = (name or "kaiming").lower()
    inits = {
        "xavier": nn.initializers.xavier_uniform(),
        "kaiming": nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        "gaussian": nn.initializers.normal(stddev=0.02),
        "uniform": nn.initializers.uniform(scale=0.02),
    }
    if name not in inits:
        raise ValueError(f"Unknown initializer: {name}")
    return inits[name]
