"""ECTiedNet: weight-tied expansion-contraction CNN, in flax.

Reference parity: visreps/models/ecnet.py — one ECBlock (1×1 expand →
dilated depthwise 3×3 → 1×1 contract, GroupNorm+SiLU, DivisiveNorm,
layer-scale residual) applied N times with a dilation schedule; the
SAME parameters are reused each call (in linen, repeated calls to one
submodule instance share parameters). BlurPool2d anti-aliased
downsampling with a fixed [1,2,1]⊗[1,2,1] binomial kernel.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from visreps_tpu.models.layers import Taps, he_normal_fan_out

ECNET_TAPS = {
    "stem": ("stem",),
    **{f"block{i}": (f"block{i}",) for i in range(1, 9)},
    "fc1": ("fc1_pre", "fc1_post"),
    "fc2": ("fc2_pre", "fc2_post"),
    "head": ("head",),
}


def gn_groups_for(channels: int, max_groups: int = 16) -> int:
    """Largest divisor of channels not exceeding max_groups."""
    for g in range(min(max_groups, channels), 0, -1):
        if channels % g == 0:
            return g
    return 1


def divisive_norm(x: jnp.ndarray, eps: float = 1e-3, kernel: int = 3) -> jnp.ndarray:
    """Local gain control: y = x / (eps + avg_pool(|x|, k))."""
    denom = nn.avg_pool(
        jnp.abs(x), (kernel, kernel), strides=(1, 1),
        padding=[(kernel // 2, kernel // 2)] * 2, count_include_pad=True,
    )
    return x / (denom + eps)


def blur_pool(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """Anti-aliased downsampling: depthwise binomial low-pass, stride 2/3."""
    c = x.shape[-1]
    k1 = jnp.array([1.0, 2.0, 1.0])
    k2 = jnp.outer(k1, k1)
    k2 = k2 / k2.sum()
    kernel = jnp.tile(k2[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


class ECBlock(nn.Module):
    """Expand → dilated depthwise → contract with layer-scale residual.

    The depthwise kernel is owned directly so the same parameter runs
    with a different runtime dilation per call (reference:
    ecnet.py:86-100 uses F.conv2d with the shared dw_weight).
    """

    channels: int
    expansion: int = 6
    max_gn_groups: int = 16
    layer_scale_init: float = 1e-3

    @nn.compact
    def __call__(self, x, dilation: int = 1):
        c = self.channels
        cexp = c * self.expansion
        identity = x

        out = nn.Conv(cexp, (1, 1), use_bias=False,
                      kernel_init=he_normal_fan_out, name="conv_expand")(x)
        out = nn.GroupNorm(num_groups=gn_groups_for(cexp, self.max_gn_groups), name="gn1")(out)
        out = nn.silu(out)

        dw = self.param("dw_weight", he_normal_fan_out, (3, 3, 1, cexp))
        dw_bias = self.param("dw_bias", nn.initializers.zeros, (cexp,))
        out = jax.lax.conv_general_dilated(
            out, dw, window_strides=(1, 1), padding=[(dilation, dilation)] * 2,
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=cexp,
        ) + dw_bias
        out = divisive_norm(out)

        out = nn.Conv(c, (1, 1), use_bias=False,
                      kernel_init=he_normal_fan_out, name="conv_contract")(out)
        out = nn.GroupNorm(num_groups=gn_groups_for(c, self.max_gn_groups), name="gn2")(out)

        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init), (1,))
        return identity + gamma * out


class ECTiedNet(nn.Module):
    """Stem → N weight-tied ECBlock calls (dilation schedule, one mid
    BlurPool) → GAP → 4096×4096 MLP → classifier."""

    num_classes: int = 1000
    channels: int = 192
    expansion: int = 1
    n_iters: int = 4
    dilations: tuple = (1, 1, 2, 1, 2, 3)
    mid_blurpool: bool = True
    max_gn_groups: int = 16
    dropout: float = 0.3

    TAPS = ECNET_TAPS

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Sequence[str] = ()):
        taps = Taps(capture)
        c = self.channels
        x = nn.Conv(c, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, kernel_init=he_normal_fan_out, name="stem")(x)
        x = nn.GroupNorm(num_groups=gn_groups_for(c, self.max_gn_groups), name="stem_gn")(x)
        x = blur_pool(x, 2)
        taps.add("stem", x)

        block = ECBlock(c, self.expansion, self.max_gn_groups, name="block")
        for t in range(self.n_iters):
            x = block(x, dilation=self.dilations[t])  # SAME weights each call
            if self.mid_blurpool and t == (self.n_iters // 2) - 1:
                x = blur_pool(x, 2)
            taps.add(f"block{t + 1}", x)

        x = x.mean(axis=(1, 2))  # GAP
        for i in (1, 2):
            x = nn.Dense(4096, name=f"fc{i}")(x)
            taps.add(f"fc{i}_pre", x)
            x = nn.relu(x)
            taps.add(f"fc{i}_post", x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="head")(x)
        taps.add("head", x)
        return x, taps.out
