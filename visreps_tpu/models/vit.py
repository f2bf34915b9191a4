"""ViT-B/16 in flax (torchvision vit_b_16-equivalent).

Reference parity: visreps/models/standard_model.py:82-97 and the
FeatureExtractor ViT tap map (visreps/models/utils.py:103-120):
``patch_embed`` (conv_proj output), ``block{1..12}`` (encoder layer
outputs, (b, 197, 768) tokens), ``head`` (logits).

Pre-LN transformer encoder matching torchvision's EncoderBlock:
LN → MHSA → residual, LN → MLP(GELU) → residual; learned position
embeddings over 197 tokens (cls + 14×14 patches); final encoder LN.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from visreps_tpu.models.layers import Taps, xavier_uniform

VIT_TAPS = {
    "patch_embed": ("patch_embed",),
    **{f"block{i}": (f"block{i}",) for i in range(1, 13)},
    "head": ("head",),
}


class EncoderBlock(nn.Module):
    hidden_dim: int = 768
    num_heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.LayerNorm(epsilon=1e-6, name="ln_1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.hidden_dim,
            deterministic=not train,
            name="self_attention",
        )(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, name="ln_2")(x)
        y = nn.Dense(self.mlp_dim, name="mlp_0")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden_dim, name="mlp_3")(y)
        return x + y


class ViTBase(nn.Module):
    """ViT-B/16 for 224×224 inputs → 197 tokens × 768 dims."""

    num_classes: int = 1000
    patch_size: int = 16
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072

    TAPS = VIT_TAPS

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Sequence[str] = ()):
        taps = Taps(capture)
        b = x.shape[0]
        p = self.patch_size
        x = nn.Conv(self.hidden_dim, (p, p), strides=(p, p), name="conv_proj")(x)
        taps.add("patch_embed", x)
        x = x.reshape(b, -1, self.hidden_dim)  # (b, 196, 768)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.hidden_dim))
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)  # (b, 197, 768)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, x.shape[1], self.hidden_dim),
        )
        x = x + pos

        for i in range(1, self.num_layers + 1):
            x = EncoderBlock(
                self.hidden_dim, self.num_heads, self.mlp_dim, name=f"encoder_layer_{i - 1}"
            )(x, train)
            taps.add(f"block{i}", x)

        x = nn.LayerNorm(epsilon=1e-6, name="ln")(x)
        x = x[:, 0]  # cls token
        x = nn.Dense(self.num_classes, kernel_init=xavier_uniform, name="head")(x)
        taps.add("head", x)
        return x, taps.out
