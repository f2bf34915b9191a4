"""Golden-parity for ResNet18 and ViT-B/16 torch imports.

Builds torchvision-layout reference modules from plain torch.nn
(torchvision itself isn't installed) and checks forward equivalence of
the converted flax models — exercising residual/downsample BN stats
and the packed qkv attention conversion.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from visreps_tpu.models.torch_import import apply_torch_state_dict  # noqa: E402
from visreps_tpu.models.zoo import init_model  # noqa: E402


# ── torch ResNet18 (torchvision layout) ──────────────────────────
class TBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class TResNet18(nn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        for s, (cin, cout) in enumerate([(64, 64), (64, 128), (128, 256), (256, 512)]):
            stride = 1 if s == 0 else 2
            setattr(self, f"layer{s + 1}", nn.Sequential(
                TBasicBlock(cin, cout, stride), TBasicBlock(cout, cout, 1)
            ))
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


class TestResNet18Import:
    def test_forward_parity(self, rng):
        tm = TResNet18()
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.3)
                    m.running_var.uniform_(0.5, 2.0)
        tm.eval()
        state = init_model("ResNet18", 1000, seed=0)
        state = apply_torch_state_dict(state, "ResNet18", tm.state_dict(), 1000)

        x = rng.randn(2, 224, 224, 3).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got, _ = state.module.apply(state.variables, jnp.asarray(x), train=False, capture=())
        np.testing.assert_allclose(np.asarray(got), ref, atol=3e-3, rtol=1e-3)


# ── torch ViT-B/16 (torchvision layout) ──────────────────────────
class TEncoderLayer(nn.Module):
    def __init__(self, dim=768, heads=12, mlp=3072):
        super().__init__()
        self.ln_1 = nn.LayerNorm(dim, eps=1e-6)
        self.self_attention = nn.MultiheadAttention(dim, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential(nn.Linear(dim, mlp), nn.GELU(), nn.Dropout(0.0),
                                 nn.Linear(mlp, dim))

    def forward(self, x):
        y = self.ln_1(x)
        y, _ = self.self_attention(y, y, y, need_weights=False)
        x = x + y
        return x + self.mlp(self.ln_2(x))


class TViT(nn.Module):
    def __init__(self, num_classes=1000, layers=12, dim=768):
        super().__init__()
        self.conv_proj = nn.Conv2d(3, dim, 16, 16)
        self.class_token = nn.Parameter(torch.zeros(1, 1, dim))

        class Encoder(nn.Module):
            def __init__(self):
                super().__init__()
                self.pos_embedding = nn.Parameter(torch.randn(1, 197, dim) * 0.02)
                self.layers = nn.Sequential(
                    *[TEncoderLayer(dim) for _ in range(layers)]
                )
                self.ln = nn.LayerNorm(dim, eps=1e-6)

        self.encoder = Encoder()
        # torchvision names layers encoder.layers.encoder_layer_{i}
        for i, layer in enumerate(self.encoder.layers):
            self.encoder.layers._modules[str(i)] = layer
        self.heads = nn.Sequential()
        self.heads.add_module("head", nn.Linear(dim, num_classes))

    def forward(self, x):
        b = x.shape[0]
        x = self.conv_proj(x)  # (b, dim, 14, 14)
        x = x.flatten(2).transpose(1, 2)  # (b, 196, dim)
        x = torch.cat([self.class_token.expand(b, -1, -1), x], dim=1)
        x = x + self.encoder.pos_embedding
        x = self.encoder.layers(x)
        x = self.encoder.ln(x)
        return self.heads.head(x[:, 0])


def _rename_vit_sd(sd):
    """nn.Sequential index names → torchvision encoder_layer_{i} names."""
    out = {}
    for k, v in sd.items():
        if k.startswith("encoder.layers."):
            parts = k.split(".")
            idx = parts[2]
            rest = ".".join(parts[3:])
            rest = rest.replace("mlp.0.", "mlp.0.").replace("mlp.3.", "mlp.3.")
            out[f"encoder.layers.encoder_layer_{idx}.{rest}"] = v
        else:
            out[k] = v
    return out


class TestViTImport:
    def test_forward_parity(self, rng):
        tm = TViT(layers=12).eval()
        sd = _rename_vit_sd(tm.state_dict())
        state = init_model("ViTBase", 1000, seed=0)
        state = apply_torch_state_dict(state, "ViTBase", sd, 1000)

        x = rng.randn(2, 224, 224, 3).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got, _ = state.module.apply(state.variables, jnp.asarray(x), train=False, capture=())
        np.testing.assert_allclose(np.asarray(got), ref, atol=5e-3, rtol=1e-2)
