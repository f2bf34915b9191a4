"""VGG16 torch-import golden parity (completes the model-family set)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from visreps_tpu.models.torch_import import apply_torch_state_dict  # noqa: E402
from visreps_tpu.models.zoo import init_model  # noqa: E402


def _torch_vgg16(num_classes=1000):
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU(True)]
            cin = v

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)
            self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
            self.classifier = nn.Sequential(
                nn.Linear(512 * 49, 4096), nn.ReLU(True), nn.Dropout(),
                nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
                nn.Linear(4096, num_classes),
            )

        def forward(self, x):
            x = self.features(x)
            x = self.avgpool(x)
            return self.classifier(torch.flatten(x, 1))

    return M()


class TestVGG16Import:
    def test_forward_parity(self, rng):
        tm = _torch_vgg16().eval()
        state = init_model("VGG16", 1000, seed=0)
        state = apply_torch_state_dict(state, "VGG16", tm.state_dict(), 1000)

        x = rng.randn(1, 224, 224, 3).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got, _ = state.module.apply(state.variables, jnp.asarray(x), train=False, capture=())
        np.testing.assert_allclose(np.asarray(got), ref, atol=5e-3, rtol=1e-2)
