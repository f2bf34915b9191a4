"""Golden-parity tests: torch state dicts → flax forward equivalence.

torchvision isn't installed here, so reference modules are built from
plain torch.nn with torchvision's exact layer naming/layout. The
converted flax model must reproduce the torch forward outputs — this
pins down NHWC/NCHW kernel transposition and the channel-major flatten
before the first FC layer.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from visreps_tpu.models.torch_import import apply_torch_state_dict  # noqa: E402
from visreps_tpu.models.zoo import init_model  # noqa: E402


def _torch_alexnet(num_classes=1000):
    """torchvision.models.alexnet layout in plain torch.nn."""
    model = nn.Sequential()
    features = nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(True), nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(True), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(True),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(True),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(True), nn.MaxPool2d(3, 2),
    )
    classifier = nn.Sequential(
        nn.Dropout(), nn.Linear(256 * 6 * 6, 4096), nn.ReLU(True),
        nn.Dropout(), nn.Linear(4096, 4096), nn.ReLU(True),
        nn.Linear(4096, num_classes),
    )
    model.add_module("features", features)
    model.add_module("classifier", classifier)
    model.avgpool = nn.AdaptiveAvgPool2d((6, 6))

    def forward(x):
        x = model.features(x)
        x = model.avgpool(x)
        x = torch.flatten(x, 1)
        return model.classifier(x)

    model.fwd = forward
    return model


class TestAlexNetImport:
    def test_forward_parity(self, rng):
        tm = _torch_alexnet().eval()
        sd = tm.state_dict()
        state = init_model("AlexNet", 1000, seed=0)
        state = apply_torch_state_dict(state, "AlexNet", sd, 1000)

        x = rng.randn(2, 224, 224, 3).astype(np.float32)
        with torch.no_grad():
            ref = tm.fwd(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got, _ = state.module.apply(state.variables, jnp.asarray(x), train=False, capture=())
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=1e-3)

    def test_head_replacement_skipped(self, rng):
        tm = _torch_alexnet(1000).eval()
        state = init_model("AlexNet", 10, seed=0)
        before_head = np.asarray(state.params["fc3"]["kernel"]).copy()
        state = apply_torch_state_dict(state, "AlexNet", tm.state_dict(), 10)
        # 1000-class head doesn't fit a 10-class model → keep fresh init
        np.testing.assert_array_equal(np.asarray(state.params["fc3"]["kernel"]), before_head)
        # but the backbone was imported
        got = np.asarray(state.params["conv1"]["kernel"])
        ref = tm.state_dict()["features.0.weight"].numpy().transpose(2, 3, 1, 0)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def _torch_custom_cnn(num_classes=16):
    """Reference CustomCNN layout (custom_model.py:146-185) in plain torch."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(3, 96, 11, 4, 2, bias=False), nn.BatchNorm2d(96),
                nn.ReLU(True), nn.MaxPool2d(3, 2),
                nn.Conv2d(96, 256, 5, padding=2, bias=False), nn.BatchNorm2d(256),
                nn.ReLU(True), nn.MaxPool2d(3, 2),
                nn.Conv2d(256, 384, 3, padding=1, bias=False), nn.BatchNorm2d(384),
                nn.ReLU(True),
                nn.Conv2d(384, 384, 3, padding=1, bias=False), nn.BatchNorm2d(384),
                nn.ReLU(True),
                nn.Conv2d(384, 256, 3, padding=1, bias=False), nn.BatchNorm2d(256),
                nn.ReLU(True), nn.MaxPool2d(3, 2),
            )
            self.adaptive_pool = nn.AdaptiveAvgPool2d((3, 3))
            self.classifier = nn.Sequential(
                nn.Dropout(0.5), nn.Linear(256 * 9, 4096), nn.BatchNorm1d(4096),
                nn.ReLU(True),
                nn.Dropout(0.5), nn.Linear(4096, 4096), nn.BatchNorm1d(4096),
                nn.ReLU(True),
                nn.Linear(4096, num_classes),
            )

        def forward(self, x):
            x = self.features(x)
            x = self.adaptive_pool(x)
            x = torch.flatten(x, 1)
            return self.classifier(x)

    return M()


class TestCustomCNNImport:
    def test_forward_parity_with_running_stats(self, rng):
        tm = _torch_custom_cnn(16)
        # randomize BN running stats so eval-mode parity actually tests them
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                    m.running_mean.normal_(0, 0.5)
                    m.running_var.uniform_(0.5, 2.0)
        tm.eval()
        state = init_model("CustomCNN", 16, seed=0)
        state = apply_torch_state_dict(state, "CustomCNN", tm.state_dict(), 16)

        x = rng.randn(2, 224, 224, 3).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got, _ = state.module.apply(state.variables, jnp.asarray(x), train=False, capture=())
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=1e-3)
