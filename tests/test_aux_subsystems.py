"""Aux subsystem tests: profiling counters, device augment, resume."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visreps_tpu.core.profiling import PhaseTimer
from visreps_tpu.data.augment import augment_batch


class TestPhaseTimer:
    def test_accumulates_and_reports(self):
        t = PhaseTimer()
        with t.phase("extract", items=100):
            pass
        with t.phase("extract", items=50):
            pass
        with t.phase("rdm"):
            pass
        secs, items = t.phases["extract"]
        assert items == 150 and secs >= 0
        s = t.summary()
        assert "extract" in s and "TOTAL" in s


class TestDeviceAugment:
    def test_shapes_and_determinism(self, rng):
        x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
        key = jax.random.PRNGKey(0)
        a = augment_batch(key, x)
        b = augment_batch(key, x)
        assert a.shape == x.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = augment_batch(jax.random.PRNGKey(1), x)
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_zero_degrees_is_flip_only(self, rng):
        x = jnp.asarray(rng.rand(8, 16, 16, 3).astype(np.float32))
        out = np.asarray(augment_batch(jax.random.PRNGKey(3), x, max_degrees=0.0))
        xn = np.asarray(x)
        for i in range(8):
            same = np.allclose(out[i], xn[i], atol=1e-6)
            flipped = np.allclose(out[i], xn[i, :, ::-1], atol=1e-6)
            assert same or flipped

    def test_rotation_preserves_center_pixel(self, rng):
        x = jnp.asarray(rng.rand(2, 17, 17, 3).astype(np.float32))
        out = np.asarray(augment_batch(jax.random.PRNGKey(5), x, max_degrees=10.0))
        xn = np.asarray(x)
        for i in range(2):
            # center pixel is a fixed point of rotation (either flip state)
            assert (
                np.allclose(out[i, 8, 8], xn[i, 8, 8], atol=1e-5)
                or np.allclose(out[i, 8, 8], xn[i, 8, 8], atol=1e-5)
            )


class TestResume:
    def test_resume_continues_from_epoch(self, tmp_path, monkeypatch, rng):
        from PIL import Image

        # dataset constants inline below
        from visreps_tpu.core.config import Config
        from visreps_tpu.train.trainer import Trainer

        # tiny dataset
        root = tmp_path / "ds"
        colors = [(200, 30, 30), (30, 200, 30)]
        for split in ("train", "val"):
            for c in range(2):
                d = root / split / f"c{c}"
                d.mkdir(parents=True)
                for i in range(4):
                    img = np.full((64, 64, 3), colors[c], np.uint8)
                    Image.fromarray(img).save(d / f"i{i}.jpg")

        monkeypatch.chdir(tmp_path)
        base = {
            "mode": "train", "seed": 1, "dataset": "tiny-imagenet",
            "dataset_path": str(root), "data_augment": False,
            "optimizer": "adamw", "learning_rate": 1e-3, "weight_decay": 0.0,
            "grad_clip": 1.0, "lr_scheduler": "cosineannealinglr",
            "num_epochs": 2, "warmup_epochs": 0, "log_interval": 10,
            "checkpoint_interval": 1, "batchsize": 8, "num_workers": 1,
            "log_checkpoints": True, "checkpoint_dir": "resume_test",
            "use_wandb": False, "pca_labels": False, "model_class": "custom_model",
            "model_name": "TinyCustomCNN",
            "arch": {"conv_trainable": "11111", "fc_trainable": "111",
                     "pooling_type": "max", "dropout": 0.0},
            "save_resume_state": True,
        }
        t1 = Trainer(Config(base))
        t1.train()
        ckdir = os.path.join("model_checkpoints", "resume_test", "cfg200a")
        assert os.path.exists(os.path.join(ckdir, "resume_epoch_2.pkl"))

        cfg2 = Config({**base, "num_epochs": 3, "resume_from_epoch": 2})
        t2 = Trainer(cfg2)
        assert t2.start_epoch == 3
        t2.train()
        assert os.path.exists(os.path.join(ckdir, "checkpoint_epoch_3.pth"))


class TestWandbIntegration:
    """W&B sink smoke via an injected fake module (env has no wandb):
    init kwargs, per-epoch log payloads incl. the pca_labels top-5
    suppression, finish, and graceful degradation on init failure."""

    class _FakeWandb:
        def __init__(self):
            self.init_kwargs = None
            self.logged = []
            self.finished = False

        def init(self, **kw):
            self.init_kwargs = kw

        def log(self, payload):
            self.logged.append(payload)

        def finish(self):
            self.finished = True

    def _cfg(self, **kw):
        from visreps_tpu.core.config import Config

        base = {"use_wandb": True, "dataset": "tiny-imagenet", "seed": 1,
                "model_name": "CustomCNN", "model_class": "custom_model",
                "pca_labels": False}
        base.update(kw)
        return Config(base)

    def test_logs_and_finish(self, tmp_path, monkeypatch):
        import sys

        from visreps_tpu.core.logging import MetricsLogger

        fake = self._FakeWandb()
        monkeypatch.setitem(sys.modules, "wandb", fake)
        logger = MetricsLogger(self._cfg(), str(tmp_path))
        assert logger.use_wandb and fake.init_kwargs["group"] == "seed_1"
        logger.log_metrics(1, 2.5, {"test_acc": 0.4, "train_acc": 0.5,
                                    "test_top5": 0.7, "train_top5": 0.8})
        assert fake.logged[0]["training/test-acc"] == 0.4
        assert "training/test-top5" in fake.logged[0]
        logger.finish()
        assert fake.finished
        # CSV written alongside
        assert (tmp_path / "training_metrics.csv").exists()

    def test_pca_labels_suppresses_top5(self, tmp_path, monkeypatch):
        import sys

        from visreps_tpu.core.logging import MetricsLogger

        fake = self._FakeWandb()
        monkeypatch.setitem(sys.modules, "wandb", fake)
        logger = MetricsLogger(self._cfg(pca_labels=True), str(tmp_path))
        logger.log_metrics(1, 2.5, {"test_acc": 0.4, "test_top5": 0.7})
        assert "training/test-top5" not in fake.logged[0]

    def test_init_failure_degrades(self, tmp_path, monkeypatch):
        import sys

        from visreps_tpu.core.logging import MetricsLogger

        class Broken:
            def init(self, **kw):
                raise RuntimeError("offline")

        monkeypatch.setitem(sys.modules, "wandb", Broken())
        logger = MetricsLogger(self._cfg(), str(tmp_path))
        assert not logger.use_wandb
        logger.log_metrics(1, 1.0, {"test_acc": 0.1})  # no crash
