"""Trainer smoke tests on a synthetic on-disk Tiny-ImageNet.

Covers: loss decreases on learnable data, metrics CSV written,
checkpoints saved with the reference naming scheme + config.json,
checkpoint round-trip through load_model, frozen-layer masks, PCA-label
training path.
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

from visreps_tpu.core.config import Config
from visreps_tpu.models.zoo import load_model
from visreps_tpu.train.trainer import Trainer


N_CLASSES = 4
N_PER_CLASS = 8


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """Class-colored images so a model can actually learn."""
    root = tmp_path_factory.mktemp("tinyds")
    rng = np.random.RandomState(0)
    colors = [(220, 30, 30), (30, 220, 30), (30, 30, 220), (220, 220, 30)]
    for split in ("train", "val"):
        for c in range(N_CLASSES):
            d = root / split / f"class{c:02d}"
            d.mkdir(parents=True)
            for i in range(N_PER_CLASS):
                img = np.full((64, 64, 3), colors[c], np.uint8)
                img = np.clip(img + rng.randint(-30, 30, img.shape), 0, 255).astype(np.uint8)
                Image.fromarray(img).save(d / f"img{i}.jpg")
    return str(root)


def _cfg(tiny_dataset, tmp_path, **kw):
    base = {
        "mode": "train",
        "seed": 1,
        "dataset": "tiny-imagenet",
        "dataset_path": tiny_dataset,
        "data_augment": False,
        "optimizer": "adamw",
        "learning_rate": 3e-3,
        "weight_decay": 1e-3,
        "grad_clip": 1.0,
        "lr_scheduler": "cosineannealinglr",
        "num_epochs": 3,
        "warmup_epochs": 0,
        "log_interval": 1,
        "checkpoint_interval": 3,
        "batchsize": 16,
        "num_workers": 2,
        "log_checkpoints": False,
        "checkpoint_dir": "test_ckpt",
        "use_wandb": False,
        "pca_labels": False,
        "pca_n_classes": 2,
        "model_class": "custom_model",
        "model_name": "TinyCustomCNN",
        "arch": {"conv_trainable": "11111", "fc_trainable": "111",
                 "pooling_type": "max", "dropout": 0.1},
    }
    base.update(kw)
    return Config(base)


class TestTrainer:
    def test_loss_decreases_and_metrics_logged(self, tiny_dataset, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = _cfg(tiny_dataset, tmp_path, log_checkpoints=True)
        trainer = Trainer(cfg)
        first_loss, _ = trainer.train_epoch(1)
        state = trainer.train()  # continues (epochs restart internally)
        last_loss, _ = trainer.train_epoch(99)
        assert last_loss < first_loss

        ckpt_dir = os.path.join("model_checkpoints", "test_ckpt", "cfg200a")
        assert os.path.exists(os.path.join(ckpt_dir, "config.json"))
        assert os.path.exists(os.path.join(ckpt_dir, "checkpoint_epoch_0.pth"))
        assert os.path.exists(os.path.join(ckpt_dir, "checkpoint_epoch_3.pth"))
        assert os.path.exists(os.path.join(ckpt_dir, "training_metrics.csv"))
        with open(os.path.join(ckpt_dir, "config.json")) as f:
            meta = json.load(f)
        assert meta["total_params"] > 1e6
        assert meta["dataset"] == "tiny-imagenet"

        # checkpoint round-trip through the eval-side loader
        eval_cfg = Config({
            "load_model_from": "checkpoint", "seed": 1, "cfg_id": 200,
            "checkpoint_dir": os.path.join("model_checkpoints", "test_ckpt"),
            "checkpoint_model": "checkpoint_epoch_3.pth",
        })
        restored = load_model(eval_cfg)
        import jax.numpy as jnp

        x = jnp.zeros((2, 64, 64, 3), jnp.float32)
        logits, _ = restored.apply(x, train=False, capture=())
        assert logits.shape == (2, N_CLASSES)

    def test_accuracy_improves_on_learnable_data(self, tiny_dataset, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = _cfg(tiny_dataset, tmp_path, num_epochs=4, learning_rate=2e-3)
        trainer = Trainer(cfg)
        top1_before, _ = trainer.evaluate("val")
        trainer.train()
        top1_after, _ = trainer.evaluate("val")
        assert top1_after > max(top1_before, 40.0)

    def test_frozen_layers_do_not_move(self, tiny_dataset, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = _cfg(tiny_dataset, tmp_path, num_epochs=1,
                   arch={"conv_trainable": "00111", "fc_trainable": "111",
                         "pooling_type": "max", "dropout": 0.1})
        trainer = Trainer(cfg)
        import jax

        before = jax.tree_util.tree_map(np.asarray, trainer.state.params)
        trainer.train()
        after = trainer.state.params
        np.testing.assert_array_equal(
            np.asarray(after["conv1"]["conv"]["kernel"]), before["conv1"]["conv"]["kernel"]
        )
        assert not np.array_equal(
            np.asarray(after["conv3"]["conv"]["kernel"]), before["conv3"]["conv"]["kernel"]
        )

    def test_pca_label_training(self, tiny_dataset, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        # Build PCA label CSVs mapping images to 2 classes
        import pandas as pd

        pca_dir = tmp_path / "pca_labels" / "pca_labels_test"
        pca_dir.mkdir(parents=True)
        rows = []
        for c in range(N_CLASSES):
            for i in range(N_PER_CLASS):
                rows.append({"image": f"img{i}.jpg", "pca_label": c % 2})
        # image ids are relative paths class/img.jpg -> use basename only
        pd.DataFrame(rows).drop_duplicates("image").to_csv(pca_dir / "n_classes_2.csv", index=False)

        cfg = _cfg(tiny_dataset, tmp_path, num_epochs=1, pca_labels=True,
                   pca_n_classes=2, pca_labels_folder="pca_labels_test")
        trainer = Trainer(cfg)
        assert trainer.state.module.num_classes == 2
        loss, _ = trainer.train_epoch(1)
        assert np.isfinite(loss)
