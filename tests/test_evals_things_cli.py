"""THINGS-branch orchestration + run.py CLI dispatch tests."""
import json

import numpy as np
import pytest

import visreps_tpu.evals as evals
from visreps_tpu.core import db as core_db
from visreps_tpu.core.config import Config


class TestThingsBranch:
    def test_concept_level_rsa(self, monkeypatch, tmp_path, rng):
        n_concepts, imgs_per_concept, emb_dim = 12, 3, 8
        stimuli, embeddings, image_ids = {}, {}, {}
        for c in range(n_concepts):
            concept = f"concept{c:02d}"
            ids = []
            for i in range(imgs_per_concept):
                sid = f"{concept}_{i}"
                stimuli[sid] = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
                ids.append(sid)
            image_ids[concept] = ids
            embeddings[concept] = rng.randn(emb_dim).astype(np.float32)

        targets = {"embeddings": embeddings, "image_ids": image_ids}

        from visreps_tpu.data.loader import make_stimuli_loader
        from visreps_tpu.data.transforms import get_transform

        def fake_loader(cfg):
            return targets, make_stimuli_loader(stimuli, get_transform("imgnet"), cfg["batchsize"], 2)

        monkeypatch.setattr(evals, "get_neural_loader", fake_loader)
        monkeypatch.setitem(evals.TORCHVISION_RETURN_NODES, "TinyCustomCNN", ["conv5", "fc1"])
        db = tmp_path / "results.db"
        monkeypatch.setattr(core_db, "RESULTS_DB_PATH", db)

        cfg = Config({
            "mode": "eval", "seed": 1, "neural_dataset": "things-behavior",
            "region": "N/A", "subject_idx": "N/A", "analysis": "rsa",
            "compare_method": "spearman", "bootstrap": True, "n_bootstrap": 4,
            "batchsize": 8, "num_workers": 2, "load_model_from": "torchvision",
            "model_name": "TinyCustomCNN", "pretrained_dataset": "none",
            "extract_pre_and_post": True, "srp_k": 64, "log_expdata": True,
        })
        results = evals.eval(cfg)
        assert len(results) == 1
        res = results[0]
        assert res["analysis"] == "rsa"
        assert np.isfinite(res["score"])
        # 2 layers x pre/post = 4 selection entries
        assert len(res["layer_selection_scores"]) == 4

        import sqlite3

        conn = sqlite3.connect(db)
        rows = conn.execute("SELECT neural_dataset, subject_idx FROM results").fetchall()
        assert rows == [("things-behavior", "N/A")]


class TestRunCLI:
    def test_train_dispatch(self, monkeypatch, tmp_path):
        calls = {}

        class FakeTrainer:
            def __init__(self, cfg, mesh=None):
                calls["cfg"] = cfg
                calls["mesh"] = mesh

            def train(self):
                calls["trained"] = True

        import visreps_tpu.train.trainer as trainer_mod

        monkeypatch.setattr(trainer_mod, "Trainer", FakeTrainer)
        cfg_file = tmp_path / "t.json"
        cfg_file.write_text(json.dumps({
            "mode": "train", "seed": 1, "dataset": "imagenet",
            "pca_labels": False, "model_class": "standard_model",
            "standard_model": {"model_name": "AlexNet", "pretrained_dataset": "none"},
            "custom_model": {"model_name": "CustomCNN"},
        }))
        from visreps_tpu.run import main

        main(["--mode", "train", "--config", str(cfg_file),
              "--override", "batchsize=8"])
        assert calls.get("trained")
        assert calls["cfg"].batchsize == 8
        assert calls["cfg"].model_name == "AlexNet"

    def test_eval_dispatch_and_verbose(self, monkeypatch, tmp_path):
        seen = {}
        monkeypatch.setattr(evals, "eval", lambda cfg, mesh=None: seen.update(cfg=cfg, mesh=mesh))
        cfg_file = tmp_path / "e.json"
        cfg_file.write_text(json.dumps({
            "mode": "eval", "seed": 1, "neural_dataset": "nsd",
            "subject_idx": 0, "region": "V1", "analysis": "rsa",
            "compare_method": "spearman",
            "return_nodes": ["conv1"], "load_model_from": "torchvision",
            "torchvision": {"model_name": "AlexNet", "pretrained_dataset": "none"},
            "checkpoint": {"checkpoint_dir": "x", "checkpoint_model": "y"},
        }))
        from visreps_tpu.run import main

        main(["--mode", "eval", "--config", str(cfg_file), "--verbose"])
        assert seen["cfg"].verbose is True
        assert seen["cfg"].subject_idx == [0]
