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


class TestThingsDevicePath:
    """The acts_store='device' THINGS path: on-device concept averaging
    (segment-sum bulk means + scatter-add exact re-extraction) must
    match the host fetch-then-average path (reference semantics,
    visreps/models/utils.py:350-404 + analysis/rsa.py:284-305)."""

    def _things_fixture(self, rng, n_concepts=10, imgs_per_concept=3):
        stimuli, embeddings, image_ids = {}, {}, {}
        for c in range(n_concepts):
            concept = f"concept{c:02d}"
            ids = []
            for i in range(imgs_per_concept):
                sid = f"{concept}_{i}"
                stimuli[sid] = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
                ids.append(sid)
            image_ids[concept] = ids
            embeddings[concept] = rng.randn(8).astype(np.float32)
        return stimuli, {"embeddings": embeddings, "image_ids": image_ids}

    def test_extract_single_layer_mean_matches_host_average(self, rng):
        from visreps_tpu.analysis.alignment import AlignmentData
        from visreps_tpu.analysis.rsa import concept_average_exact
        from visreps_tpu.data.loader import make_stimuli_loader
        from visreps_tpu.data.transforms import get_transform
        from visreps_tpu.models.extractor import FeatureExtractor
        from visreps_tpu.models.zoo import init_model

        stimuli, targets = self._things_fixture(rng)
        dl = make_stimuli_loader(stimuli, get_transform("imgnet"), 8, 2)
        state = init_model("TinyCustomCNN", 10, seed=0)
        ex = FeatureExtractor(state, ["conv5", "fc1"], srp_k=32, batch_size=8,
                              image_size=224)

        # group_order intentionally drops one concept and reorders: the
        # dropped concept's images must land in the dump row.
        order = [f"concept{c:02d}" for c in (3, 0, 7, 5, 1, 2, 4, 6, 9)]
        groups = {c: targets["image_ids"][c] for c in order}
        means, out_order = ex.extract_single_layer_mean(dl, "fc1_pre", groups, order)
        assert out_order == order

        raw, raw_ids = ex.extract_single_layer(dl, "fc1_pre")
        data = AlignmentData(activations={}, neural=np.zeros((len(order), 1)),
                             stimulus_ids=order, concept_image_ids=groups)
        host = concept_average_exact(raw, raw_ids, data)
        np.testing.assert_allclose(np.asarray(means), host, rtol=2e-5, atol=2e-5)

    def test_prepare_concept_alignment_device_matches_host(self, rng):
        import jax.numpy as jnp

        from visreps_tpu.analysis.alignment import prepare_concept_alignment

        keys = [f"concept{c:02d}_{i}" for c in range(6) for i in range(4)]
        keys.append("orphan_img")  # belongs to no concept -> dump row
        acts_np = {f"tap{t}": rng.randn(len(keys), 16).astype(np.float32)
                   for t in range(3)}
        targets = {
            "embeddings": {f"concept{c:02d}": rng.randn(8).astype(np.float32)
                           for c in range(6)},
            "image_ids": {f"concept{c:02d}": [f"concept{c:02d}_{i}" for i in range(4)]
                          for c in range(6)},
        }
        host = prepare_concept_alignment({}, acts_np, targets, keys)
        dev = prepare_concept_alignment(
            {}, {k: jnp.asarray(v) for k, v in acts_np.items()}, targets, keys)
        assert host.stimulus_ids == dev.stimulus_ids
        assert host.concept_image_ids == dev.concept_image_ids
        np.testing.assert_allclose(host.neural, dev.neural)
        for l in acts_np:
            np.testing.assert_allclose(
                np.asarray(dev.activations[l]), host.activations[l],
                rtol=1e-5, atol=1e-6)

    def test_things_e2e_device_store_matches_host(self, monkeypatch, tmp_path, rng):
        from visreps_tpu.data.loader import make_stimuli_loader
        from visreps_tpu.data.transforms import get_transform

        stimuli, targets = self._things_fixture(rng, n_concepts=12)

        def fake_loader(cfg):
            return targets, make_stimuli_loader(
                stimuli, get_transform("imgnet"), cfg["batchsize"], 2)

        monkeypatch.setattr(evals, "get_neural_loader", fake_loader)
        # Single tap: bf16 (device store) vs float32 (host store) SRP
        # scores on unstructured data can flip a near-tied argmax among
        # many taps; with one tap the two paths must agree end to end.
        # Averaging-math parity across many taps is covered by the unit
        # tests above.
        monkeypatch.setitem(evals.TORCHVISION_RETURN_NODES, "TinyCustomCNN",
                            ["fc1"])
        monkeypatch.setattr(core_db, "RESULTS_DB_PATH", tmp_path / "results.db")

        base = {
            "mode": "eval", "seed": 1, "neural_dataset": "things-behavior",
            "region": "N/A", "subject_idx": "N/A", "analysis": "rsa",
            "compare_method": "spearman", "bootstrap": True, "n_bootstrap": 8,
            "batchsize": 8, "num_workers": 2, "load_model_from": "torchvision",
            "model_name": "TinyCustomCNN", "pretrained_dataset": "none",
            "extract_pre_and_post": False, "srp_k": 64, "log_expdata": False,
        }
        res_host = evals.eval(Config(dict(base, acts_store="host")))[0]
        res_dev = evals.eval(Config(dict(base, acts_store="device")))[0]
        assert res_host["layer"] == res_dev["layer"]
        # The test score comes from the exact re-extraction (float32
        # forward on both paths; device path averages on device).
        assert abs(res_host["score"] - res_dev["score"]) < 5e-4
        assert abs(res_host["ci_low"] - res_dev["ci_low"]) < 5e-3
        assert abs(res_host["ci_high"] - res_dev["ci_high"]) < 5e-3
