"""Config system + results DB tests.

Ports the reference's TestDBStorage obligations
(tests/test_encoding_score.py:1144-1244, tests/test_rsa_bootstrap.py:
1486-1610): row counts, compare_method columns, INSERT OR REPLACE
idempotency, run_id sensitivity; plus config load/override/promotion
semantics (visreps/utils.py:467-507).
"""
import json
import sqlite3

import pytest

from visreps_tpu.core.config import Config, from_dotlist, get_seed_letter, load_config
from visreps_tpu.core.db import compute_run_id, save_results
from visreps_tpu.core.validate import validate_config


@pytest.fixture
def train_cfg_file(tmp_path):
    cfg = {
        "mode": "train",
        "seed": 1,
        "dataset": "imagenet",
        "optimizer": "adamw",
        "learning_rate": 0.0005,
        "pca_labels": False,
        "pca_n_classes": 32,
        "model_class": "custom_model",
        "custom_model": {
            "model_name": "CustomCNN",
            "arch": {"conv_trainable": "11111", "fc_trainable": "111"},
        },
        "standard_model": {"model_name": "AlexNet", "pretrained_dataset": "none"},
    }
    p = tmp_path / "base.json"
    p.write_text(json.dumps(cfg))
    return p


class TestConfig:
    def test_attribute_access(self):
        c = Config({"a": 1, "b": {"c": 2}})
        assert c.a == 1 and c.b.c == 2
        assert c.get("missing", 7) == 7

    def test_dotlist_parsing(self):
        d = from_dotlist(["a=1", "b.c=true", "d=hello", "e=[1,2]", "f=0.5"])
        assert d == {"a": 1, "b": {"c": True}, "d": "hello", "e": [1, 2], "f": 0.5}

    def test_nested_promotion_train(self, train_cfg_file):
        cfg = load_config(train_cfg_file)
        assert cfg.model_name == "CustomCNN"
        assert "custom_model" not in cfg and "standard_model" not in cfg

    def test_override_switches_promoted_block(self, train_cfg_file):
        cfg = load_config(train_cfg_file, ["model_class=standard_model"])
        assert cfg.model_name == "AlexNet"
        assert cfg.pretrained_dataset == "none"

    def test_override_wins_over_promoted(self, train_cfg_file):
        cfg = load_config(train_cfg_file, ["model_name=Foo"])
        assert cfg.model_name == "Foo"

    def test_torchvision_drops_cfg_id(self, tmp_path):
        cfg = {
            "mode": "eval",
            "load_model_from": "torchvision",
            "cfg_id": 4,
            "torchvision": {"model_name": "AlexNet", "pretrained_dataset": "none"},
            "checkpoint": {"checkpoint_dir": "x", "checkpoint_model": "y"},
        }
        p = tmp_path / "eval.json"
        p.write_text(json.dumps(cfg))
        out = load_config(p)
        assert "cfg_id" not in out
        assert out.model_name == "AlexNet"
        assert "checkpoint" not in out

    def test_seed_letter(self):
        assert get_seed_letter(1) == "a"
        assert get_seed_letter(3) == "c"
        with pytest.raises(ValueError):
            get_seed_letter(0)


class TestValidate:
    def _eval_cfg(self, **kw):
        base = {
            "mode": "eval",
            "seed": 1,
            "neural_dataset": "nsd",
            "subject_idx": 0,
            "region": "V1",
            "analysis": "rsa",
            "compare_method": "spearman",
            "return_nodes": ["conv1"],
            "load_model_from": "torchvision",
            "model_name": "AlexNet",
        }
        base.update(kw)
        return Config(base)

    def test_valid_eval_normalizes_lists(self):
        cfg = validate_config(self._eval_cfg())
        assert cfg.subject_idx == [0] and cfg.region == ["V1"]

    def test_bad_seed_rejected(self):
        with pytest.raises(AssertionError):
            validate_config(self._eval_cfg(seed=4))

    def test_bad_region_rejected(self):
        with pytest.raises(AssertionError):
            validate_config(self._eval_cfg(region="V99"))

    def test_encoding_forces_pearson(self):
        cfg = validate_config(self._eval_cfg(analysis="encoding_score"))
        assert cfg.compare_method == "pearson"

    def test_encoding_rejected_for_things(self):
        with pytest.raises(AssertionError):
            validate_config(
                self._eval_cfg(analysis="encoding_score", neural_dataset="things-behavior")
            )

    def test_things_normalizes_region(self):
        cfg = validate_config(self._eval_cfg(neural_dataset="things-behavior", region="V1"))
        assert cfg.region == "N/A"

    def test_pca_n_classes_power_of_two(self):
        cfg = Config({
            "mode": "train", "dataset": "imagenet", "model_class": "standard_model",
            "pca_labels": True, "pca_n_classes": 12, "model_name": "AlexNet",
        })
        with pytest.raises(AssertionError):
            validate_config(cfg)


class TestDB:
    def _cfg(self, **kw):
        base = {
            "seed": 1, "epoch": 20, "region": "V1", "subject_idx": 0,
            "neural_dataset": "nsd", "cfg_id": 32, "pca_labels": True,
            "pca_n_classes": 32, "pca_labels_folder": "pca_labels_alexnet",
            "checkpoint_dir": "ckpt", "analysis": "rsa", "compare_method": "spearman",
            "reconstruct_from_pcs": False, "pca_k": 1, "model_name": "CustomCNN",
        }
        base.update(kw)
        return Config(base)

    def _rows(self):
        return [{
            "layer": "conv5_post", "compare_method": "spearman", "score": 0.42,
            "ci_low": 0.40, "ci_high": 0.44, "analysis": "rsa",
            "layer_selection_scores": [
                {"layer": "conv1_pre", "score": 0.1},
                {"layer": "conv5_post", "score": 0.45},
            ],
            "bootstrap_scores": [0.41, 0.42, 0.43],
        }]

    def test_run_id_deterministic_and_sensitive(self):
        a = compute_run_id(self._cfg())
        b = compute_run_id(self._cfg())
        assert a == b and len(a) == 12
        assert compute_run_id(self._cfg(seed=2)) != a
        assert compute_run_id(self._cfg(region="V2")) != a
        assert compute_run_id(self._cfg(pca_k=10)) != a

    def test_save_and_query(self, tmp_path):
        db = tmp_path / "results.db"
        save_results(self._rows(), self._cfg(), db_path=db)
        conn = sqlite3.connect(db)
        rows = conn.execute("SELECT layer, score, compare_method FROM results").fetchall()
        assert rows == [("conv5_post", 0.42, "spearman")]
        sel = conn.execute("SELECT COUNT(*) FROM layer_selection_scores").fetchone()[0]
        assert sel == 2
        bs = conn.execute("SELECT scores FROM bootstrap_distributions").fetchone()[0]
        assert json.loads(bs) == [0.41, 0.42, 0.43]
        cfg_json = conn.execute("SELECT config_json FROM run_configs").fetchone()[0]
        assert json.loads(cfg_json)["cfg_id"] == 32

    def test_insert_or_replace_idempotent(self, tmp_path):
        db = tmp_path / "results.db"
        save_results(self._rows(), self._cfg(), db_path=db)
        rows2 = self._rows()
        rows2[0]["score"] = 0.5
        save_results(rows2, self._cfg(), db_path=db)
        conn = sqlite3.connect(db)
        rows = conn.execute("SELECT score FROM results").fetchall()
        assert rows == [(0.5,)]

    def test_nan_score_skipped(self, tmp_path):
        db = tmp_path / "results.db"
        rows = self._rows()
        rows[0]["score"] = float("nan")
        save_results(rows, self._cfg(), db_path=db)
        conn = sqlite3.connect(db)
        assert conn.execute("SELECT COUNT(*) FROM results").fetchone()[0] == 0


class TestDotlistListSyntax:
    def test_unquoted_bracketed_list(self):
        """OmegaConf-style list overrides: region=[early visual stream,...]
        (the reference CLI accepts these via OmegaConf.from_dotlist)."""
        from visreps_tpu.core.config import from_dotlist

        d = from_dotlist(["region=[early visual stream,ventral visual stream]"])
        assert d["region"] == ["early visual stream", "ventral visual stream"]
        d = from_dotlist(["subject_idx=[0,1,2]"])
        assert d["subject_idx"] == [0, 1, 2]
        d = from_dotlist(["xs=[]"])
        assert d["xs"] == []
        d = from_dotlist(['js=["a","b"]'])  # valid JSON still wins
        assert d["js"] == ["a", "b"]
