"""Tests for the sweep runners, scheduler, dashboard, plotters, and
coarse-label pipeline."""
import json
import sqlite3

import numpy as np
import pytest

from visreps_tpu.core.config import Config
from visreps_tpu.core.db import save_results
from visreps_tpu.runners.base_runner import ExperimentRunner, load_param_grid


class TestGridRunner:
    def test_grid_expansion(self, tmp_path):
        grid = [{"seed": [1, 2], "pca_n_classes": [4, 8], "lr": 0.001,
                 "arch": {"dropout": [0.3, 0.5]}}]
        p = tmp_path / "grid.json"
        p.write_text(json.dumps(grid))
        combos = load_param_grid(p)
        assert len(combos) == 8  # 2 x 2 x 2
        assert all(c["lr"] == 0.001 for c in combos)
        assert {c["arch.dropout"] for c in combos} == {0.3, 0.5}

    def test_multiple_groups(self, tmp_path):
        grid = [{"seed": [1, 2]}, {"seed": 3, "extra": "x"}]
        p = tmp_path / "grid.json"
        p.write_text(json.dumps(grid))
        combos = load_param_grid(p)
        assert len(combos) == 3

    def test_command_construction(self, tmp_path):
        grid = [{"seed": [1], "pca_labels": True}]
        p = tmp_path / "grid.json"
        p.write_text(json.dumps(grid))
        runner = ExperimentRunner("train", grid_path=p, config="configs/train/base.json",
                                  dry_run=True)
        cmd = runner._command(runner.combos[0])
        assert "--mode" in cmd and "train" in cmd
        assert "seed=1" in cmd and "pca_labels=true" in cmd
        assert runner.run_all() == [0]


class TestScheduler:
    def test_train_matrix_size(self):
        from visreps_tpu.runners.scheduler import TRAIN_PARAM_GRID, expand_grid, train_overrides

        combos = expand_grid(TRAIN_PARAM_GRID)
        assert len(combos) == 3 * 6 * 4  # seeds x granularities x sources
        ov = train_overrides(combos[0])
        assert ov["checkpoint_dir"].startswith("pca_")
        assert ov["log_checkpoints"] is True

    def test_slurm_script_generation(self, tmp_path):
        from visreps_tpu.runners.scheduler import generate_slurm_script

        path = generate_slurm_script("job_x", "echo hi", tmp_path, partition="tpu-v5e")
        text = path.read_text()
        assert "#SBATCH --partition=tpu-v5e" in text
        assert "echo hi" in text


def _populate_db(db_path, n_subjects=2, cfgs=(2, 4), seeds=(1,)):
    rng = np.random.RandomState(0)
    for cfg_id in cfgs:
        for seed in seeds:
            for subj in range(n_subjects):
                cfg = Config({
                    "seed": seed, "epoch": 20, "region": "V1", "subject_idx": subj,
                    "neural_dataset": "nsd", "cfg_id": cfg_id, "pca_labels": True,
                    "pca_n_classes": cfg_id, "pca_labels_folder": "pca_labels_alexnet",
                    "checkpoint_dir": "pca_alexnet", "analysis": "rsa",
                    "compare_method": "spearman", "reconstruct_from_pcs": False,
                    "pca_k": 1, "model_name": "CustomCNN",
                })
                rows = [{
                    "layer": "conv5_post", "compare_method": "spearman",
                    "score": 0.3 + 0.05 * cfg_id + 0.01 * subj,
                    "ci_low": 0.25, "ci_high": 0.45, "analysis": "rsa",
                    "layer_selection_scores": [{"layer": "conv5_post", "score": 0.4}],
                    "bootstrap_scores": list(rng.uniform(0.25, 0.45, 50)),
                }]
                save_results(rows, cfg, db_path=db_path)


class TestDashboard:
    def test_summary_and_completeness(self, tmp_path):
        from visreps_tpu import explore_results

        db = tmp_path / "results.db"
        _populate_db(db)
        s = explore_results.summary(db)
        assert s.iloc[0]["rows"] == 4  # 2 cfgs x 1 seed x 2 subjects
        comp = explore_results.completeness("nsd", "rsa", db)
        assert (comp[comp.region == "V1"].seed1 == "x").sum() == 2

    def test_sql_passthrough(self, tmp_path):
        from visreps_tpu import explore_results

        db = tmp_path / "results.db"
        _populate_db(db)
        df = explore_results.run_sql("SELECT COUNT(*) AS n FROM results", db)
        assert df.n[0] == 4

    def test_info_distinct_health_recent(self, tmp_path, capsys):
        """Reference parity sections: db info, distinct values, health
        checks, recent runs (scripts/explore_results.py:127-366)."""
        from visreps_tpu import explore_results

        db = tmp_path / "results.db"
        _populate_db(db)

        info = explore_results.db_info(db)
        assert info["tables"]["results"] == 4
        assert info["size_mb"] > 0 and info["date_range"][0]

        distinct = explore_results.distinct_values(db)
        assert distinct["neural_dataset"] == ["nsd"]
        assert set(distinct["region"]) == {"V1"}
        assert set(distinct["cfg_id"]) == {"2", "4"}

        checks = explore_results.health(db)
        assert checks["orphaned_results"] == 0
        assert checks["null_scores"] == 0
        assert checks["runs_without_bootstrap"] == 0

        recent = explore_results.recent(3, db)
        assert len(recent) == 3
        assert "created_at" in recent.columns

        # CLI 'all' renders every section without crashing
        explore_results.main(["all", "--db", str(db)])
        out = capsys.readouterr().out
        assert "HEALTH" in out and "RECENT" in out


class TestCoarseLabels:
    def test_pca_bit_labels_nested_hierarchy(self, rng):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from scripts.coarsegrain.make_pca_labels import pca_bit_labels

        feats = rng.randn(256, 32).astype(np.float32)
        eigvecs = np.linalg.qr(rng.randn(32, 6))[0]
        mean = feats.mean(0)
        l2 = pca_bit_labels(feats, eigvecs, mean, 1)
        l4 = pca_bit_labels(feats, eigvecs, mean, 2)
        # nested: the first bit of the 4-class labels equals the 2-class label
        np.testing.assert_array_equal(l4 // 2, l2)
        # median split → balanced halves
        assert abs(int((l2 == 0).sum()) - 128) <= 1

    def test_eigenvector_pipeline(self, rng, tmp_path):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from scripts.coarsegrain.compute_eigenvectors import main as eig_main
        from scripts.coarsegrain.make_pca_labels import main as label_main

        feats = (rng.randn(200, 8) @ np.diag([5, 4, 3, 2, 1, 0.5, 0.2, 0.1])).astype(np.float32)
        ids = np.asarray([f"img{i}.jpg" for i in range(200)])
        fpath = tmp_path / "features_x.npz"
        np.savez(fpath, features=feats, image_ids=ids)

        epath = tmp_path / "eig.npz"
        eig_main(["--features", str(fpath), "--out", str(epath), "--top-k", "4"])
        eig = np.load(epath)
        assert eig["eigenvalues"].shape == (4,)
        assert eig["eigenvalues"][0] >= eig["eigenvalues"][1]

        outdir = tmp_path / "labels"
        label_main(["--features", str(fpath), "--eigen", str(epath),
                    "--out-dir", str(outdir), "--max-bits", "3"])
        import pandas as pd

        df = pd.read_csv(outdir / "n_classes_8.csv")
        assert set(df.columns) == {"image", "pca_label"}
        assert df.pca_label.nunique() == 8


class TestSubjectShardCLI:
    """--procs K: subject-sharded eval fan-out (run._shard_worker_argvs)."""

    @staticmethod
    def _args(procs, mode="eval", override=(), config=None, verbose=False):
        import argparse

        return argparse.Namespace(procs=procs, mode=mode,
                                  override=list(override), config=config,
                                  verbose=verbose)

    def test_shards_round_robin_with_full_test_list(self):
        from visreps_tpu import run as run_mod

        cfg = Config({"mode": "eval", "subject_idx": [0, 1, 2, 3, 4, 5, 6, 7]})
        argvs = run_mod._shard_worker_argvs(
            self._args(3, override=["n_select=16"]), cfg)
        assert len(argvs) == 3
        for argv in argvs:
            assert argv[:4] == ["--mode", "eval", "--procs", "1"]
            ov = argv[argv.index("--override") + 1:]
            assert "n_select=16" in ov  # user overrides propagate
            # every worker pins the FULL subject list for the
            # shared-test intersection (protocol exactness)
            assert "shared_test_subjects=[0,1,2,3,4,5,6,7]" in ov
        shards = [json.loads(next(o.split("=", 1)[1] for o in argv
                                  if o.startswith("subject_idx=")))
                  for argv in argvs]
        assert sorted(s for sh in shards for s in sh) == list(range(8))
        assert all(shards[i] == list(range(8))[i::3] for i in range(3))

    def test_existing_shared_test_subjects_wins(self):
        from visreps_tpu import run as run_mod

        cfg = Config({"mode": "eval", "subject_idx": [0, 1],
                      "shared_test_subjects": [0, 1, 2, 3]})
        argvs = run_mod._shard_worker_argvs(self._args(2), cfg)
        for argv in argvs:
            assert "shared_test_subjects=[0,1,2,3]" in argv

    def test_no_shard_cases(self):
        from visreps_tpu import run as run_mod

        assert run_mod._shard_worker_argvs(
            self._args(1), Config({"subject_idx": [0, 1]})) is None
        assert run_mod._shard_worker_argvs(
            self._args(4, mode="train"), Config({"subject_idx": [0, 1]})) is None
        # single subject / THINGS-style no-subject configs fall through
        assert run_mod._shard_worker_argvs(
            self._args(4), Config({"subject_idx": [0]})) is None
        assert run_mod._shard_worker_argvs(self._args(4), Config({})) is None
        # procs capped at n_subjects
        argvs = run_mod._shard_worker_argvs(
            self._args(16), Config({"subject_idx": [0, 1, 2]}))
        assert len(argvs) == 3

    def test_main_dispatches_workers(self, monkeypatch, tmp_path):
        """main() with --procs spawns workers instead of evaluating."""
        import subprocess

        from visreps_tpu import run as run_mod

        launched = []

        class FakeProc:
            returncode = 0

            def __init__(self, cmd):
                launched.append(cmd)

            def wait(self):
                return 0

        monkeypatch.setattr(subprocess, "Popen", lambda cmd: FakeProc(cmd))
        cfgp = tmp_path / "cfg.json"
        cfgp.write_text(json.dumps({
            "mode": "eval", "neural_dataset": "nsd", "analysis": "rsa",
            "subject_idx": [0, 1, 2, 3], "region": ["early visual stream"],
            "load_model_from": "torchvision", "model_name": "AlexNet",
            "pretrained_dataset": "imagenet1k", "seed": 1,
            "return_nodes": ["fc1"],
        }))
        with pytest.raises(SystemExit) as exc:
            run_mod.main(["--mode", "eval", "--procs", "2",
                          "--config", str(cfgp)])
        assert exc.value.code == 0
        assert len(launched) == 2
        for cmd in launched:
            assert cmd[1:4] == ["-m", "visreps_tpu.run", "--mode"]
            assert "--config" in cmd
