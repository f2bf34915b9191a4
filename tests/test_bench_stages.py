"""Smoke tests for the benchmark stages (tiny sizes, CPU)."""
import numpy as np
import pytest

from visreps_tpu.benchmarks import stages


class TestStages:
    def test_rdm_stage(self):
        out = stages.stage_rdm(n=64, d=32)
        assert out["rdm_ms"] > 0

    def test_bootstrap_stage(self):
        out = stages.stage_bootstrap(n=40, n_bootstrap=8, chunk=4)
        assert out["bootstraps_per_sec"] > 0

    def test_selection_stage(self):
        out = stages.stage_selection(n_sel=30, k=16, n_taps=2)
        assert out["selection_s"] > 0

    def test_ridge_stage(self):
        out = stages.stage_ridge(n=60, d=8, v=4)
        assert out["ridge_cv_s"] > 0

    def test_rdm_stage_reports_roofline(self):
        """VERDICT r4 item 7: kernel stages carry achieved-TFLOP/s and
        %-of-v5e-bf16-peak fields."""
        out = stages.stage_rdm(n=64, d=32)
        assert "rdm_tflops" in out and "rdm_mfu" in out
        assert 0 <= out["rdm_mfu"] <= 1

    def test_train_stage_reports_roofline_and_bf16_runs(self):
        out = stages.stage_train(batch_size=2, iters=1)
        assert out["compute_dtype"] == "f32"
        assert "train_step_mfu" in out  # cost_analysis available on CPU
        out16 = stages.stage_train(batch_size=2, iters=1, compute_dtype="bf16")
        assert out16["compute_dtype"] == "bf16"
        assert np.isfinite(out16["train_images_per_sec"])

    def test_bf16_train_step_keeps_f32_master_state(self):
        """bf16 compute must not leak into params / BN running stats
        (donated buffers must keep their dtype across steps)."""
        import jax
        import jax.numpy as jnp

        from visreps_tpu.core.config import Config
        from visreps_tpu.models.zoo import init_model
        from visreps_tpu.train.optim import setup_optimizer
        from visreps_tpu.train.trainer import make_train_step

        cfg = Config({"optimizer": "adamw", "learning_rate": 1e-3,
                      "weight_decay": 1e-3, "grad_clip": 1.0,
                      "lr_scheduler": "cosineannealinglr",
                      "num_epochs": 2, "warmup_epochs": 1})
        state = init_model("TinyCustomCNN", 8, seed=0, input_size=64)
        tx, _ = setup_optimizer(state.params, cfg, steps_per_epoch=2)
        step = make_train_step(state.module, tx, compute_dtype="bf16")
        opt = tx.init(state.params)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
        y = jnp.arange(4) % 8
        params, stats = state.params, state.batch_stats
        for _ in range(2):  # second step re-donates: dtypes must hold
            params, stats, opt, loss, gn = step(
                params, stats, opt, x, y, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss)) and np.isfinite(float(gn))
        for leaf in jax.tree_util.tree_leaves(params):
            assert leaf.dtype != jnp.bfloat16
        for leaf in jax.tree_util.tree_leaves(stats):
            assert leaf.dtype == jnp.float32

    def test_extract_stage_small(self):
        out = stages.stage_extract(
            batch_size=2, iters=1, model="TinyCustomCNN", srp_k=64,
            image_size=64, return_nodes=("conv5", "fc1"),
        )
        assert out["images_per_sec"] > 0

    def test_extract_bf16_consistency(self, rng):
        """bf16 extraction stays close to f32 (JL noise dominates)."""
        import jax.numpy as jnp

        from visreps_tpu.models.extractor import FeatureExtractor
        from visreps_tpu.models.zoo import init_model

        state = init_model("TinyCustomCNN", 8, seed=0)
        kw = dict(return_nodes=["conv5", "fc1"], srp_k=64, batch_size=2, image_size=64)
        ex32 = FeatureExtractor(state, **kw)
        ex16 = FeatureExtractor(state, compute_dtype="bf16", **kw)
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        o32 = ex32._srp_step(state.variables, ex32._proj_dict(), x)
        o16 = ex16._srp_step(state.variables, ex16._proj_dict(), x)
        for k in o32:
            a, b = np.asarray(o32[k]), np.asarray(o16[k])
            denom = np.abs(a).mean() + 1e-6
            assert np.abs(a - b).mean() / denom < 0.1


class TestMeasuredE2E:
    """Tiny-scale smoke of the measured-headline bench path (CPU).

    bench.py's headline stage (stage_e2e_measured) runs the REAL
    evals.eval over the on-disk fixture; this exercises the identical
    code path at toy scale so a full-scale TPU run can't fail on logic.
    """

    def _tiny_fixture(self, tmp_path, monkeypatch):
        from visreps_tpu.benchmarks import fixture as fx

        monkeypatch.setattr(fx, "FIXTURE_DIR", tmp_path / "fx")
        monkeypatch.setattr(fx, "N_SHARED", 12)
        monkeypatch.setattr(fx, "N_UNIQUE", 20)
        monkeypatch.setattr(fx, "N_SUBJECTS", 2)
        # first two of the default region list — matches what a
        # re-importing subprocess derives from VISREPS_BENCH_N_REGIONS=2
        monkeypatch.setattr(fx, "REGIONS", ["early", "ventral"])
        monkeypatch.setattr(fx, "N_VOXELS", 8)
        monkeypatch.setattr(fx, "N_STIMULI", 12 + 2 * 20)
        monkeypatch.setattr(fx, "IMG_SIZE", 64)
        monkeypatch.setattr(fx, "N_JPEG", 6)
        return fx

    def test_e2e_measured_tiny(self, tmp_path, monkeypatch):
        import os

        import visreps_tpu.core.db as db
        import visreps_tpu.data.neural as neural_mod
        import visreps_tpu.evals as evals

        self._tiny_fixture(tmp_path, monkeypatch)
        # record originals so the stage's in-place redirects are undone
        monkeypatch.setenv("NSD_DATA_DIR", os.environ.get("NSD_DATA_DIR", ""))
        monkeypatch.setattr(neural_mod, "NSD_STIMULI_HDF5",
                            neural_mod.NSD_STIMULI_HDF5)
        monkeypatch.setattr(db, "RESULTS_DB_PATH", db.RESULTS_DB_PATH)
        monkeypatch.setattr(evals, "RESULTS_DB_PATH", evals.RESULTS_DB_PATH)

        out = stages.stage_e2e_measured(
            batch_size=16, num_workers=2, n_bootstrap=8, n_select=10,
            srp_k=64)
        assert out["n_stimuli"] == 52
        assert out["n_results"] == 4  # 2 subjects x 2 regions
        assert out["db_rows"] >= 4
        assert out["e2e_measured_s"] > 0

    def test_e2e_retention_equivalence(self, tmp_path, monkeypatch):
        """acts_retain (phase-1-only SRP row retention) must not change
        any result: same selected layers, same scores, same CIs."""
        import os

        import visreps_tpu.core.db as db
        import visreps_tpu.data.neural as neural_mod
        import visreps_tpu.evals as evals

        fx = self._tiny_fixture(tmp_path, monkeypatch)
        monkeypatch.setenv("NSD_DATA_DIR", os.environ.get("NSD_DATA_DIR", ""))
        monkeypatch.setattr(neural_mod, "NSD_STIMULI_HDF5",
                            neural_mod.NSD_STIMULI_HDF5)
        monkeypatch.setattr(db, "RESULTS_DB_PATH", db.RESULTS_DB_PATH)
        monkeypatch.setattr(evals, "RESULTS_DB_PATH", evals.RESULTS_DB_PATH)

        meta = fx.ensure_fixture()
        runs = {}
        for retain in (False, True):
            stages._e2e_setup(meta, db_path=tmp_path / f"retain_{retain}.db")
            cfg = stages._e2e_cfg(meta, range(meta["n_subjects"]), 16, 2,
                                  n_bootstrap=8, n_select=10,
                                  model_name="AlexNet", srp_k=64)
            cfg.acts_retain = retain
            runs[retain] = evals.eval(cfg)
        assert len(runs[True]) == len(runs[False]) == 4
        for a, b in zip(runs[False], runs[True]):
            assert a["layer"] == b["layer"]
            np.testing.assert_allclose(a["score"], b["score"], atol=1e-5)
            np.testing.assert_allclose(a["ci_low"], b["ci_low"], atol=1e-5)
            np.testing.assert_allclose(a["ci_high"], b["ci_high"], atol=1e-5)

    def test_e2e_mp_matches_single_process(self, tmp_path, monkeypatch):
        """Subject-sharded multi-process e2e writes the same rows as the
        single-process run (same layers/scores/CIs per (subject, region))."""
        import os
        import sqlite3

        import visreps_tpu.core.db as db
        import visreps_tpu.data.neural as neural_mod
        import visreps_tpu.evals as evals

        fx = self._tiny_fixture(tmp_path, monkeypatch)
        monkeypatch.setattr(neural_mod, "NSD_STIMULI_HDF5",
                            neural_mod.NSD_STIMULI_HDF5)
        monkeypatch.setattr(db, "RESULTS_DB_PATH", db.RESULTS_DB_PATH)
        monkeypatch.setattr(evals, "RESULTS_DB_PATH", evals.RESULTS_DB_PATH)
        # workers re-import the fixture module: pass the scale via env
        monkeypatch.setenv("VISREPS_BENCH_FIXTURE", str(tmp_path / "fx"))
        monkeypatch.setenv("VISREPS_BENCH_N_SHARED", "12")
        monkeypatch.setenv("VISREPS_BENCH_N_UNIQUE", "20")
        monkeypatch.setenv("VISREPS_BENCH_N_SUBJECTS", "2")
        monkeypatch.setenv("VISREPS_BENCH_N_REGIONS", "2")
        monkeypatch.setenv("VISREPS_BENCH_N_VOXELS", "8")
        monkeypatch.setenv("VISREPS_BENCH_IMG_SIZE", "64")
        monkeypatch.setenv("VISREPS_BENCH_N_JPEG", "6")
        monkeypatch.setenv("VISREPS_BENCH_CPU", "1")
        monkeypatch.setenv("NSD_DATA_DIR", str(tmp_path / "fx"))

        meta = fx.ensure_fixture()

        # single-process reference rows
        stages._e2e_setup(meta, db_path=tmp_path / "single.db")
        cfg = stages._e2e_cfg(meta, range(meta["n_subjects"]), 16, 2,
                              n_bootstrap=8, n_select=10,
                              model_name="AlexNet", srp_k=64)
        evals.eval(cfg)

        out = stages.stage_e2e_measured_mp(
            n_procs=2, batch_size=16,
            worker_env={"VISREPS_E2E_NBOOT": "8", "VISREPS_E2E_NSEL": "10",
                        "VISREPS_E2E_SRPK": "64", "VISREPS_E2E_WORKERS": "2"})
        assert out["complete"], out
        assert out["db_rows"] == out["expected_rows"] == 4

        q = ("SELECT region, subject_idx, layer, score, ci_low, ci_high "
             "FROM results ORDER BY region, subject_idx")
        with sqlite3.connect(str(tmp_path / "single.db")) as c:
            single = c.execute(q).fetchall()
        with sqlite3.connect(out["db_path"]) as c:
            mp = c.execute(q).fetchall()
        assert len(single) == len(mp) == 4
        for s, m in zip(single, mp):
            assert s[:3] == m[:3]  # region, subject, selected layer
            np.testing.assert_allclose(s[3:], m[3:], atol=1e-5)

    def test_decode_stage_tiny(self, tmp_path, monkeypatch):
        self._tiny_fixture(tmp_path, monkeypatch)
        out = stages.stage_decode(n_images=6, num_workers=2, batch_size=4)
        assert out["n_images"] == 6
        assert out["decode_images_per_sec"] > 0

    def test_h2d_stage(self):
        out = stages.stage_h2d(batch_size=4, iters=2)
        assert out["h2d_MB_per_s"] > 0


class TestProcsCLI:
    """End-to-end drive of `run.py --procs K`: K subject-shard worker
    subprocesses run the real CLI over the tiny on-disk fixture into
    one shared results.db, matching an in-process single run."""

    def test_procs_cli_e2e_tiny(self, tmp_path, monkeypatch):
        import os
        import sqlite3

        import pytest

        import visreps_tpu.core.db as db
        import visreps_tpu.data.neural as neural_mod
        from visreps_tpu import evals
        from visreps_tpu import run as run_mod
        from visreps_tpu.benchmarks import fixture as fx
        from visreps_tpu.core.config import load_config
        from visreps_tpu.core.validate import validate_config

        monkeypatch.setattr(fx, "FIXTURE_DIR", tmp_path / "fx")
        monkeypatch.setattr(fx, "N_SHARED", 12)
        monkeypatch.setattr(fx, "N_UNIQUE", 20)
        monkeypatch.setattr(fx, "N_SUBJECTS", 2)
        monkeypatch.setattr(fx, "REGIONS", ["early", "ventral"])
        monkeypatch.setattr(fx, "N_VOXELS", 8)
        monkeypatch.setattr(fx, "N_STIMULI", 12 + 2 * 20)
        monkeypatch.setattr(fx, "IMG_SIZE", 64)
        monkeypatch.setattr(fx, "N_JPEG", 6)
        meta = fx.ensure_fixture()

        mp_db = tmp_path / "mp.db"
        # env for the worker subprocesses (inherited via Popen)
        monkeypatch.setenv("NSD_DATA_DIR", str(tmp_path / "fx"))
        monkeypatch.setenv("NSD_STIMULI_HDF5", meta["hdf5"])
        monkeypatch.setenv("VISREPS_RESULTS_DB", str(mp_db))
        monkeypatch.setenv("VISREPS_PLATFORM", "cpu")

        overrides = [
            "neural_dataset=nsd", "subject_idx=[0,1]",
            "region=[early visual stream,ventral visual stream]",
            "analysis=rsa", "compare_method=spearman",
            "bootstrap=true", "n_bootstrap=8", "n_select=10",
            "batchsize=16", "num_workers=2",
            "load_model_from=torchvision", "model_name=AlexNet",
            "pretrained_dataset=none", "extract_pre_and_post=true",
            "srp_k=64", "uint8_transfer=true", "log_expdata=true",
            "seed=1", "use_mesh=false",
        ]
        with pytest.raises(SystemExit) as exc:
            run_mod.main(["--mode", "eval", "--procs", "2",
                          "--override", *overrides])
        assert exc.value.code == 0

        # in-process single run for comparison
        monkeypatch.setattr(neural_mod, "NSD_STIMULI_HDF5", meta["hdf5"])
        single_db = tmp_path / "single.db"
        monkeypatch.setattr(db, "RESULTS_DB_PATH", single_db)
        cfg = validate_config(load_config(
            "configs/eval/base.json", overrides + ["mode=eval"]))
        evals.eval(cfg)

        q = ("SELECT region, subject_idx, layer, score, ci_low, ci_high "
             "FROM results ORDER BY region, subject_idx")
        with sqlite3.connect(str(mp_db)) as c:
            mp_rows = c.execute(q).fetchall()
        with sqlite3.connect(str(single_db)) as c:
            single_rows = c.execute(q).fetchall()
        assert len(mp_rows) == len(single_rows) == 4
        for s, m in zip(single_rows, mp_rows):
            assert s[:3] == m[:3]
            np.testing.assert_allclose(s[3:], m[3:], atol=1e-5)


class TestWorkloadStages:
    """Tiny-scale smoke of the BASELINE.json workload stages (CPU):
    THINGS / TVSD / NSD-Synthetic / cross-model run the REAL evals
    branches over on-disk fixtures — same code path as the TPU bench
    (VERDICT r3 item 2)."""

    @pytest.fixture
    def tiny_fx(self, tmp_path, monkeypatch):
        import os

        from visreps_tpu.benchmarks import fixture as fx

        monkeypatch.setattr(fx, "FIXTURE_DIR", tmp_path / "fx")
        monkeypatch.setattr(fx, "IMG_SIZE", 64)
        monkeypatch.setattr(fx, "N_JPEG", 6)
        monkeypatch.setattr(fx, "THINGS_CONCEPTS", 16)
        monkeypatch.setattr(fx, "THINGS_IMGS_PER_CONCEPT", 2)
        monkeypatch.setattr(fx, "TVSD_CONCEPTS", 5)
        monkeypatch.setattr(fx, "TVSD_IMGS_PER_CONCEPT", 2)
        monkeypatch.setattr(fx, "TVSD_N_TEST", 6)
        monkeypatch.setattr(fx, "TVSD_N_SITES", 8)
        monkeypatch.setattr(fx, "NSDSYN_N_STIMULI", 8)
        monkeypatch.setattr(fx, "N_SUBJECTS", 2)
        monkeypatch.setattr(fx, "REGIONS", ["early", "ventral"])
        monkeypatch.setattr(fx, "N_VOXELS", 8)

        import visreps_tpu.core.db as db
        import visreps_tpu.evals as evals

        # the stages chdir + redirect the db module-globals in place
        cwd = os.getcwd()
        monkeypatch.setattr(db, "RESULTS_DB_PATH", db.RESULTS_DB_PATH)
        monkeypatch.setattr(evals, "RESULTS_DB_PATH", evals.RESULTS_DB_PATH)
        yield fx
        os.chdir(cwd)

    def test_things_stage(self, tiny_fx):
        out = stages.stage_things_e2e(batch_size=8, num_workers=2,
                                      n_bootstrap=8, srp_k=32)
        assert out["n_images"] == 32 and out["n_concepts"] == 16
        assert out["n_results"] == 1 and out["db_rows"] >= 1
        assert out["things_e2e_s"] > 0

    def test_tvsd_stage(self, tiny_fx):
        out = stages.stage_tvsd_e2e(batch_size=8, num_workers=2,
                                    n_bootstrap=8, n_select=6, srp_k=32)
        assert out["n_train"] == 10 and out["n_test"] == 6
        assert out["n_results"] == 6  # 2 monkeys x 3 regions
        assert out["db_rows"] >= 6

    def test_nsd_synthetic_stage(self, tiny_fx):
        out = stages.stage_nsd_synthetic_e2e(batch_size=8, num_workers=2,
                                             n_bootstrap=8, srp_k=32)
        assert out["n_stimuli"] == 8
        assert out["n_results"] == 4  # 2 subjects x 2 regions

    def test_cross_model_stage(self, tiny_fx):
        out = stages.stage_cross_model(n_images=6, batch_size=3, srp_k=16,
                                       models=["AlexNet", "clip-vit-l14"],
                                       tiny_towers=True)
        assert out["n_models"] == 2
        assert out["n_pair_matrices"] == 3  # AA, AC, CC
        assert out["cross_model_rdm_s"] > 0


class TestWorkloadsGraceHarvest:
    """stage_workloads grace-harvests its own inner orphans: a
    sub-stage abandoned at its cap whose process later exits has its
    real numbers merged over the timeout markers."""

    @staticmethod
    def _dead_pid():
        import subprocess
        import sys

        p = subprocess.Popen([sys.executable, "-c", "pass"])
        p.wait()
        return p.pid

    def test_exited_orphan_merged_over_timeout_markers(self, tmp_path, monkeypatch):
        import json

        out = tmp_path / "tvsd.out"
        out.write_text("progress noise\n" + json.dumps(
            {"stage": "tvsd_e2e", "tvsd_e2e_s": 99.0, "n_results": 6}) + "\n")
        dead = self._dead_pid()

        def fake(cmd, name, cap):
            if name == "tvsd":
                return {"tvsd_timeout_s": cap, "tvsd_orphan_pid": dead,
                        "tvsd_orphan_out": str(out)}
            return {f"{name}_e2e_s": 1.0}

        monkeypatch.setattr(stages, "_run_substage", fake)
        monkeypatch.setenv("VISREPS_WORKLOAD_GRACE_S", "30")
        acc = stages.stage_workloads()
        assert acc["tvsd_e2e_s"] == 99.0
        assert acc["tvsd_n_results"] == 6
        for marker in ("tvsd_timeout_s", "tvsd_orphan_pid", "tvsd_orphan_out"):
            assert marker not in acc

    def test_unreaped_exited_orphan_harvested(self, tmp_path, monkeypatch):
        """ADVICE r4 (high): the real timeout case leaves an UNREAPED
        direct child — a zombie, for which os.kill(pid, 0) still
        succeeds. The grace loop must detect the exit via the stashed
        Popen (or waitpid) and merge, not burn the full grace window."""
        import json
        import subprocess
        import sys
        import time as _time

        out = tmp_path / "tvsd.out"
        out.write_text(json.dumps(
            {"stage": "tvsd_e2e", "tvsd_e2e_s": 77.0, "n_results": 6}) + "\n")
        err = tmp_path / "tvsd.err"
        err.write_text("noise\n")
        import os as _os

        p = subprocess.Popen([sys.executable, "-c", "pass"])
        # Block until exit WITHOUT reaping: p is now a zombie child —
        # the exact state the r4 bug misread as "still running".
        _os.waitid(_os.P_PID, p.pid, _os.WEXITED | _os.WNOWAIT)
        monkeypatch.setattr(stages, "_ORPHAN_PROCS", {"tvsd": p})

        def fake(cmd, name, cap):
            if name == "tvsd":
                return {"tvsd_timeout_s": cap, "tvsd_orphan_pid": p.pid,
                        "tvsd_orphan_out": str(out),
                        "tvsd_orphan_err": str(err)}
            return {f"{name}_e2e_s": 1.0}

        monkeypatch.setattr(stages, "_run_substage", fake)
        monkeypatch.setenv("VISREPS_WORKLOAD_GRACE_S", "30")
        t0 = _time.monotonic()
        acc = stages.stage_workloads()
        assert _time.monotonic() - t0 < 20  # merged, not grace-burned
        assert acc["tvsd_e2e_s"] == 77.0
        for marker in ("tvsd_timeout_s", "tvsd_orphan_pid",
                       "tvsd_orphan_out", "tvsd_orphan_err"):
            assert marker not in acc
        # harvested temp files are unlinked (ADVICE r4 fd/tmp leak)
        assert not out.exists() and not err.exists()

    def test_unreaped_exited_orphan_pid_only_fallback(self, tmp_path,
                                                      monkeypatch):
        """Same scenario without the Popen stash: the waitpid fallback
        must reap the zombie and report it dead."""
        import os as _os
        import subprocess
        import sys

        p = subprocess.Popen([sys.executable, "-c", "pass"])
        _os.waitid(_os.P_PID, p.pid, _os.WEXITED | _os.WNOWAIT)  # zombie
        monkeypatch.setattr(stages, "_ORPHAN_PROCS", {})
        assert stages._orphan_alive("ghost", p.pid) is False

    def test_zero_grace_keeps_markers(self, tmp_path, monkeypatch):
        import os

        out = tmp_path / "things.out"
        out.write_text("still working\n")

        def fake(cmd, name, cap):
            if name == "things":
                return {"things_timeout_s": cap,
                        "things_orphan_pid": os.getpid(),  # alive
                        "things_orphan_out": str(out)}
            return {f"{name}_e2e_s": 1.0}

        monkeypatch.setattr(stages, "_run_substage", fake)
        monkeypatch.setenv("VISREPS_WORKLOAD_GRACE_S", "0")
        acc = stages.stage_workloads()
        assert acc["things_timeout_s"] > 0
        assert acc["things_orphan_pid"] == os.getpid()


class TestCompactEmit:
    """VERDICT r4 item 1: the driver keeps only a ~2,000-char stdout
    tail — every stdout line must be a self-contained compact record
    under Bench.COMPACT_MAX chars, with the full dump in the sidecar."""

    def _bench_module(self):
        import importlib.util
        import pathlib

        path = pathlib.Path(__file__).resolve().parents[1] / "bench.py"
        spec = importlib.util.spec_from_file_location("_benchmod2", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def _loaded_bench(self):
        mod = self._bench_module()
        b = mod.Bench()
        b.e2e = {"e2e_measured_s": 246.6, "db_rows": 48, "n_stimuli": 73000,
                 **{f"phase_{k}_s": 1.0 for k in (
                     "backend_init", "model_load", "data_load", "extraction",
                     "extraction_enqueue", "extraction_drain",
                     "extraction_loader", "extraction_upload_wait",
                     "extraction_dispatch", "phase1_staging",
                     "phase1_selection", "phase2_extract",
                     "scoring_bootstrap")}}
        # a realistic r4-sized extras payload (the one that broke r4)
        for wl in ("things", "tvsd", "nsd_synthetic", "cross_model"):
            for k in ("e2e_s", "n_results", "db_rows", "phase_extraction_s",
                      "phase_extraction_enqueue_s", "phase_extraction_drain_s",
                      "phase_extraction_loader_s", "phase_scoring_s",
                      "phase_scoring_point_score_s", "phase_model_load_s"):
                b.extras[f"{wl}_{k}"] = 123.456
        b.extras.update({
            "e2e_runs_s": [246.6, 301.2], "e2e_headline_stat": "best_of_2",
            "e2e_median_s": 273.9, "encoding_48pair_full_nsd_s": 297.0,
            "extract_images_per_sec_per_chip": 7741.2,
            "rsa_bootstraps_per_sec": 1234.5, "rdm_10kx10k_ms": 321.0,
            "train_images_per_sec_per_chip": 11037.0, "train_step_mfu": 0.08,
            "cross_model_pretrained_weights": True,
        })
        return mod, b

    def test_compact_line_fits_and_parses(self):
        import json

        _, b = self._loaded_bench()
        full = b._full_record()
        line = b.compact_line(full)
        assert len(line) <= b.COMPACT_MAX
        rec = json.loads(line)
        # headline fields always present
        assert rec["metric"] == "nsd_e2e_measured_73k_8subj_bootstrap_rsa"
        assert rec["value"] == 246.6
        assert rec["measured"] is True
        assert rec["vs_baseline"] == round(300.0 / 246.6, 3)
        # priority extras made it on
        assert rec["e2e_runs_s"] == [246.6, 301.2]
        assert rec["phase_extraction_s"] == 1.0
        assert rec["train_step_mfu"] == 0.08

    def test_emit_writes_sidecar_and_compact_stdout(self, tmp_path,
                                                    monkeypatch, capsys):
        import json
        import os

        mod, b = self._loaded_bench()
        monkeypatch.setenv("VISREPS_BENCH_DETAIL",
                           str(tmp_path / "BENCH_DETAIL.json"))
        b.emit()
        out_lines = capsys.readouterr().out.strip().splitlines()
        assert len(out_lines) == 1
        assert len(out_lines[0]) <= b.COMPACT_MAX
        json.loads(out_lines[0])
        detail = json.loads((tmp_path / "BENCH_DETAIL.json").read_text())
        # the sidecar keeps what the compact line drops
        assert detail["things_phase_extraction_enqueue_s"] == 123.456

    def test_compact_line_honors_cap_under_huge_extras(self):
        import json

        _, b = self._loaded_bench()
        for i in range(400):
            b.extras[f"overflow_key_number_{i:04d}_s"] = 1.0
        line = b.compact_line(b._full_record())
        assert len(line) <= b.COMPACT_MAX
        json.loads(line)


class TestLateHarvest:
    """bench.py folds in JSON lines from timed-out stages whose orphan
    process finished later (relay stalls make this the common case)."""

    def _bench_module(self):
        import importlib.util
        import pathlib

        path = pathlib.Path(__file__).resolve().parents[1] / "bench.py"
        spec = importlib.util.spec_from_file_location("_benchmod", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    @staticmethod
    def _dead_pid():
        """pid of a process that has already exited (and been reaped)."""
        import subprocess
        import sys

        p = subprocess.Popen([sys.executable, "-c", "pass"])
        p.wait()
        return p.pid

    def test_harvest_applies_extras_and_discloses(self, tmp_path):
        import json

        mod = self._bench_module()
        f = tmp_path / "stage.out"
        f.write_text("progress line\n"
                     + json.dumps({"score_delta": 0.0, "highest_s": 329.1,
                                   "n_voxels": [5000, 7604]}) + "\n")
        mod._ORPHAN_FILES.clear()
        mod._ORPHAN_FILES["encoding_delta"] = (self._dead_pid(), str(f))
        b = mod.Bench()
        b._extras_fns["encoding_delta"] = lambda r: b.extras.update(
            {"encoding_high_vs_highest_score_delta": r["score_delta"]})
        assert b.harvest_orphans() is True
        assert b.extras["encoding_high_vs_highest_score_delta"] == 0.0
        assert b.extras["late_harvested"] == ["encoding_delta"]
        assert not mod._ORPHAN_FILES

    def test_unfinished_orphan_stays_pending(self, tmp_path):
        mod = self._bench_module()
        f = tmp_path / "stage.out"
        f.write_text("still working\nno json yet\n")
        mod._ORPHAN_FILES.clear()
        mod._ORPHAN_FILES["encoding_e2e"] = (self._dead_pid(), str(f))
        b = mod.Bench()
        assert b.harvest_orphans() is False
        assert "encoding_e2e" not in mod._ORPHAN_FILES  # exited, no JSON

    def test_live_orphan_not_harvested_mid_run(self, tmp_path):
        """ADVICE r3: an intermediate JSON line from a STILL-RUNNING
        orphan must not be folded in as the stage's final result."""
        import json
        import os

        mod = self._bench_module()
        f = tmp_path / "stage.out"
        f.write_text(json.dumps({"e2e_measured_s": 1.0}) + "\n")
        mod._ORPHAN_FILES.clear()
        mod._ORPHAN_FILES["e2e_measured"] = (os.getpid(), str(f))  # alive
        b = mod.Bench()
        assert b.harvest_orphans() is False
        assert "e2e_measured" in mod._ORPHAN_FILES
        mod._ORPHAN_FILES.clear()

    def test_harvested_e2e_becomes_headline(self, tmp_path):
        import json

        mod = self._bench_module()
        f = tmp_path / "stage.out"
        f.write_text(json.dumps({"e2e_measured_s": 246.6, "db_rows": 48}) + "\n")
        mod._ORPHAN_FILES.clear()
        mod._ORPHAN_FILES["e2e_measured"] = (self._dead_pid(), str(f))
        b = mod.Bench()
        assert b.harvest_orphans() is True
        assert b.e2e["e2e_measured_s"] == 246.6

    def test_live_cumulative_snapshots_harvested_and_refreshed(self, tmp_path):
        """stage_workloads/stage_kernels mark every line "cumulative":
        such snapshots ARE harvested from a live orphan, stay pending
        for richer later snapshots, and identical re-reads are no-ops."""
        import json
        import os

        mod = self._bench_module()
        f = tmp_path / "stage.out"
        f.write_text(json.dumps(
            {"stage": "workloads", "cumulative": True,
             "things_e2e_s": 201.0}) + "\n")
        mod._ORPHAN_FILES.clear()
        mod._ORPHAN_FILES["workloads"] = (os.getpid(), str(f))  # alive
        b = mod.Bench()
        keys = {}
        b._extras_fns["workloads"] = lambda r: keys.update(r)
        assert b.harvest_orphans() is True
        assert keys["things_e2e_s"] == 201.0
        assert "workloads" in mod._ORPHAN_FILES  # still pending
        # same snapshot again: nothing new
        assert b.harvest_orphans() is False
        # richer snapshot: re-harvested
        f.write_text(f.read_text() + json.dumps(
            {"stage": "workloads", "cumulative": True,
             "things_e2e_s": 201.0, "tvsd_e2e_s": 120.0}) + "\n")
        assert b.harvest_orphans() is True
        assert keys["tvsd_e2e_s"] == 120.0
        mod._ORPHAN_FILES.clear()
