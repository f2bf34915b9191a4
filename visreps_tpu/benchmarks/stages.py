"""Individual benchmark stages, each runnable in an isolated process.

Usage: python -m visreps_tpu.benchmarks.stages <stage> [--size ...]
Prints one JSON line with the stage's measurements. Run under a parent
orchestrator (bench.py) so a TPU fault in one stage doesn't kill the
whole benchmark.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# Persistent compilation cache: compiled executables survive across
# stage subprocesses (critical on remote-compile TPU terminals where
# cold compiles take minutes).
import jax  # noqa: E402

if os.environ.get("VISREPS_BENCH_CPU"):
    # CPU-forced logic checks (toy-scale bench.py orchestration runs);
    # must be set via jax.config — sitecustomize overrides JAX_PLATFORMS.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def _force(out) -> float:
    """Force execution by fetching a scalar reduction to the host.

    block_until_ready alone does not reliably wait through the axon
    remote-execution relay; a host fetch does.
    """
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


# v5e per-chip peak: 394 TFLOP/s bf16 (f32 via the MXU runs at a
# fraction of this — MFU is reported against the bf16 peak so numbers
# are comparable across dtypes and honestly low for f32 kernels).
V5E_BF16_PEAK_FLOPS = 394e12


def _cost_flops(fn, *args):
    """FLOP count from XLA's cost analysis of the compiled program.

    Accepts a function (jitted preferred — its .lower reuses the same
    executable cache entry the timing loop hits) plus example args;
    returns None when the backend doesn't expose cost analysis (never
    fails a stage)."""
    import jax

    try:
        lowerable = fn if hasattr(fn, "lower") else jax.jit(fn)
        c = lowerable.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = float(c.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _mfu_fields(prefix: str, flops_per_call, seconds_per_call: float):
    """achieved TFLOP/s + fraction of v5e bf16 peak, or {} if unknown."""
    if not flops_per_call or seconds_per_call <= 0:
        return {}
    achieved = flops_per_call / seconds_per_call
    return {f"{prefix}_tflops": round(achieved / 1e12, 2),
            f"{prefix}_mfu": round(achieved / V5E_BF16_PEAK_FLOPS, 4)}


def _timeit(fn, *args, warmup=1, iters=3):
    """Amortized per-call seconds: dispatch `iters` calls back-to-back
    (device queue pipelines them), then force one host fetch."""
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def stage_extract(batch_size=128, iters=8, compute_dtype=None,
                  model="AlexNet", srp_k=4096, image_size=224,
                  return_nodes=("conv1", "conv2", "conv3", "conv4", "conv5", "fc1", "fc2")):
    """AlexNet 14-tap forward + fused SRP throughput (device pipeline)."""
    import jax
    import jax.numpy as jnp

    from visreps_tpu.models.extractor import FeatureExtractor
    from visreps_tpu.models.zoo import init_model

    state = init_model(model, 1000, seed=0)
    ex = FeatureExtractor(
        state, list(return_nodes),
        extract_pre_and_post=True, srp_k=srp_k, batch_size=batch_size,
        compute_dtype=compute_dtype, image_size=image_size,
    )
    proj = ex._proj_dict()
    x = jax.random.normal(
        jax.random.PRNGKey(0), (batch_size, image_size, image_size, 3), jnp.float32
    )
    t = _timeit(lambda: ex._srp_step(state.variables, proj, x), warmup=2, iters=iters)
    return {"images_per_sec": batch_size / t, "batch_ms": t * 1000,
            "compute_dtype": compute_dtype or "f32"}


def stage_forward(batch_size=128, iters=8):
    """Plain AlexNet forward (no taps) for reference."""
    import jax
    import jax.numpy as jnp

    from visreps_tpu.models.zoo import init_model

    state = init_model("AlexNet", 1000, seed=0)

    @jax.jit
    def fwd(v, x):
        logits, _ = state.module.apply(v, x, train=False, capture=())
        return logits

    x = jax.random.normal(jax.random.PRNGKey(0), (batch_size, 224, 224, 3), jnp.float32)
    t = _timeit(lambda: fwd(state.variables, x), warmup=2, iters=iters)
    return {"images_per_sec": batch_size / t}


def stage_rdm(n=10000, d=4096):
    import jax

    from visreps_tpu.ops.rdm import compute_rdm

    x = jax.random.normal(jax.random.PRNGKey(1), (n, d))
    t = _timeit(compute_rdm, x, warmup=1, iters=2)
    # Gram product dominates: 2·n²·d FMA-flops (analytic — exact for
    # the matmul; the elementwise epilogue adds O(n²)).
    return {"rdm_ms": t * 1000, "n": n, "d": d,
            **_mfu_fields("rdm", 2.0 * n * n * d, t)}


def stage_rdm_pallas(n=10000, d=4096):
    import jax

    from visreps_tpu.ops.rdm_pallas import compute_rdm_pallas

    x = jax.random.normal(jax.random.PRNGKey(1), (n, d))
    t32 = _timeit(lambda: compute_rdm_pallas(x, bf16=False), warmup=1, iters=2)
    t16 = _timeit(lambda: compute_rdm_pallas(x, bf16=True), warmup=1, iters=2)
    return {"rdm_pallas_f32_ms": t32 * 1000, "rdm_pallas_bf16_ms": t16 * 1000}


def stage_bootstrap(n=1000, n_bootstrap=1000, method="spearman", chunk=250):
    import jax
    import jax.numpy as jnp

    from visreps_tpu.ops.bootstrap import (
        _bootstrap_scores,
        _bootstrap_spearman_fast,
        bootstrap_indices,
    )
    from visreps_tpu.ops.rdm import compute_rdm

    a = jax.random.normal(jax.random.PRNGKey(2), (n, 512))
    b = a + 0.5 * jax.random.normal(jax.random.PRNGKey(3), (n, 512))
    rdm_a, rdm_b = compute_rdm(a), compute_rdm(b)
    idx = jnp.asarray(bootstrap_indices(n, n_bootstrap))
    if method == "spearman":
        fn = lambda: _bootstrap_spearman_fast(rdm_a, rdm_b, idx, chunk)  # noqa: E731
    elif method == "kendall":
        from visreps_tpu.ops.kendall import bootstrap_kendall_fast

        fn = lambda: bootstrap_kendall_fast(rdm_a, rdm_b, idx, chunk)  # noqa: E731
    else:
        fn = lambda: _bootstrap_scores(rdm_a, rdm_b, idx, method, chunk)  # noqa: E731
    t = _timeit(fn, warmup=1, iters=2)
    return {"bootstraps_per_sec": n_bootstrap / t, "method": method}


def stage_selection(n_sel=1000, k=4096, n_taps=14, method="spearman"):
    """Phase-1 layer selection for one (region, subject)."""
    from visreps_tpu.analysis.rsa import select_best_layer

    rng = np.random.RandomState(0)
    acts = {f"tap{i}": rng.randn(n_sel, k).astype(np.float32) for i in range(n_taps)}
    neural = rng.randn(n_sel, 512).astype(np.float32)
    select_best_layer(acts, neural, method)  # compile
    t0 = time.perf_counter()
    select_best_layer(acts, neural, method)
    return {"selection_s": time.perf_counter() - t0}


def stage_selection_device(n_sel=1000, k=4096, n_taps=14, method="spearman"):
    """Phase-1 selection with DEVICE-resident activations (the
    acts_store='device' eval path — no host→device upload)."""
    import jax

    from visreps_tpu.analysis.rsa import _select_scores_batched

    acts = jax.random.normal(jax.random.PRNGKey(0), (n_taps, n_sel, k))
    neural = jax.random.normal(jax.random.PRNGKey(1), (n_sel, 512))
    t = _timeit(lambda: _select_scores_batched(acts, neural, method), warmup=1, iters=3)
    return {"selection_s": t}


def stage_ridge(n=9000, d=4096, v=7604):
    """Full NSD-ventral-scale RidgeCV fit + predict."""
    import jax

    from visreps_tpu.ops.ridge import (
        _ridge_cv_wood_impl, _woodbury_ok, default_alphas, ridge_cv,
    )

    x = jax.random.normal(jax.random.PRNGKey(4), (n, d))
    w = jax.random.normal(jax.random.PRNGKey(5), (d, v)) / 64.0
    y = x @ w + jax.random.normal(jax.random.PRNGKey(6), (n, v))

    def run():
        return ridge_cv(x, y).weights

    t = _timeit(run, warmup=1, iters=1)
    flops = None
    if _woodbury_ok(n, d, 5):
        import jax.numpy as jnp

        a = jnp.asarray(default_alphas(), jnp.float32)
        # same jitted impl ridge_cv dispatched → same executable cache
        flops = _cost_flops(_ridge_cv_wood_impl, x, y, a, 5)
    return {"ridge_cv_s": t, "n": n, "d": d, "v": v,
            **_mfu_fields("ridge", flops, t)}


def stage_encoding_e2e(n_subjects=8, n_train=9000, n_test=1000, d=4096,
                       n_taps=14, n_bootstrap=1000,
                       voxels=(5000, 7604, 2000, 2000, 1500, 900),
                       cv_precision="high"):
    """Full-NSD-scale encoding eval: 8 subjects × 6 regions × 14 layers.

    VERDICT item 4 target: ≤ 300 s for the 48 (region, subject) pairs
    at (9k × 4096 → ~19k concatenated voxels) scale. Measures the
    subject-batched orchestrator (analysis/encoding.
    compute_encoding_scores_subject) end to end, bootstraps included.
    """
    import jax
    import jax.numpy as jnp

    from visreps_tpu.analysis.encoding import (
        compute_encoding_scores_subject,
        compute_encoding_scores_subjects,
    )

    # Device-resident fixture, generated on device (eval activations are
    # HBM-resident in the real pipeline — acts_store="device" — and the
    # relay's host→device path must stay out of the measurement).
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    acts_tr = {f"tap{i}": jax.random.normal(jax.random.fold_in(keys[0], i), (n_train, d))
               for i in range(n_taps)}
    acts_te = {f"tap{i}": jax.random.normal(jax.random.fold_in(keys[1], i), (n_test, d))
               for i in range(n_taps)}
    y_tr, y_te = {}, {}
    for r, v in enumerate(voxels):
        w = jax.random.normal(jax.random.fold_in(keys[2], r), (d, v)) / 64.0
        y_tr[str(r)] = acts_tr["tap3"] @ w + jax.random.normal(
            jax.random.fold_in(keys[3], 2 * r), (n_train, v))
        y_te[str(r)] = acts_te["tap3"] @ w + jax.random.normal(
            jax.random.fold_in(keys[3], 2 * r + 1), (n_test, v))
    jax.block_until_ready((y_tr, y_te))

    # one subject as compile warmup, then time the multi-subject
    # orchestrator (cross-subject batched refit eighs)
    compute_encoding_scores_subject(
        acts_tr, acts_te, y_tr, y_te, bootstrap=True, n_bootstrap=n_bootstrap,
        cv_precision=cv_precision,
    )
    subject_inputs = {s: (acts_tr, acts_te, y_tr, y_te) for s in range(n_subjects)}
    t0 = time.perf_counter()
    compute_encoding_scores_subjects(
        subject_inputs, bootstrap=True, n_bootstrap=n_bootstrap,
        cv_precision=cv_precision,
    )
    t = time.perf_counter() - t0
    from visreps_tpu.analysis import encoding as _enc

    return {"encoding_e2e_s": t, "per_subject_s": t / n_subjects,
            "n_pairs": n_subjects * len(voxels), "cv_precision": cv_precision,
            **{f"phase_{k}": round(v, 1)
               for k, v in _enc.LAST_PHASE_TIMES.items()}}


def stage_encoding_delta(n_train=9000, n_test=1000, d=4096, n_taps=14,
                         voxels=(5000, 7604, 2000, 2000, 1500, 900)):
    """high-vs-highest CV-precision score delta at full voxel scale.

    VERDICT r2 weak-item 3: the bench's encoding stage defaults to
    cv_precision="high" while the eval path defaults to "highest"; this
    stage quantifies the score difference ON CHIP for one subject × 6
    regions (7,604-voxel ventral included) and times the "highest" run.
    """
    import jax

    from visreps_tpu.analysis.encoding import compute_encoding_scores_subject

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    acts_tr = {f"tap{i}": jax.random.normal(jax.random.fold_in(keys[0], i), (n_train, d))
               for i in range(n_taps)}
    acts_te = {f"tap{i}": jax.random.normal(jax.random.fold_in(keys[1], i), (n_test, d))
               for i in range(n_taps)}
    y_tr, y_te = {}, {}
    for r, v in enumerate(voxels):
        w = jax.random.normal(jax.random.fold_in(keys[2], r), (d, v)) / 64.0
        y_tr[str(r)] = acts_tr["tap3"] @ w + jax.random.normal(
            jax.random.fold_in(keys[3], 2 * r), (n_train, v))
        y_te[str(r)] = acts_te["tap3"] @ w + jax.random.normal(
            jax.random.fold_in(keys[3], 2 * r + 1), (n_test, v))
    jax.block_until_ready((y_tr, y_te))

    out = {}
    for prec in ("high", "highest"):
        t0 = time.perf_counter()
        res = compute_encoding_scores_subject(
            acts_tr, acts_te, y_tr, y_te, bootstrap=False, cv_precision=prec)
        out[prec] = ({r: res[r][0]["score"] for r in res},
                     {r: res[r][0]["layer"] for r in res},
                     time.perf_counter() - t0)
    scores_hi, layers_hi, t_hi = out["high"]
    scores_hst, layers_hst, t_hst = out["highest"]
    delta = max(abs(scores_hi[r] - scores_hst[r]) for r in scores_hi)
    return {
        "score_delta": round(delta, 6), "high_s": t_hi, "highest_s": t_hst,
        "scores_high": {k: round(v, 5) for k, v in scores_hi.items()},
        "scores_highest": {k: round(v, 5) for k, v in scores_hst.items()},
        "n_voxels": list(voxels), "same_layer": layers_hi == layers_hst,
    }


def _e2e_setup(meta, db_path=None):
    """Point the repo's data/db globals at the benchmark fixture.

    Returns (cfg_base_dict, db_path). A shared db_path makes concurrent
    subject-sharded workers write one results.db (WAL + OR REPLACE —
    the same multi-writer story the SLURM runners rely on).
    """
    import tempfile
    from pathlib import Path

    os.environ["NSD_DATA_DIR"] = str(Path(meta["pickle"]).parent)

    import visreps_tpu.core.db as db
    import visreps_tpu.data.neural as neural_mod
    import visreps_tpu.evals as evals

    neural_mod.NSD_STIMULI_HDF5 = meta["hdf5"]
    if db_path is None:
        db_path = Path(tempfile.mkdtemp(prefix="bench_e2e_")) / "results.db"
    db.RESULTS_DB_PATH = Path(db_path)
    evals.RESULTS_DB_PATH = db.RESULTS_DB_PATH
    return db_path


def _e2e_cfg(meta, subjects, batch_size, num_workers, n_bootstrap, n_select,
             model_name, srp_k):
    import visreps_tpu.data.neural as neural_mod
    from visreps_tpu.core.config import Config

    pkl_to_full = {v: k for k, v in neural_mod._NSD_REGION_MAP.items()}
    cfg = Config({
        "mode": "eval", "seed": 1, "neural_dataset": "nsd",
        "subject_idx": list(subjects),
        "shared_test_subjects": list(range(meta["n_subjects"])),
        "region": [pkl_to_full[r] for r in meta["regions"]],
        "analysis": "rsa", "compare_method": "spearman",
        "bootstrap": True, "n_bootstrap": n_bootstrap, "n_select": n_select,
        "batchsize": batch_size, "num_workers": num_workers,
        "load_model_from": "torchvision", "model_name": model_name,
        "pretrained_dataset": "none", "extract_pre_and_post": True,
        "srp_k": srp_k, "uint8_transfer": True, "log_expdata": True,
    })
    cfg.epoch = -1
    cfg.cfg_id = "untrained"
    return cfg


def stage_e2e_measured(batch_size=512, num_workers=16, n_bootstrap=1000,
                       n_select=1000, model_name="AlexNet", srp_k=4096):
    """MEASURED wall-clock of the BASELINE.md north-star workload.

    Runs the real `evals.eval` orchestration — real HDF5 loader (73k
    stimuli through LazyHdf5Dict + transforms), real two-phase RSA for
    8 subjects × 6 regions with 1000-iteration bootstraps, real
    results.db writes — against the on-disk synthetic fixture
    (benchmarks/fixture.py; synthetic pixels, authentic data path).
    Replaces round 1's stage-composed projection (VERDICT item 3).
    """
    from visreps_tpu.benchmarks.fixture import ensure_fixture

    meta = ensure_fixture()
    db_path = _e2e_setup(meta)

    import visreps_tpu.evals as evals

    batch_size = int(os.environ.get("VISREPS_E2E_BATCH", batch_size))
    cfg = _e2e_cfg(meta, range(meta["n_subjects"]), batch_size, num_workers,
                   n_bootstrap, n_select, model_name, srp_k)

    t0 = time.perf_counter()
    results = evals.eval(cfg)
    wall = time.perf_counter() - t0

    import sqlite3

    conn = sqlite3.connect(str(db_path))
    n_rows = conn.execute("SELECT COUNT(*) FROM results").fetchone()[0]
    conn.close()
    return {
        "e2e_measured_s": wall, "n_results": len(results), "db_rows": n_rows,
        "n_stimuli": meta["n_stimuli"], "n_pairs": len(results),
        "n_voxels_per_region": meta["n_voxels_per_region"],
        "stimulus_hw": meta["img_size"],
        **{f"phase_{k}": round(v, 1) for k, v in evals.LAST_PHASE_TIMES.items()},
    }


def stage_e2e_worker():
    """One subject-sharded worker of the multi-process measured e2e.

    Env contract (set by stage_e2e_measured_mp):
      VISREPS_E2E_SUBJECTS  comma-separated subject indices to process
      VISREPS_E2E_DB        shared results.db path
      VISREPS_E2E_BATCH     extraction batch size (HBM is split across
                            workers; smaller batches shrink the
                            per-forward tap transients)
    """
    from visreps_tpu.benchmarks.fixture import ensure_fixture

    subjects = [int(s) for s in os.environ["VISREPS_E2E_SUBJECTS"].split(",")]
    meta = ensure_fixture()
    _e2e_setup(meta, db_path=os.environ["VISREPS_E2E_DB"])

    import visreps_tpu.evals as evals

    env = os.environ.get
    cfg = _e2e_cfg(meta, subjects,
                   int(env("VISREPS_E2E_BATCH", "128")),
                   num_workers=int(env("VISREPS_E2E_WORKERS", "16")),
                   n_bootstrap=int(env("VISREPS_E2E_NBOOT", "1000")),
                   n_select=int(env("VISREPS_E2E_NSEL", "1000")),
                   model_name=env("VISREPS_E2E_MODEL", "AlexNet"),
                   srp_k=int(env("VISREPS_E2E_SRPK", "4096")))
    # K workers share one chip's HBM: retention is mandatory here even
    # though each worker's full store would fit a chip to itself.
    cfg.acts_retain = True

    t0 = time.perf_counter()
    results = evals.eval(cfg)
    wall = time.perf_counter() - t0
    return {
        "worker_wall_s": wall, "subjects": subjects, "n_results": len(results),
        **{f"phase_{k}": round(v, 1) for k, v in evals.LAST_PHASE_TIMES.items()},
    }


def stage_e2e_measured_mp(n_procs=3, batch_size=128, worker_env=None):
    """Subject-sharded multi-process measured e2e (one chip, K processes).

    The relay's host→device path is per-process latency-bound
    (~60-70 MB/s each; ~3× aggregate across 3 processes — measured,
    see NOTES_ROUND3.md), and NSD subjects' train stimuli are disjoint
    — so K processes each running the UNCHANGED `evals.eval` over a
    subject subset shard the 11 GB pixel upload K ways. Each worker
    intersects shared-test ids over the FULL subject list
    (cfg.shared_test_subjects) and retains only its phase-1 selection
    rows on device (get_activations retain_ids), so K workers fit one
    16 GB chip. Results land in ONE shared results.db and are identical
    to the single-process run by construction (per-(subject, region)
    pipelines are independent; bootstrap seeds are per-pair).

    On real (non-relay) hosts PCIe makes the per-process ceiling moot,
    but subject sharding still parallelizes decode + per-subject
    phases. Reference workload: visreps/evals.py:222-400 over
    dataloaders/neural.py:121-188.
    """
    import subprocess
    import sys
    import tempfile
    from pathlib import Path

    from visreps_tpu.benchmarks.fixture import ensure_fixture

    meta = ensure_fixture()
    n_subjects = meta["n_subjects"]
    n_procs = min(n_procs, n_subjects)
    groups = [list(range(n_subjects))[i::n_procs] for i in range(n_procs)]

    db_path = Path(tempfile.mkdtemp(prefix="bench_e2e_mp_")) / "results.db"
    procs = []
    t0 = time.perf_counter()
    for g in groups:
        env = dict(os.environ, **(worker_env or {}),
                   VISREPS_E2E_SUBJECTS=",".join(map(str, g)),
                   VISREPS_E2E_DB=str(db_path),
                   VISREPS_E2E_BATCH=str(batch_size))
        procs.append((g, subprocess.Popen(
            [sys.executable, "-m", "visreps_tpu.benchmarks.stages", "e2e_worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True)))
    workers = []
    ok = True
    for g, p in procs:
        out, _ = p.communicate()
        line = next((l for l in reversed(out.splitlines())
                     if l.startswith("{")), None)
        if p.returncode != 0 or line is None:
            ok = False
            workers.append({"subjects": g, "rc": p.returncode})
        else:
            workers.append(json.loads(line))
    wall = time.perf_counter() - t0

    import sqlite3

    n_rows = 0
    if db_path.exists():
        conn = sqlite3.connect(str(db_path))
        n_rows = conn.execute("SELECT COUNT(*) FROM results").fetchone()[0]
        conn.close()
    expected = n_subjects * len(meta["regions"])
    return {
        "e2e_measured_s": wall, "n_procs": n_procs, "db_rows": n_rows,
        "expected_rows": expected, "complete": ok and n_rows == expected,
        "n_stimuli": meta["n_stimuli"], "workers": workers,
        "db_path": str(db_path),
    }


def _workload_db():
    """Point core.db at a scratch results.db; return its path."""
    import tempfile
    from pathlib import Path

    import visreps_tpu.core.db as db
    import visreps_tpu.evals as evals

    db_path = Path(tempfile.mkdtemp(prefix="bench_workload_")) / "results.db"
    db.RESULTS_DB_PATH = db_path
    evals.RESULTS_DB_PATH = db_path
    return db_path


def stage_things_e2e(batch_size=512, num_workers=16, n_bootstrap=1000,
                     srp_k=4096):
    """MEASURED THINGS behavioral e2e (BASELINE.json configs[1] scale).

    Real `evals.eval` things-behavior branch over the on-disk fixture:
    ~26k images (1,854 concepts × 14) through the JPEG loader, all-tap
    SRP extraction, concept averaging, 20/80 concept split, layer
    selection, exact single-layer re-extraction over ALL images,
    1,854-concept-scale eval RDM + 1000-iteration bootstrap, results.db
    write. Reference workload: visreps/evals.py:94-155 over
    dataloaders/neural.py:313-335.
    """
    from visreps_tpu.benchmarks.fixture import ensure_things_fixture
    from visreps_tpu.core.config import Config

    meta = ensure_things_fixture()
    os.chdir(meta["root"])
    db_path = _workload_db()

    import visreps_tpu.evals as evals

    cfg = Config({
        "mode": "eval", "seed": 1, "neural_dataset": "things-behavior",
        "region": "N/A", "subject_idx": "N/A",
        "analysis": "rsa", "compare_method": "spearman",
        "bootstrap": True, "n_bootstrap": n_bootstrap,
        "batchsize": batch_size, "num_workers": num_workers,
        "load_model_from": "torchvision", "model_name": "AlexNet",
        "pretrained_dataset": "none", "extract_pre_and_post": True,
        "srp_k": srp_k, "uint8_transfer": True, "log_expdata": True,
    })
    cfg.epoch = -1
    cfg.cfg_id = "untrained"

    t0 = time.perf_counter()
    results = evals.eval(cfg)
    wall = time.perf_counter() - t0

    import sqlite3

    conn = sqlite3.connect(str(db_path))
    n_rows = conn.execute("SELECT COUNT(*) FROM results").fetchone()[0]
    conn.close()
    return {"things_e2e_s": wall, "n_images": meta["n_images"],
            "n_concepts": meta["n_concepts"], "n_results": len(results),
            "db_rows": n_rows,
            **{f"phase_{k}": round(v, 1)
               for k, v in evals.LAST_PHASE_TIMES.items()}}


def stage_tvsd_e2e(batch_size=512, num_workers=16, n_bootstrap=1000,
                   n_select=1000, srp_k=4096):
    """MEASURED TVSD macaque e2e: 22,248 train / 100 test × 2 monkeys ×
    V1/V4/IT, two-phase RSA + bootstraps through the real `evals.eval`.
    Reference workload: visreps/dataloaders/neural.py:393-460.
    """
    from visreps_tpu.benchmarks.fixture import ensure_tvsd_fixture
    from visreps_tpu.core.config import Config

    meta = ensure_tvsd_fixture()
    os.chdir(meta["root"])
    os.environ["BONNER_DATASETS_HOME"] = meta["bonner_home"]
    db_path = _workload_db()

    import visreps_tpu.evals as evals

    cfg = Config({
        "mode": "eval", "seed": 1, "neural_dataset": "tvsd",
        "subject_idx": [0, 1], "region": ["V1", "V4", "IT"],
        "analysis": "rsa", "compare_method": "spearman",
        "bootstrap": True, "n_bootstrap": n_bootstrap, "n_select": n_select,
        "batchsize": batch_size, "num_workers": num_workers,
        "load_model_from": "torchvision", "model_name": "AlexNet",
        "pretrained_dataset": "none", "extract_pre_and_post": True,
        "srp_k": srp_k, "uint8_transfer": True, "log_expdata": True,
    })
    cfg.epoch = -1
    cfg.cfg_id = "untrained"

    t0 = time.perf_counter()
    results = evals.eval(cfg)
    wall = time.perf_counter() - t0

    import sqlite3

    conn = sqlite3.connect(str(db_path))
    n_rows = conn.execute("SELECT COUNT(*) FROM results").fetchone()[0]
    conn.close()
    return {"tvsd_e2e_s": wall, "n_train": meta["n_train"],
            "n_test": meta["n_test"], "n_results": len(results),
            "db_rows": n_rows,
            **{f"phase_{k}": round(v, 1)
               for k, v in evals.LAST_PHASE_TIMES.items()}}


def stage_nsd_synthetic_e2e(batch_size=256, num_workers=16, n_bootstrap=1000,
                            srp_k=4096):
    """MEASURED NSD-Synthetic e2e: 220 OOD stimuli × 8 subjects × 6
    regions with the REAL results.db layer-reuse lookup (the stage
    seeds the NSD rows the way a prior NSD eval would, then times the
    synthetic branch). Reference: visreps/evals.py:404-548.
    """
    from visreps_tpu.benchmarks.fixture import ensure_nsd_synthetic_fixture
    from visreps_tpu.core.config import Config
    from visreps_tpu.core.db import save_results

    meta = ensure_nsd_synthetic_fixture()
    os.environ["NSD_SYNTHETIC_DATA_DIR"] = meta["root"]
    _workload_db()

    import visreps_tpu.data.neural as neural_mod
    import visreps_tpu.evals as evals

    pkl_to_full = {v: k for k, v in neural_mod._NSD_REGION_MAP.items()}
    regions = [pkl_to_full[r] for r in meta["regions"]]
    subjects = list(range(meta["n_subjects"]))
    cfg = Config({
        "mode": "eval", "seed": 1, "neural_dataset": "nsd_synthetic",
        "subject_idx": subjects, "region": regions,
        "analysis": "rsa", "compare_method": "spearman",
        "bootstrap": True, "n_bootstrap": n_bootstrap,
        "batchsize": batch_size, "num_workers": num_workers,
        "load_model_from": "torchvision", "model_name": "AlexNet",
        "pretrained_dataset": "none", "extract_pre_and_post": True,
        "srp_k": srp_k, "log_expdata": True,
    })
    cfg.epoch = -1
    cfg.cfg_id = "untrained"

    # Seed the NSD selections the synthetic branch looks up (run_id
    # parity with evals._lookup_nsd_best_layers).
    for region in regions:
        for subj in subjects:
            nsd_cfg = cfg.merge({
                "neural_dataset": "nsd", "analysis": "rsa",
                "subject_idx": subj, "region": region,
                "compare_method": "spearman",
            })
            save_results([{
                "layer": "conv5_post", "compare_method": "spearman",
                "score": 0.5, "ci_low": 0.45, "ci_high": 0.55,
                "analysis": "rsa", "layer_selection_scores": [],
            }], nsd_cfg)

    t0 = time.perf_counter()
    results = evals.eval(cfg)
    wall = time.perf_counter() - t0
    return {"nsd_synthetic_e2e_s": wall, "n_stimuli": meta["n_stimuli"],
            "n_results": len(results)}


def stage_cross_model(n_images=256, batch_size=64, srp_k=4096, models=None,
                      tiny_towers=False):
    """MEASURED cross-model RDM matrices (BASELINE.json configs[3]):
    CLIP ViT-L/14 + DINOv2-L + ViT-B towers + AlexNet, all-layer
    extraction over a shared stimulus set and every pairwise
    layer×layer RDM-correlation matrix. Uses pretrained HF weights when
    the local cache has them, config-initialized towers otherwise (the
    compute path is identical).
    """
    import tempfile

    from visreps_tpu.analysis.cross_model_rdms import run

    models = models or ["AlexNet", "ViTBase", "clip-vit-l14", "dinov2-l14"]
    # Weights come from the converted-params disk cache or the HF hub
    # cache (zero-egress hosts need one of them pre-seeded; see
    # models/hf_vit.converted_tower_cache_dir / VISREPS_TOWER_CACHE).
    from visreps_tpu.models.hf_vit import converted_tower_available

    towers = [m for m in models if "clip" in m.lower() or "dinov2" in m.lower()]
    pretrained = all(converted_tower_available(m) for m in towers)
    if not pretrained:
        # LOUD downgrade (VERDICT r4 items 5/9): the measured number
        # then never exercises real weight import on chip.
        print("WARNING: stage_cross_model falling back to RANDOM "
              "weights — no converted-tower or HF cache for "
              f"{[m for m in towers if not converted_tower_available(m)]}; "
              "seed the cache (VISREPS_TOWER_CACHE) to measure real "
              "weight import", flush=True)

    out = os.path.join(tempfile.mkdtemp(prefix="bench_xmodel_"),
                       "cross_model_rdms.npz")
    t0 = time.perf_counter()
    payload = run(models, f"synthetic:{n_images}", out, srp_k=srp_k,
                  batch_size=batch_size, pretrained=pretrained,
                  tiny_towers=tiny_towers)
    wall = time.perf_counter() - t0
    n_pairs = sum(1 for k in payload if k.startswith("corr__"))
    n_ok = sum(1 for k in payload if k.startswith("layers__"))
    res = {"cross_model_rdm_s": wall, "n_models": len(models),
           "n_models_ok": n_ok, "n_images": n_images,
           "n_pair_matrices": n_pairs, "pretrained_weights": pretrained}
    if not pretrained:
        res["weights_unavailable"] = True  # explicit marker, not silent
    if "model_errors" in payload:
        res["model_errors"] = "; ".join(map(str, payload["model_errors"]))[:300]
    return res


# Popen handles of timed-out sub-stages, keyed by sub-stage name: the
# grace-harvest loop probes liveness via proc.poll() (which also reaps
# the child). os.kill(pid, 0) is NOT a liveness probe for a direct
# child — it succeeds on the zombie an exited-but-unreaped orphan
# becomes, so the old pid-based loop burned the full grace window on an
# already-finished orphan and never merged its numbers (ADVICE r4).
_ORPHAN_PROCS: dict = {}


def _orphan_alive(name: str, pid: int) -> bool:
    """True iff the abandoned sub-stage is still RUNNING (reaps it if
    it exited). Falls back to waitpid for pid-only callers (tests)."""
    proc = _ORPHAN_PROCS.get(name)
    if proc is not None:
        return proc.poll() is None
    try:
        done_pid, _ = os.waitpid(pid, os.WNOHANG)  # reaps a zombie child
        return done_pid == 0
    except ChildProcessError:  # not our child / already reaped
        try:
            os.kill(pid, 0)
        except OSError:
            return False
        return True


def _run_substage(cmd, name: str, cap_s: float) -> dict:
    """Run one sub-stage in its own interpreter; return its parsed
    last-JSON-line result, or an error/timeout marker dict.

    Isolation is load-bearing twice over: a sub-stage that hard-dies —
    the relay client can exit WITHOUT a Python traceback when the
    server drops it (observed on chip: two silent deaths at the same
    extraction point) — must not take the remaining measurements with
    it; and a timed-out sub-stage is ABANDONED, never killed (killing
    a mid-compile client wedges the remote-compile relay for ~1 h).
    """
    import subprocess
    import sys
    import tempfile

    out = tempfile.NamedTemporaryFile("w+", suffix=f"_{name}.out", delete=False)
    err = tempfile.NamedTemporaryFile("w+", suffix=f"_{name}.err", delete=False)
    proc = subprocess.Popen(cmd, stdout=out, stderr=err, text=True,
                            start_new_session=True)
    # The child holds its own descriptors; keeping ours open leaks one
    # fd pair per sub-stage (ADVICE r4).
    out.close(), err.close()
    deadline = time.monotonic() + cap_s
    while proc.poll() is None and time.monotonic() < deadline:
        time.sleep(1)
    if proc.poll() is None:
        # Abandoned, still running: it may finish into its temp file —
        # report where, so the grace harvest (or a human) can
        # late-harvest; keep the Popen for a real liveness probe.
        _ORPHAN_PROCS[name] = proc
        return {f"{name}_timeout_s": cap_s, f"{name}_orphan_pid": proc.pid,
                f"{name}_orphan_out": out.name,
                f"{name}_orphan_err": err.name}
    result = None
    with open(out.name) as f:
        for line in reversed(f.read().strip().splitlines()):
            try:
                result = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if result is None:
        with open(err.name) as f:
            stderr = f.read()
        for tmp in (out.name, err.name):
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return {f"{name}_error":
                f"rc={proc.returncode}: {stderr.strip()[-160:] or 'no output'}"}
    result.pop("stage", None)
    for tmp in (out.name, err.name):
        try:
            os.unlink(tmp)
        except OSError:
            pass
    return result


def stage_workloads():
    """THINGS + TVSD + NSD-Synthetic + cross-model, each ISOLATED in
    its own subprocess, with a CUMULATIVE JSON line printed after each
    — so a crash, silent relay-client death, or timeout in one
    workload costs only that workload's number, and an outer timeout
    (stage abandoned, later late-harvested once the orphan exits)
    still delivers every measurement that completed.
    """
    import sys

    scale = float(os.environ.get("VISREPS_WORKLOAD_SUBCAP_SCALE", "1"))
    # Fastest-first (measured warm-cache walls: 83 / 178 / ~100-330 /
    # ~250-440 s): a driver-budget timeout then preserves the most
    # completed sub-measurements via the cumulative snapshots.
    sub = [
        ("nsd_synthetic", "nsd_synthetic_e2e", 420),
        ("things", "things_e2e", 600),
        ("tvsd", "tvsd_e2e", 600),
        ("cross_model", "cross_model", 600),
    ]
    acc: dict = {}
    for name, stage, cap in sub:
        res = _run_substage(
            [sys.executable, "-m", "visreps_tpu.benchmarks.stages", stage],
            name, cap * scale)
        # Namespace each sub-stage's extras: generic keys (n_results,
        # db_rows, phase_*) collide across the four workloads and the
        # later one would silently overwrite the earlier's numbers.
        for k, v in res.items():
            acc[k if k.startswith(name) else f"{name}_{k}"] = v
        print(json.dumps({"stage": "workloads", "cumulative": True, **acc}), flush=True)

    # Grace-harvest inner orphans: a sub-stage abandoned at its cap
    # (relay stall) often finishes minutes later into its temp file —
    # merge its real numbers over the timeout markers before the final
    # line rather than losing them (a stalled TVSD measured 333 s
    # against a healthy ~100 s; the cap can't be sized for stalls).
    pending = {name: acc[f"{name}_orphan_pid"] for name, _, _ in sub
               if f"{name}_orphan_pid" in acc}
    deadline = time.monotonic() + float(
        os.environ.get("VISREPS_WORKLOAD_GRACE_S", "420"))
    while pending and time.monotonic() < deadline:
        for name, pid in list(pending.items()):
            if _orphan_alive(name, pid):
                continue  # still running — never kill it
            del pending[name]
            out_path = acc[f"{name}_orphan_out"]
            try:
                with open(out_path) as f:
                    lines = f.read().strip().splitlines()
            except OSError:
                continue
            for line in reversed(lines):
                try:
                    late = json.loads(line)
                except json.JSONDecodeError:
                    continue
                late.pop("stage", None)
                err_path = acc.get(f"{name}_orphan_err")
                for k in (f"{name}_timeout_s", f"{name}_orphan_pid",
                          f"{name}_orphan_out", f"{name}_orphan_err"):
                    acc.pop(k, None)
                for k, v in late.items():
                    acc[k if k.startswith(name) else f"{name}_{k}"] = v
                for tmp in (out_path, err_path):
                    if tmp:
                        try:
                            os.unlink(tmp)
                        except OSError:
                            pass
                print(json.dumps({"stage": "workloads", "cumulative": True,
                                  **acc}), flush=True)
                break
        if pending:
            time.sleep(5)
    return acc


def stage_kernels():
    """All kernel/throughput micro-benchmarks in ONE process.

    One jax init + one warm device instead of seven interpreter
    startups; prints a cumulative JSON line after each measurement
    (same late-harvest contract as stage_workloads).
    """
    def _pick(res, **renames):
        out = {}
        for src, dst in renames.items():
            if src in res and res[src] is not None:
                out[dst] = res[src]
        return out

    def _train_bench():
        r = stage_train()
        out = {"train_images_per_sec_per_chip": round(
            r["train_images_per_sec"], 1),
            **_pick(r, train_step_tflops="train_step_tflops",
                    train_step_mfu="train_step_mfu")}
        # VERDICT r4 item 7: f32 step under 20% of the bf16 peak → A/B
        # the bfloat16-matmul step (f32 master params/stats).
        if r.get("train_step_mfu", 1.0) < 0.2:
            rb = stage_train(compute_dtype="bf16")
            out["train_bf16_images_per_sec"] = round(
                rb["train_images_per_sec"], 1)
            out.update(_pick(rb, train_step_mfu="train_bf16_mfu"))
        return out

    def _rdm_bench():
        r = stage_rdm()
        return {"rdm_10kx10k_ms": round(r["rdm_ms"], 1),
                **_pick(r, rdm_tflops="rdm_tflops", rdm_mfu="rdm_mfu")}

    def _ridge_bench():
        r = stage_ridge()
        return {"ridge_cv_s": round(r["ridge_cv_s"], 2),
                **_pick(r, ridge_tflops="ridge_tflops",
                        ridge_mfu="ridge_mfu")}

    sub = [
        ("kendall", lambda: {"kendall_bootstraps_per_sec": round(
            stage_bootstrap(method="kendall", chunk=250)["bootstraps_per_sec"], 1)}),
        ("bootstrap", lambda: {"rsa_bootstraps_per_sec": round(
            stage_bootstrap()["bootstraps_per_sec"], 1)}),
        ("extract", lambda: {"extract_images_per_sec_per_chip": round(
            stage_extract()["images_per_sec"], 1)}),
        ("selection_device", lambda: {"layer_selection_s_per_subject": round(
            stage_selection_device()["selection_s"], 3)}),
        ("rdm_pallas", lambda: (lambda r: {
            "rdm_pallas_bf16_ms": round(r["rdm_pallas_bf16_ms"], 1),
            "rdm_pallas_f32_ms": round(r["rdm_pallas_f32_ms"], 1)})(
                stage_rdm_pallas())),
        ("rdm", _rdm_bench),
        ("train", _train_bench),
        ("ridge", _ridge_bench),
        ("h2d", lambda: {"h2d_MB_per_s": round(stage_h2d()["h2d_MB_per_s"], 1)}),
        ("decode", lambda: {"host_decode_images_per_sec": round(
            stage_decode()["decode_images_per_sec"], 1)}),
    ]
    acc: dict = {}
    for name, fn in sub:
        try:
            acc.update(fn())
        except Exception as e:
            acc[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps({"stage": "kernels", "cumulative": True, **acc}), flush=True)
    return acc


def stage_decode(n_images=4096, num_workers=16, batch_size=256):
    """Host JPEG decode+transform throughput through the real loader."""
    from visreps_tpu.benchmarks.fixture import ensure_fixture
    from visreps_tpu.data.loader import make_stimuli_loader
    from visreps_tpu.data.transforms import get_transform

    meta = ensure_fixture()
    files = sorted(os.listdir(meta["jpeg_dir"]))[:n_images]
    stimuli = {f: os.path.join(meta["jpeg_dir"], f) for f in files}
    dl = make_stimuli_loader(stimuli, get_transform("imgnet", normalize=False),
                             batch_size, num_workers)
    n = 0
    t0 = time.perf_counter()
    for x, keys in dl:
        n += len(keys)
    t = time.perf_counter() - t0
    return {"decode_images_per_sec": n / t, "n_images": n,
            "num_workers": num_workers}


def stage_h2d(batch_size=256, iters=12):
    """Host→device transfer throughput for uint8 image batches."""
    import jax
    import jax.numpy as jnp

    x = np.random.default_rng(0).integers(
        0, 255, (batch_size, 224, 224, 3), dtype=np.uint8)
    a = jax.device_put(x)
    _ = float(jnp.sum(a[0, 0, 0]))  # warm
    t0 = time.perf_counter()
    moved = 0
    for _ in range(iters):
        a = jax.device_put(x)
        _ = float(jnp.sum(a[0, 0, 0]))
        moved += x.nbytes
    t = time.perf_counter() - t0
    return {"h2d_MB_per_s": moved / t / 1e6,
            "h2d_images_per_sec": batch_size * iters / t}


def stage_h2d_streams(batch_size=256, iters=24,
                      stream_counts=(1, 2, 3, 4, 6)):
    """In-process H2D scaling vs concurrent upload-thread count.

    The extractor's _device_feed pipelines uploads on a small thread
    pool (2 threads / depth 3 → ~70 MB/s through the relay, vs ~34
    single-stream). This stage maps throughput against the number of
    in-flight device_put calls to find the per-process ceiling — the
    knob that sets the measured-e2e extraction floor.
    """
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    x = np.random.default_rng(0).integers(
        0, 255, (batch_size, 224, 224, 3), dtype=np.uint8)
    _ = float(jnp.sum(jax.device_put(x)[0, 0, 0]))  # warm

    out = {}
    for s in stream_counts:
        with ThreadPoolExecutor(max_workers=s) as ex:
            t0 = time.perf_counter()
            futs = [ex.submit(jax.device_put, x) for _ in range(iters)]
            arrs = [f.result() for f in futs]
            _ = float(jnp.sum(jnp.stack([a[0, 0, 0, 0] for a in arrs])))
            t = time.perf_counter() - t0
        del arrs
        out[f"h2d_MB_per_s_{s}streams"] = round(x.nbytes * iters / t / 1e6, 1)
    best = max(out, key=out.get)
    return {**out, "best_streams": int(best.split("_")[-1][:-7]),
            "h2d_MB_per_s": out[best]}


def stage_feed_probe(batch_size=512, n_batches=40):
    """Upload-only wall of the e2e's exact feed path (no dispatches).

    Streams n_batches × batch_size uint8 224×224×3 batches through
    FeatureExtractor._device_feed (same thread pool / depth / padding
    as extraction) and blocks on the last upload. Against the measured
    extraction wall this separates pure H2D from the dispatch-
    interference cost: extraction at 73k moved 11 GB in 296-371 s
    (30-40 MB/s effective) while the 3-stream put sweep sustains
    ~72 MB/s — this probe tells whether the gap is the feed path
    itself or the interleaved _srp_step dispatches.
    """
    import jax
    import jax.numpy as jnp

    from visreps_tpu.models.extractor import FeatureExtractor
    from visreps_tpu.models.zoo import init_model

    state = init_model("TinyCustomCNN", 10, seed=0, input_size=64)
    ex = FeatureExtractor(state, ["conv1"], extract_pre_and_post=False,
                          srp_k=64, batch_size=batch_size, image_size=224)

    rng = np.random.RandomState(0)
    batches = [rng.randint(0, 256, (batch_size, 224, 224, 3), np.uint8)
               for _ in range(4)]

    def loader():
        for i in range(n_batches):
            yield batches[i % 4], [f"s{i}_{j}" for j in range(batch_size)]

    handles = []
    t0 = time.perf_counter()
    for xd, keys, n in ex._device_feed(loader()):
        handles.append(xd)
    jax.block_until_ready(handles)
    wall = time.perf_counter() - t0
    gb = n_batches * batch_size * 224 * 224 * 3 / 1e9
    del handles
    # Same bytes with one dispatch interleaved per batch (the e2e's
    # actual extraction structure) — the delta vs the pure feed is the
    # dispatch-interference cost.
    sums = []
    t0 = time.perf_counter()
    for xd, keys, n in ex._device_feed(loader()):
        sums.append(jnp.sum(xd, dtype=jnp.int32))
    jax.block_until_ready(sums)
    interleaved_s = time.perf_counter() - t0
    return {"feed_probe_s": round(wall, 1), "feed_gb": round(gb, 2),
            "feed_MB_per_s": round(gb * 1000 / wall, 1),
            "feed_interleaved_s": round(interleaved_s, 1),
            "loader_s": round(ex._feed_stats["loader_s"], 1),
            "upload_wait_s": round(ex._feed_stats["upload_wait_s"], 1)}


def stage_extract_probe(batch_size=512, n_batches=40, superbatch=1,
                        out_bf16=True):
    """The e2e extraction loop in miniature: synthetic uint8 batches
    through the REAL AlexNet get_activations (store=device), reporting
    the enqueue/drain/loader/upload/dispatch decomposition. Sweeping
    n_batches separates per-batch cost from store-size effects (HBM
    pressure at the 73k-scale 8.4 GB store); superbatch exercises the
    K-stacked dispatch path."""
    import os

    from visreps_tpu.models.extractor import FeatureExtractor
    from visreps_tpu.models.zoo import init_model

    state = init_model("AlexNet", 1000, seed=0)
    ex = FeatureExtractor(
        state, ["conv1", "conv2", "conv3", "conv4", "conv5", "fc1", "fc2"],
        extract_pre_and_post=True, srp_k=4096, batch_size=batch_size,
        image_size=224)

    rng = np.random.RandomState(0)
    batches = [rng.randint(0, 256, (batch_size, 224, 224, 3), np.uint8)
               for _ in range(4)]

    def loader():
        for i in range(n_batches):
            yield batches[i % 4], [f"s{i}_{j}" for j in range(batch_size)]

    prev = os.environ.get("VISREPS_SUPERBATCH")
    os.environ["VISREPS_SUPERBATCH"] = str(superbatch)
    try:
        t0 = time.perf_counter()
        acts, ids = ex.get_activations(loader(), store="device")
        wall = time.perf_counter() - t0
    finally:
        if prev is None:
            os.environ.pop("VISREPS_SUPERBATCH", None)
        else:
            os.environ["VISREPS_SUPERBATCH"] = prev
    n_img = len(ids)
    del acts
    return {"extract_probe_s": round(wall, 1), "n_images": n_img,
            "superbatch": superbatch,
            "images_per_sec": round(n_img / wall, 1),
            **ex.last_extract_times}


def stage_step_probe(batch_size=512, out_bf16=1):
    """Per-call cost of the real _srp_step, isolated.

    Times: the compile call, 6 serialized warm calls (dispatch +
    block), and 6 async dispatches (host-side call wall only) against
    DISTINCT pre-uploaded uint8 batches. Pins down why the extraction
    loop measured ~2.4 s per call while the kernels stage measures the
    same function at ~62 ms/batch."""
    import jax

    from visreps_tpu.models.extractor import FeatureExtractor
    from visreps_tpu.models.zoo import init_model

    state = init_model("AlexNet", 1000, seed=0)
    ex = FeatureExtractor(
        state, ["conv1", "conv2", "conv3", "conv4", "conv5", "fc1", "fc2"],
        extract_pre_and_post=True, srp_k=4096, batch_size=batch_size,
        image_size=224)
    proj = ex._proj_dict()
    rng = np.random.RandomState(0)
    xs = [jax.device_put(rng.randint(0, 256, (batch_size, 224, 224, 3),
                                     np.uint8)) for _ in range(7)]
    jax.block_until_ready(xs)
    ob = bool(out_bf16)

    t0 = time.perf_counter()
    r = ex._srp_step(state.variables, proj, xs[0], out_bf16=ob)
    jax.block_until_ready(list(r.values()))
    compile_s = time.perf_counter() - t0

    warm = []
    for i in range(1, 7):
        t0 = time.perf_counter()
        r = ex._srp_step(state.variables, proj, xs[i], out_bf16=ob)
        jax.block_until_ready(list(r.values()))
        warm.append(round(time.perf_counter() - t0, 3))

    disp = []
    outs = []
    for i in range(1, 7):
        t0 = time.perf_counter()
        outs.append(ex._srp_step(state.variables, proj, xs[i], out_bf16=ob))
        disp.append(round(time.perf_counter() - t0, 3))
    t0 = time.perf_counter()
    jax.block_until_ready([list(o.values()) for o in outs])
    tail_s = time.perf_counter() - t0

    return {"compile_call_s": round(compile_s, 2), "warm_serialized_s": warm,
            "async_dispatch_s": disp, "async_tail_s": round(tail_s, 2),
            "out_bf16": ob}


def stage_phase1_probe(n=73000, k=4096, n_taps=14, n_sel=1000, n_regions=6,
                       n_subjects=8, n_voxels=512):
    """Decompose the e2e's phase-1 cost at workload scale.

    Builds the device-resident bf16 tap store (14 × 73000 × 4096, the
    shape the real eval holds after extraction), then times the fused
    per-subject selection program (analysis/rsa.
    _select_scores_multipair_fused) three ways: cold (compile + run),
    warm single call, and the real 8-subject loop with 3-deep pipelined
    fetches (the exact evals.py structure). Separates compile cost,
    per-dispatch relay latency, and host staging from one another —
    phase-1 wall has been the most variable e2e phase across rounds
    (7.4→159 s for identical code).
    """
    import jax
    import jax.numpy as jnp

    from visreps_tpu.analysis.rsa import _select_scores_multipair_fused

    taps = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (n, k), jnp.bfloat16)
        for i in range(n_taps))
    _force(taps[-1][:1])

    rng = np.random.RandomState(0)
    rows_all = [np.sort(rng.choice(n, n_sel, replace=False)).astype(np.int32)
                for _ in range(n_subjects)]
    neural_all = [tuple(rng.randn(n_sel, n_voxels).astype(np.float32)
                        for _ in range(n_regions))
                  for _ in range(n_subjects)]

    def call(s):
        return _select_scores_multipair_fused(
            taps, jnp.asarray(rows_all[s]),
            tuple(jnp.asarray(v) for v in neural_all[s]), "spearman", False)

    t0 = time.perf_counter()
    np.asarray(jax.device_get(call(0)))
    cold_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    np.asarray(jax.device_get(call(1)))
    warm_s = time.perf_counter() - t0

    # The evals.py structure: dispatch ahead, fetch 3 behind.
    from collections import deque

    pending: deque = deque()
    t0 = time.perf_counter()
    for s in range(n_subjects):
        pending.append(call(s))
        if len(pending) >= 3:
            np.asarray(jax.device_get(pending.popleft()))
    while pending:
        np.asarray(jax.device_get(pending.popleft()))
    loop_s = time.perf_counter() - t0

    return {"phase1_cold_s": round(cold_s, 2), "phase1_warm_call_s": round(warm_s, 2),
            "phase1_loop8_s": round(loop_s, 2),
            "per_subject_s": round(loop_s / n_subjects, 2)}


def stage_train(batch_size=256, iters=8, compute_dtype=None):
    """CustomCNN train-step throughput (fwd+bwd+adamw, 224 images).

    Context: the reference trains the 87-model matrix at bs 32 on one
    A100 within 8 h/model (SURVEY.md §6). compute_dtype="bf16" A/Bs
    the bfloat16-matmul step (f32 master params/stats — trainer flag).
    """
    import jax
    import jax.numpy as jnp

    from visreps_tpu.core.config import Config
    from visreps_tpu.models.zoo import init_model
    from visreps_tpu.train.optim import setup_optimizer
    from visreps_tpu.train.trainer import make_train_step

    cfg = Config({
        "optimizer": "adamw", "learning_rate": 5e-4, "weight_decay": 1e-3,
        "grad_clip": 1.0, "lr_scheduler": "cosineannealinglr",
        "num_epochs": 20, "warmup_epochs": 3,
    })
    state = init_model("CustomCNN", 1000, seed=0)
    tx, _ = setup_optimizer(state.params, cfg, steps_per_epoch=100)
    step = make_train_step(state.module, tx, compute_dtype=compute_dtype)
    opt = tx.init(state.params)

    images = jax.random.normal(jax.random.PRNGKey(0), (batch_size, 224, 224, 3))
    labels = jnp.arange(batch_size) % 1000
    key = jax.random.PRNGKey(1)

    # FLOP count BEFORE the timing loop donates the buffers; step is
    # already jitted, so .lower hits the same executable cache entry.
    flops = _cost_flops(step, state.params, state.batch_stats, opt,
                        images, labels, key)

    params, stats = state.params, state.batch_stats
    # warmup/compile
    params, stats, opt, loss, gn = step(params, stats, opt, images, labels, key)
    _force(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, stats, opt, loss, gn = step(params, stats, opt, images, labels, key)
    _force(loss)
    t = (time.perf_counter() - t0) / iters
    return {"train_images_per_sec": batch_size / t, "step_ms": t * 1000,
            "epoch_minutes_imagenet": 1_009_124 / (batch_size / t) / 60,
            "compute_dtype": compute_dtype or "f32",
            **_mfu_fields("train_step", flops, t)}


STAGES = {
    "train": stage_train,
    "extract": stage_extract,
    "extract_probe": stage_extract_probe,
    "step_probe": stage_step_probe,
    "extract_bf16": lambda: stage_extract(compute_dtype="bf16"),
    "forward": stage_forward,
    "rdm": stage_rdm,
    "rdm_pallas": stage_rdm_pallas,
    "bootstrap": stage_bootstrap,
    "bootstrap_kendall": lambda: stage_bootstrap(n=1000, n_bootstrap=1000, method="kendall", chunk=250),
    "selection": stage_selection,
    "selection_device": stage_selection_device,
    "phase1_probe": stage_phase1_probe,
    "feed_probe": stage_feed_probe,
    "ridge": stage_ridge,
    # Default "high": the CV sweep's per-alpha matmuls only rank
    # alphas; measured scores match "highest" to 4 decimals on chip
    # while landing the 48-pair full-NSD eval at ~277 s (vs ~390).
    "encoding_e2e": stage_encoding_e2e,
    "encoding_e2e_highest": lambda: stage_encoding_e2e(cv_precision="highest"),
    "encoding_delta": stage_encoding_delta,
    "e2e_measured": stage_e2e_measured,
    "e2e_measured_mp": stage_e2e_measured_mp,
    "e2e_worker": stage_e2e_worker,
    "things_e2e": stage_things_e2e,
    "tvsd_e2e": stage_tvsd_e2e,
    "nsd_synthetic_e2e": stage_nsd_synthetic_e2e,
    "cross_model": stage_cross_model,
    "workloads": stage_workloads,
    "kernels": stage_kernels,
    "decode": stage_decode,
    "h2d": stage_h2d,
    "h2d_streams": stage_h2d_streams,
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("stage", choices=list(STAGES))
    parser.add_argument("kwargs", nargs="*",
                        help="stage overrides as k=v (ints parsed)")
    args = parser.parse_args(argv)
    kw = {}
    for pair in args.kwargs:
        k, v = pair.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            pass
        kw[k] = v
    result = STAGES[args.stage](**kw)
    print(json.dumps({"stage": args.stage, **result}))


if __name__ == "__main__":
    main()
