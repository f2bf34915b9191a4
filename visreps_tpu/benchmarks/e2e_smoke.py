"""End-to-end eval orchestration smoke on real hardware.

Runs the full two-phase NSD RSA path (and the encoding path) against
synthetic in-memory data — the same flow as tests/test_evals_integration
but on the default (TPU) backend, exercising device-resident
activations, batched selection, the sort-free bootstrap, and DB writes.

Usage: python -m visreps_tpu.benchmarks.e2e_smoke
"""
from __future__ import annotations

import json
import tempfile
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import visreps_tpu.evals as evals
from visreps_tpu.core import db as core_db
from visreps_tpu.core.config import Config


def synthetic_all_data(rng, n_train=64, n_test=20, n_vox=32, subjects=(0, 1),
                       region="early visual stream", size=64):
    stimuli, neural = {}, {region: {}}
    train_ids = [str(i) for i in range(n_train)]
    test_ids = [str(1000 + i) for i in range(n_test)]
    for sid in train_ids + test_ids:
        stimuli[sid] = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    for subj in subjects:
        neural[region][subj] = {
            "train": {sid: rng.randn(n_vox).astype(np.float32) for sid in train_ids},
            "test": {sid: rng.randn(n_vox).astype(np.float32) for sid in test_ids},
        }
    return {
        "regions": [region], "subjects": list(subjects), "neural": neural,
        "stimuli": stimuli, "shared_test_ids": test_ids,
    }


def main():
    rng = np.random.RandomState(7)
    all_data = synthetic_all_data(rng)
    evals.load_all_nsd_data = lambda cfg, subjects=None, regions=None: all_data
    evals.TORCHVISION_RETURN_NODES["TinyCustomCNN"] = ["conv4", "conv5", "fc1"]
    tmp = tempfile.mkdtemp()
    core_db.RESULTS_DB_PATH = evals.RESULTS_DB_PATH = __import__("pathlib").Path(tmp) / "results.db"

    cfg = Config({
        "mode": "eval", "seed": 1, "neural_dataset": "nsd",
        "subject_idx": [0, 1], "region": ["early visual stream"],
        "analysis": "rsa", "compare_method": "spearman",
        "bootstrap": True, "n_bootstrap": 100, "batchsize": 16,
        "num_workers": 2, "load_model_from": "torchvision",
        "model_name": "TinyCustomCNN", "pretrained_dataset": "none",
        "extract_pre_and_post": True, "srp_k": 128, "log_expdata": True,
        "n_select": 48,
    })

    t0 = time.time()
    rsa_results = evals.eval(cfg)
    t_rsa = time.time() - t0

    t0 = time.time()
    enc_results = evals.eval(
        cfg.merge({"analysis": "encoding_score", "compare_method": "pearson",
                   "n_bootstrap": 50})
    )
    t_enc = time.time() - t0

    ok = (
        len(rsa_results) == 2 and len(enc_results) == 2
        and all(np.isfinite(r["score"]) for r in rsa_results + enc_results)
    )
    print(json.dumps({
        "smoke": "e2e", "ok": bool(ok),
        "rsa_seconds": round(t_rsa, 1), "encoding_seconds": round(t_enc, 1),
        "rsa_layers": [r["layer"] for r in rsa_results],
        "rsa_scores": [round(r["score"], 4) for r in rsa_results],
    }))


if __name__ == "__main__":
    main()
