"""pca_k reconstruction sweep: how much brain alignment survives a
top-k-PC reconstruction of the best layer's activations.

Mirrors the reference's experiments/reconstruction_analysis/
run_reconstruction.py: skip Phase-1 selection by querying results.db
for each (region, subject)'s best layer from the 1000-way baseline
eval, re-extract each unique best layer ONCE per seed, then sweep
pca_k in 1..15 — reconstruct, rebuild RDMs, score + bootstrap CI,
INSERT OR REPLACE into results.db (reconstruct_from_pcs=1 rows).

TPU redesign: the 1000-iteration bootstrap per (region, subject,
pca_k) runs as one batched device program (ops/bootstrap) instead of
the reference's serial loop (run_reconstruction.py:143-158).

Usage:
  python experiments/reconstruction_analysis/run_reconstruction.py \
      --checkpoint-dir /path/ckpts --datasets nsd tvsd --seeds 1 2 3
"""
from __future__ import annotations

import argparse
import sqlite3
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax.numpy as jnp

from visreps_tpu.core.config import Config
from visreps_tpu.core import db as core_db
from visreps_tpu.core.logging import rprint
from visreps_tpu.data.loader import make_stimuli_loader
from visreps_tpu.data.neural import get_neural_loader, load_all_nsd_data, load_all_tvsd_data
from visreps_tpu.data.transforms import get_transform
from visreps_tpu.evals import _load_cfg
from visreps_tpu.analysis.alignment import AlignmentData, prepare_concept_alignment
from visreps_tpu.analysis.rsa import concept_average_exact
from visreps_tpu.models.extractor import configure_feature_extractor
from visreps_tpu.models.zoo import load_model
from visreps_tpu.ops.bootstrap import bootstrap_rdm_correlation, percentile_ci
from visreps_tpu.ops.pca import reconstruct_from_pcs
from visreps_tpu.ops.rdm import compute_rdm, compute_rdm_correlation

DATASET_CONFIG = {
    "nsd": {"regions": ["early visual stream", "ventral visual stream"],
            "subjects": list(range(8))},
    "tvsd": {"regions": ["V1", "V4", "IT"], "subjects": [0, 1]},
    "things-behavior": {"regions": ["N/A"], "subjects": ["N/A"]},
}


def query_best_layers(neural_dataset: str, seed: int, cfg_id, checkpoint_dir: str,
                      compare_method: str) -> dict:
    """(region, subject_idx_str) → best layer from baseline rows.

    Reference: run_reconstruction.py:77-105.
    """
    conn = sqlite3.connect(str(core_db.RESULTS_DB_PATH))
    rows = conn.execute(
        """SELECT region, subject_idx, layer, score FROM results
           WHERE cfg_id = ? AND checkpoint_dir = ? AND reconstruct_from_pcs = 0
             AND analysis = 'rsa' AND compare_method = ?
             AND neural_dataset = ? AND seed = ?""",
        (str(cfg_id), checkpoint_dir, compare_method, neural_dataset, str(seed)),
    ).fetchall()
    conn.close()
    if not rows:
        raise ValueError(
            f"No baseline results for {neural_dataset} seed={seed}. "
            "Run the standard 1000-way evaluation first."
        )
    best: dict = {}
    for region, subj, layer, score in rows:
        key = (region, str(subj))
        if key not in best or score > best[key][1]:
            best[key] = (layer, score)
    return {k: v[0] for k, v in best.items()}


def build_cfg(args, seed: int, neural_dataset: str) -> Config:
    cfg = Config({
        "mode": "eval", "neural_dataset": neural_dataset,
        "return_nodes": ["conv1", "conv2", "conv3", "conv4", "conv5", "fc1", "fc2"],
        "extract_pre_and_post": True, "reconstruct_from_pcs": True, "pca_k": 1,
        "load_model_from": "checkpoint", "seed": seed, "cfg_id": args.cfg_id,
        "checkpoint_dir": args.checkpoint_dir,
        "checkpoint_model": args.checkpoint_model,
        "analysis": "rsa", "compare_method": args.compare_method,
        "bootstrap": True, "n_bootstrap": args.n_bootstrap,
        "batchsize": args.batch_size, "num_workers": args.num_workers,
        "log_expdata": True, "verbose": False,
    })
    return _load_cfg(cfg)


def score_with_ci(model_rdm, neural_rdm, method: str, n_bootstrap: int):
    point = compute_rdm_correlation(model_rdm, neural_rdm, correlation=method)
    boot = bootstrap_rdm_correlation(model_rdm, neural_rdm,
                                     n_bootstrap=n_bootstrap, seed=42, method=method)
    lo, hi = percentile_ci(boot)
    return point, lo, hi, boot.tolist()


def _save(cfg, layer, score, lo, hi, boot):
    core_db.save_results([{
        "layer": layer, "compare_method": cfg.compare_method, "score": score,
        "ci_low": lo, "ci_high": hi, "analysis": "rsa",
        "layer_selection_scores": [], "bootstrap_scores": boot,
    }], cfg)


def run_nsd_tvsd(args, neural_dataset: str):
    ds = DATASET_CONFIG[neural_dataset]
    regions, subjects = ds["regions"], ds["subjects"]

    for seed in args.seeds:
        rprint(f"\n  {neural_dataset.upper()} | seed {seed}", style="info")
        best_layers = query_best_layers(
            neural_dataset, seed, args.cfg_id, args.checkpoint_dir, args.compare_method
        )

        cfg = build_cfg(args, seed, neural_dataset)
        state = load_model(cfg)
        extractor = configure_feature_extractor(cfg, state)

        loader_fn = load_all_nsd_data if neural_dataset == "nsd" else load_all_tvsd_data
        all_data = loader_fn(cfg, subjects=subjects, regions=regions)
        shared_test_ids = all_data["shared_test_ids"]
        neural = all_data["neural"]
        test_stimuli = {sid: all_data["stimuli"][sid]
                        for sid in shared_test_ids if sid in all_data["stimuli"]}
        dl_test = make_stimuli_loader(test_stimuli, get_transform("imgnet"),
                                      cfg.batchsize, cfg.num_workers)

        needed = sorted({best_layers[(r, str(s))] for r in regions for s in subjects})
        raw_acts = {l: extractor.extract_single_layer(dl_test, l, shared_test_ids)[0]
                    for l in needed}

        neural_rdms = {
            r: {s: compute_rdm(jnp.asarray(np.stack(
                    [neural[r][s]["test"][sid] for sid in shared_test_ids
                     if sid in neural[r][s]["test"]]).squeeze().astype(np.float32)))
                for s in subjects}
            for r in regions
        }

        for pca_k in args.pca_k:
            rprint(f"  --- pca_k = {pca_k} ---", style="info")
            model_rdms = {
                l: compute_rdm(jnp.asarray(np.asarray(
                    reconstruct_from_pcs({l: a}, pca_k)[l], np.float32)))
                for l, a in raw_acts.items()
            }
            for region in regions:
                for subj in subjects:
                    layer = best_layers[(region, str(subj))]
                    score, lo, hi, boot = score_with_ci(
                        model_rdms[layer], neural_rdms[region][subj],
                        args.compare_method, cfg.n_bootstrap,
                    )
                    rprint(f"    {region} subj {subj} | {layer} = {score:.4f} "
                           f"[{lo:.4f}, {hi:.4f}]", style="highlight")
                    save_cfg = cfg.merge({"pca_k": pca_k, "region": region,
                                          "subject_idx": subj,
                                          "reconstruct_from_pcs": True})
                    _save(save_cfg, layer, score, lo, hi, boot)


def run_things(args):
    for seed in args.seeds:
        rprint(f"\n  THINGS-BEHAVIOR | seed {seed}", style="info")
        best_layers = query_best_layers(
            "things-behavior", seed, args.cfg_id, args.checkpoint_dir,
            args.compare_method,
        )
        best_layer = best_layers[("N/A", "N/A")]

        cfg = build_cfg(args, seed, "things-behavior")
        cfg.region = "N/A"
        cfg.subject_idx = "N/A"
        state = load_model(cfg)
        extractor = configure_feature_extractor(cfg, state)
        neural_data, dl = get_neural_loader(cfg)

        acts, ids = extractor.get_activations(dl)
        all_concepts = prepare_concept_alignment(cfg, acts, neural_data, ids)
        del acts

        rng = np.random.RandomState(42)
        n_concepts = all_concepts.neural.shape[0]
        perm = rng.permutation(n_concepts)
        eval_idx = perm[int(n_concepts * 0.2):]
        evaluation = AlignmentData(
            activations={l: a[eval_idx] for l, a in all_concepts.activations.items()},
            neural=all_concepts.neural[eval_idx],
            stimulus_ids=[all_concepts.stimulus_ids[i] for i in eval_idx],
            concept_image_ids={
                all_concepts.stimulus_ids[i]:
                    all_concepts.concept_image_ids[all_concepts.stimulus_ids[i]]
                for i in eval_idx
            },
        )
        del all_concepts

        raw_acts, raw_ids = extractor.extract_single_layer(dl, best_layer)
        neural_rdm = compute_rdm(jnp.asarray(evaluation.neural))

        for pca_k in args.pca_k:
            recon = np.asarray(reconstruct_from_pcs({best_layer: raw_acts}, pca_k)[best_layer])
            eval_acts = concept_average_exact(recon, raw_ids, evaluation)
            model_rdm = compute_rdm(jnp.asarray(eval_acts.astype(np.float32)))
            score, lo, hi, boot = score_with_ci(
                model_rdm, neural_rdm, args.compare_method, cfg.n_bootstrap
            )
            rprint(f"    pca_k={pca_k} {best_layer} = {score:.4f} [{lo:.4f}, {hi:.4f}]",
                   style="highlight")
            save_cfg = cfg.merge({"pca_k": pca_k, "reconstruct_from_pcs": True})
            _save(save_cfg, best_layer, score, lo, hi, boot)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--datasets", nargs="*",
                        default=["nsd", "tvsd", "things-behavior"],
                        choices=list(DATASET_CONFIG))
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--checkpoint-model", default="checkpoint_epoch_20.pth")
    parser.add_argument("--cfg-id", default=1000)
    parser.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    parser.add_argument("--pca-k", type=int, nargs="+", default=list(range(1, 16)))
    parser.add_argument("--compare-method", default="spearman")
    parser.add_argument("--n-bootstrap", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--num-workers", type=int, default=16)
    args = parser.parse_args(argv)

    for ds in args.datasets:
        rprint(f"\n  RECONSTRUCTION ANALYSIS: {ds.upper()}", style="info")
        if ds in ("nsd", "tvsd"):
            run_nsd_tvsd(args, ds)
        else:
            run_things(args)


if __name__ == "__main__":
    main()
