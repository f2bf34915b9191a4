"""Semantic alignment: model representations vs LLM caption embeddings.

Port of reference experiments/semantic_analysis/semantic_alignment.py:
score each extraction layer's RSA alignment against "gemini"
caption-embedding vectors of the NSD stimuli (an .npz with
stimulus_ids + gemini_representations), instead of voxel responses.

Parity note: the reference script imports
`compute_neural_alignment` / `prepare_data_for_alignment`, which do
not exist anywhere in the reference package (stale upstream code).
This port implements the documented intent with the working API:
stimulus-level alignment (analysis/alignment.py) + per-layer RDM
correlation (ops/rdm.py), optional PC reconstruction, save_results
persistence.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from visreps_tpu.analysis.alignment import align_stimulus_level
from visreps_tpu.core.config import Config
from visreps_tpu.core.db import save_results
from visreps_tpu.core.logging import rprint
from visreps_tpu.ops.pca import reconstruct_from_pcs
from visreps_tpu.ops.rdm import compute_rdm, compute_rdm_correlation


def load_embeddings(path: str) -> dict:
    """{stimulus_id: embedding} from the gemini npz."""
    data = np.load(path, allow_pickle=True)
    return {
        str(sid): emb
        for sid, emb in zip(data["stimulus_ids"], data["gemini_representations"])
    }


def semantic_alignment_scores(cfg, acts: dict, embeddings: dict, ids) -> list:
    """Per-layer RSA score vs the embedding RDM."""
    acts_aligned, emb_aligned, _ = align_stimulus_level(acts, embeddings, ids)
    method = cfg.get("compare_method", "spearman")
    emb_rdm = compute_rdm(np.asarray(emb_aligned, np.float32))
    rows = []
    for layer, a in acts_aligned.items():
        a = np.asarray(a, np.float32)
        if cfg.get("reconstruct_from_pcs"):
            a = np.asarray(reconstruct_from_pcs({layer: a}, cfg.pca_k)[layer])
        score = float(compute_rdm_correlation(compute_rdm(a), emb_rdm, method))
        rows.append({
            "layer": layer, "score": score, "compare_method": method,
            "analysis": "semantic_alignment",
            "region": "N/A", "subject_idx": "N/A",
        })
        rprint(f"  {layer}: {score:.4f}", style="info")
    return rows


def eval(cfg: Config):
    from visreps_tpu.data.neural import get_neural_loader
    from visreps_tpu.models.extractor import configure_feature_extractor
    from visreps_tpu.models.zoo import load_model

    rprint("\n[1/3] Model", style="info")
    state = load_model(cfg)
    extractor = configure_feature_extractor(cfg, state)

    rprint("\n[2/3] Embeddings + activations", style="info")
    emb_path = cfg.get("gemini_features_path",
                       "datasets/neural/nsd/gemini_representations.npz")
    embeddings = load_embeddings(emb_path)
    _, dl = get_neural_loader(cfg)
    acts, ids = extractor.get_activations(dl)

    rprint("\n[3/3] Alignment + save", style="info")
    rows = semantic_alignment_scores(cfg, acts, embeddings, ids)
    if cfg.get("log_expdata"):
        save_results(rows, cfg)
    return rows


def main(argv=None):
    from visreps_tpu.core.config import load_config
    from visreps_tpu.core.validate import validate_config

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/eval/base.json")
    parser.add_argument("--override", nargs="*", default=[])
    args = parser.parse_args(argv)
    cfg = validate_config(load_config(args.config, args.override))
    eval(cfg)


if __name__ == "__main__":
    main()
