"""Run every representation analysis in sequence on shared features.

Port of reference experiments/representation_analysis/run_all.py:
1. dimensionality (eigenspectrum + participation ratio + two-NN ID)
2. variance ratio (within/between class) — FC2
3. nearest-neighbor retrieval — FC2
4. fine-grained structure (2-D embedding within animals) — FC2

Driven by per-model feature npz files ({layer: (N,d), labels}) so the
sweep runs without cached torch weights; each module remains
independently runnable from its own CLI.
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from experiments.representation_analysis.utils import (
    MODEL_NAMES,
    SEED,
    ensure_output_dir,
    load_feature_npz,
)
from visreps_tpu.core.logging import rprint


def run_dimensionality(feats_dicts, names, out_dir):
    """Full per-layer metric set (dim_metrics) + the comparison figures
    when exactly two models are given (reference dimensionality/run.py)."""
    from experiments.representation_analysis.dim_metrics import compute_all_metrics
    from experiments.representation_analysis.dimensionality import render_comparison

    rows, per_model = [], {}
    for name, feats in zip(names, feats_dicts):
        layers = list(feats)
        res = compute_all_metrics(feats, layers)
        per_model[name] = res
        for layer in layers:
            rows.append({
                "model": name, "layer": layer,
                "participation_ratio": res["pr"][layer],
                "n_components_90": res["n90"][layer],
                "twonn_id": res["twonn"][layer]["dimension"],
                "hoyer_sparsity": res["sparsity"][layer]["mean"],
                "fraction_active": res["sparsity"][layer]["frac_active"],
            })
            rprint(f"  {name}/{layer}: PR = {res['pr'][layer]:.1f}, "
                   f"Two-NN = {res['twonn'][layer]['dimension']:.1f}",
                   style="info")
    out = os.path.join(out_dir, "dimensionality_summary.npz")
    np.savez(out, rows=np.array([str(r) for r in rows]))
    if len(names) == 2:
        shared = [l for l in feats_dicts[0] if l in feats_dicts[1]]
        render_comparison(per_model, shared, list(names[:2]), out_dir)
    return rows


def run_variance_ratio(feats_list, labels, names, out_dir):
    from experiments.representation_analysis.variance_ratio import (
        plot_variance_ratio,
        variance_ratio_stats,
    )

    stats = [variance_ratio_stats(f, labels) for f in feats_list]
    plot_variance_ratio(stats, names, os.path.join(out_dir, "variance_ratio.png"))
    return stats


def run_nearest_neighbors(feats_list, labels, names, out_dir, k=5, n_queries=4):
    from experiments.representation_analysis.nearest_neighbors import (
        pick_queries,
        retrieve,
    )

    rng = np.random.RandomState(SEED)
    fake_paths = [f"img_{i}.jpg" for i in range(len(labels))]
    queries = pick_queries(labels, fake_paths, n_queries, rng)
    results = {}
    for name, feats in zip(names, feats_list):
        _, acc = retrieve(feats, labels, queries, k)
        results[name] = float(acc.mean())
        rprint(f"  {name}: retrieval purity@{k} = {results[name]:.3f}",
               style="info")
    return results


def run_fine_grained(feats_list, sem_labels, synsets, names, out_dir):
    from experiments.semantic_analysis.fine_grained_structure import (
        analyze_fine_grained_structure,
    )

    return analyze_fine_grained_structure(
        feats_list, sem_labels, synsets,
        os.path.join(out_dir, "fine_grained_animals.png"), model_names=names)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--features", nargs="+", required=True,
                        help="npz per model: {<layers>: (N,d), labels}")
    parser.add_argument("--names", nargs="+", default=MODEL_NAMES)
    parser.add_argument("--layer", default="fc2")
    parser.add_argument("--sem_labels", help=".npy semantic labels (fine-grained step)")
    parser.add_argument("--synsets", help=".npy synset ids (fine-grained step)")
    parser.add_argument("--out_dir", default=None)
    args = parser.parse_args(argv)

    np.random.seed(SEED)
    out_dir = ensure_output_dir(args.out_dir)
    names = args.names[: len(args.features)]
    feats_dicts, labels = [], None
    for p in args.features:
        f, lab = load_feature_npz(p)
        feats_dicts.append(f)
        labels = lab if lab is not None else labels
    fc2 = [f[args.layer] for f in feats_dicts]

    rprint("=== 1. Dimensionality (all layers) ===", style="info")
    run_dimensionality(feats_dicts, names, out_dir)

    if labels is not None:
        rprint("=== 2. Variance ratio (FC2) ===", style="info")
        run_variance_ratio(fc2, labels, names, out_dir)
        rprint("=== 3. Nearest neighbors (FC2) ===", style="info")
        run_nearest_neighbors(fc2, labels, names, out_dir)

    if args.sem_labels and args.synsets:
        rprint("=== 4. Fine-grained structure (FC2) ===", style="info")
        run_fine_grained(fc2, np.load(args.sem_labels),
                         np.load(args.synsets, allow_pickle=True), names, out_dir)
    rprint("Done.", style="success")


if __name__ == "__main__":
    main()
