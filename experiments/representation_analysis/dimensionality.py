"""Dimensionality analysis across layers — full reference-metric parity.

Mirrors the reference's representation_analysis/dimensionality
experiment (run.py:32-173): per-layer participation ratio, components
for 90% variance, Two-NN intrinsic dimension (±bootstrap SE), Hoyer
sparsity (mean/std + fraction active), and raw eigenspectra; when two
checkpoints are given, the comparison figures too (participation-ratio
/ intrinsic-dimension three-panel comparisons, eigenspectrum panels,
sparsity trajectory + difference). Metrics live in dim_metrics.py
(jnp kernels, numpy-parity-tested), figures in dim_plots.py.
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from experiments.representation_analysis.dim_metrics import compute_all_metrics
from experiments.representation_analysis.dim_plots import (
    plot_eigenspectrum,
    plot_metric_comparison,
    plot_sparsity_comparison,
    print_summary_table,
)
from visreps_tpu.core.config import Config
from visreps_tpu.core.logging import rprint
from visreps_tpu.data.loader import make_stimuli_loader
from visreps_tpu.data.transforms import get_transform
from visreps_tpu.models.extractor import configure_feature_extractor
from visreps_tpu.models.zoo import load_model


def _extract(args, cfg_id):
    cfg = Config({
        "load_model_from": "checkpoint", "seed": args.seed, "cfg_id": cfg_id,
        "checkpoint_dir": args.checkpoint_dir, "checkpoint_model": args.checkpoint_model,
        "return_nodes": args.return_nodes, "batchsize": args.batch_size,
    })
    state = load_model(cfg)
    extractor = configure_feature_extractor(cfg, state)
    stimuli = {
        os.path.splitext(f)[0]: os.path.join(args.stimuli_dir, f)
        for f in sorted(os.listdir(args.stimuli_dir))
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    }
    loader = make_stimuli_loader(stimuli, get_transform("imgnet"), args.batch_size)
    acts, _ = extractor.get_activations(loader)
    return {l: np.asarray(a) for l, a in acts.items()}


def write_csv(results, layers, out_path):
    """One row per layer with every scalar metric."""
    with open(out_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=[
            "layer", "participation_ratio", "n_components_90", "twonn_id",
            "twonn_se", "hoyer_sparsity_mean", "hoyer_sparsity_std",
            "fraction_active"])
        writer.writeheader()
        for layer in layers:
            writer.writerow({
                "layer": layer,
                "participation_ratio": round(results["pr"][layer], 3),
                "n_components_90": results["n90"][layer],
                "twonn_id": round(results["twonn"][layer]["dimension"], 3),
                "twonn_se": round(results["twonn"][layer]["std"], 3),
                "hoyer_sparsity_mean": round(results["sparsity"][layer]["mean"], 4),
                "hoyer_sparsity_std": round(results["sparsity"][layer]["std"], 4),
                "fraction_active": round(results["sparsity"][layer]["frac_active"], 4),
            })


def render_comparison(per_model, layers, model_names, out_dir,
                      spectrum_layers=None):
    """All four reference figures for a two-model comparison.

    per_model: {model_name: compute_all_metrics(...) result}.
    Returns the list of written figure paths.
    """
    os.makedirs(out_dir, exist_ok=True)
    a, b = model_names
    paths = []

    def out(name):
        p = os.path.join(out_dir, name)
        paths.append(p)
        return p

    plot_metric_comparison(
        {a: per_model[a]["pr"], b: per_model[b]["pr"]}, layers, model_names,
        "Participation ratio", "Effective dimensionality (PR)",
        out("participation_ratio.png"))
    plot_metric_comparison(
        {m: {l: per_model[m]["twonn"][l]["dimension"] for l in layers}
         for m in model_names},
        layers, model_names, "Intrinsic dimension",
        "Manifold dimensionality (Two-NN)", out("intrinsic_dimension.png"))
    spectrum_layers = spectrum_layers or layers[: min(3, len(layers))]
    plot_eigenspectrum(
        {m: per_model[m]["eigenvalues"] for m in model_names},
        spectrum_layers, model_names, out("eigenspectrum.png"))
    plot_sparsity_comparison(
        {m: per_model[m]["sparsity"] for m in model_names},
        layers, model_names, out("sparsity.png"))

    print_summary_table({
        "Participation Ratio": {m: per_model[m]["pr"] for m in model_names},
        "Two-NN Dimension": {
            m: {l: per_model[m]["twonn"][l]["dimension"] for l in layers}
            for m in model_names},
        "Components (90% var)": {m: per_model[m]["n90"] for m in model_names},
    }, layers, model_names)
    return paths


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--cfg-id", required=True)
    parser.add_argument("--compare-cfg-id", default=None,
                        help="second checkpoint for the comparison figures")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--checkpoint-model", default="checkpoint_epoch_20.pth")
    parser.add_argument("--stimuli-dir", required=True)
    parser.add_argument("--return-nodes", nargs="+",
                        default=["conv1", "conv2", "conv3", "conv4", "conv5", "fc1", "fc2"])
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--twonn-samples", type=int, default=2000)
    parser.add_argument("--out", default="dimensionality.csv")
    parser.add_argument("--fig-dir", default="dimensionality_figs")
    args = parser.parse_args(argv)

    acts = _extract(args, args.cfg_id)
    layers = list(acts)
    results = compute_all_metrics(acts, layers, n_samples_twonn=args.twonn_samples)
    write_csv(results, layers, args.out)
    for layer in layers:
        rprint(f"{layer}: PR {results['pr'][layer]:.1f}, "
               f"n90 {results['n90'][layer]}, "
               f"Two-NN {results['twonn'][layer]['dimension']:.1f}, "
               f"sparsity {results['sparsity'][layer]['mean']:.3f}", style="info")
    rprint(f"Saved {args.out}", style="success")

    if args.compare_cfg_id:
        acts_b = _extract(args, args.compare_cfg_id)
        results_b = compute_all_metrics(acts_b, layers,
                                        n_samples_twonn=args.twonn_samples)
        names = [f"cfg{args.cfg_id}", f"cfg{args.compare_cfg_id}"]
        render_comparison({names[0]: results, names[1]: results_b},
                          layers, names, args.fig_dir)
        rprint(f"Saved comparison figures to {args.fig_dir}/", style="success")


if __name__ == "__main__":
    main()
