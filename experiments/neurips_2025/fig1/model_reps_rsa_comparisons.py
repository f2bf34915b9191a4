"""Fig-1b: inter-seed vs cross-model RSM agreement per layer.

Port of reference experiments/neurips_2025/fig1/model_reps_rsa_comparisons.py:
load four RSM npz files (1K-reconstructed seeds 1/2, coarse-trained
seeds 1/2), compute per-layer RSM correlations for the three pairings
(F1-F2 inter-seed, T1-T2 inter-seed, F1-T1 cross), and render grouped
bars. RSM correlation = upper-triangle correlation via
ops/rdm.compute_rdm_correlation (device kernels, no scipy loop).
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import numpy as np

from visreps_tpu.core.logging import rprint
from visreps_tpu.ops.rdm import compute_rdm_correlation

import jax.numpy as jnp


def load_rsms(path):
    """{layer: (n, n) array} from an npz (reference :53-70)."""
    try:
        data = np.load(path, allow_pickle=True)
        return {k: data[k] for k in data.files}
    except FileNotFoundError:
        rprint(f"Error: file not found at {path}", style="error")
        return None


def rsm_correlation(a: np.ndarray, b: np.ndarray, method: str) -> float:
    return float(compute_rdm_correlation(jnp.asarray(a, jnp.float32),
                                         jnp.asarray(b, jnp.float32), method))


def compare_layers(rsms_f1, rsms_f2, rsms_t1, rsms_t2, method: str):
    """(layers, f1f2, t1t2, f1t1) per-layer scores (reference :228-258)."""
    common = (set(rsms_f1) & set(rsms_f2) & set(rsms_t1) & set(rsms_t2)) - {"neural"}
    layers = sorted(common)
    f1f2 = [rsm_correlation(rsms_f1[l], rsms_f2[l], method) for l in layers]
    t1t2 = [rsm_correlation(rsms_t1[l], rsms_t2[l], method) for l in layers]
    f1t1 = [rsm_correlation(rsms_f1[l], rsms_t1[l], method) for l in layers]
    return layers, f1f2, t1t2, f1t1


def plot_grouped(layers, f1f2, t1t2, f1t1, n_pca_cls, method, out_dir):
    """Grouped bars: silver/dimgray inter-seed + red cross (reference :72-170)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.arange(len(layers))
    w = 0.25
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.bar(x - w, f1f2, w, label="Inter-seed (1K rec.)", color="silver")
    ax.bar(x, t1t2, w, label=f"Inter-seed ({n_pca_cls} CLS)", color="dimgray")
    ax.bar(x + w, f1t1, w, label=f"1K rec. vs {n_pca_cls} CLS", color="#FF6B6B")
    ax.set_xticks(x)
    ax.set_xticklabels(layers, rotation=45, ha="right")
    ax.set_ylabel(f"RSM correlation ({method})")
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    ax.legend(frameon=True, facecolor="white")
    plt.tight_layout()
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"rsa_grouped_{n_pca_cls}cls_{method.lower()}.png")
    plt.savefig(out, dpi=300, bbox_inches="tight")
    plt.close(fig)
    rprint(f"Saved {out}", style="success")
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_pca_cls", type=int, default=4)
    parser.add_argument("--correlation_method", default="Kendall",
                        choices=["Pearson", "Spearman", "Kendall"])
    parser.add_argument("--output_dir", default="plotters/fig1")
    parser.add_argument("--base_rsm_dir", default="model_checkpoints/RSMs")
    args = parser.parse_args(argv)

    n_pcs = int(np.log2(args.n_pca_cls)) if args.n_pca_cls > 0 else 0
    base = Path(args.base_rsm_dir) / f"pca{args.n_pca_cls}cls"
    paths = {
        "f1": base / f"rsms_nsd_pca_labels_False_pca_k_{n_pcs}_cfgid_1_seed_1.npz",
        "f2": base / f"rsms_nsd_pca_labels_False_pca_k_{n_pcs}_cfgid_1_seed_2.npz",
        "t1": base / f"rsms_nsd_pca_labels_True_cfgid_{n_pcs}_seed_1.npz",
        "t2": base / f"rsms_nsd_pca_labels_True_cfgid_{n_pcs}_seed_2.npz",
    }
    rsms = {k: load_rsms(p) for k, p in paths.items()}
    missing = [str(paths[k]) for k, v in rsms.items() if v is None]
    if missing:
        rprint(f"Missing RSM files: {missing}", style="error")
        return None
    layers, f1f2, t1t2, f1t1 = compare_layers(
        rsms["f1"], rsms["f2"], rsms["t1"], rsms["t2"], args.correlation_method)
    if not layers:
        rprint("No common layers across RSM files.", style="error")
        return None
    return plot_grouped(layers, f1f2, t1t2, f1t1, args.n_pca_cls,
                        args.correlation_method, args.output_dir)


if __name__ == "__main__":
    main()
