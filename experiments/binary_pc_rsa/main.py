"""Binary-PC-code RSA against NSD neural data.

Mirrors the reference's experiments/binary_pc_rsa/main.py: project
fc2 activations of pretrained AlexNet onto the top-n eigenvectors,
median-split each PC into a bit, build (optionally rank-weighted)
Hamming RDMs from the binary codes, and correlate them with each
subject's neural RDM on the shared test stimuli.

TPU redesign: the Hamming RDM is a single matmul — for b ∈ {0,1},
Σ_k w_k·xor(b_ik, b_jk) = s_i + s_j − 2·(bW)bᵀ with s = bW·1 — no
(n, n, bits) tensor (the reference materializes one). Note: the
reference aligns activations against the {"train","test"} wrapper
keys (main.py:100-105,128), a latent bug yielding zero common ids;
this port aligns against the TEST (shared-stimuli) split, matching
the script's stated intent ("uses only shared stimuli").

Usage:
  python experiments/binary_pc_rsa/main.py --eigenvectors eig.npz \
      --subjects 0 1 --n-pcs 2 4 8 --out binary_pc_rsa.csv
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp

from visreps_tpu.core.config import Config
from visreps_tpu.core.logging import rprint
from visreps_tpu.data.loader import make_stimuli_loader
from visreps_tpu.data.neural import load_nsd_data
from visreps_tpu.data.transforms import get_transform
from visreps_tpu.models.extractor import FeatureExtractor
from visreps_tpu.models.zoo import init_model
from visreps_tpu.ops.rdm import compute_rdm, compute_rdm_correlation

REGIONS = ["early visual stream", "ventral visual stream"]


@jax.jit
def hamming_rdm_weighted(codes: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Rank-weighted Hamming dissimilarity of binary codes (n, bits).

    xor(b_i, b_j) = b_i + b_j − 2 b_i b_j elementwise, so the weighted
    Hamming distance matrix is rank-1 + rank-1 − 2·Gram — one MXU
    matmul instead of the reference's (n, n, bits) broadcast
    (reference: binary_pc_rsa/main.py:57-75).
    """
    b = codes.astype(jnp.float32)
    s = b @ weights  # (n,)
    gram = (b * weights[None, :]) @ b.T
    d = s[:, None] + s[None, :] - 2.0 * gram
    return d / jnp.sum(weights)


def project_and_binarize(acts: np.ndarray, eigenvectors: np.ndarray,
                         mean: np.ndarray, n_pcs: int) -> np.ndarray:
    """Median-split PC scores into bits. Reference: main.py:78-87."""
    scores = (acts - mean) @ eigenvectors[:, :n_pcs]
    return (scores > np.median(scores, axis=0)).astype(np.int32)


def binary_rdm(codes: np.ndarray, weighted: bool) -> jnp.ndarray:
    n_bits = codes.shape[1]
    w = (np.arange(n_bits, 0, -1, dtype=np.float32) if weighted
         else np.ones(n_bits, np.float32))
    return hamming_rdm_weighted(jnp.asarray(codes), jnp.asarray(w))


def run_analysis(args) -> list[dict]:
    eig = np.load(args.eigenvectors)
    eigenvectors, mean = eig["eigenvectors"], eig["mean"]

    state = init_model(args.model, 1000, seed=0)
    if args.pretrained == "imagenet1k":
        from visreps_tpu.models.torch_import import load_pretrained_torch

        state = load_pretrained_torch(state, args.model, 1000)
    extractor = FeatureExtractor(state, [args.layer], extract_pre_and_post=False,
                                 srp_k=10 ** 9, batch_size=args.batch_size,
                                 image_size=224)

    results = []
    for subject_idx in args.subjects:
        cfg = Config({"neural_dataset": "nsd", "region": REGIONS[0],
                      "subject_idx": subject_idx})
        targets0, stimuli = load_nsd_data(cfg)
        test_stimuli = {sid: stimuli[sid] for sid in targets0["test"] if sid in stimuli}
        dl = make_stimuli_loader(test_stimuli, get_transform("imgnet"),
                                 args.batch_size, args.num_workers)
        acts, ids = extractor.extract_single_layer(dl, args.layer)

        aligned = {}
        for region in REGIONS:
            cfg2 = Config({"neural_dataset": "nsd", "region": region,
                           "subject_idx": subject_idx})
            targets, _ = load_nsd_data(cfg2)
            test = targets["test"]
            keep = [i for i, sid in enumerate(ids) if str(sid) in test]
            aligned[region] = (
                acts[keep],
                np.stack([np.asarray(test[str(ids[i])], np.float32) for i in keep]),
            )

        for n_pcs in args.n_pcs:
            for region in REGIONS:
                a_acts, a_neural = aligned[region]
                codes = project_and_binarize(a_acts, eigenvectors, mean, n_pcs)
                neural_rdm = compute_rdm(jnp.asarray(a_neural), correlation="pearson")
                for weighted in (True, False):
                    b_rdm = binary_rdm(codes, weighted)
                    for corr in args.correlations:
                        score = compute_rdm_correlation(b_rdm, neural_rdm,
                                                        correlation=corr)
                        results.append({
                            "subject_idx": subject_idx, "n_pcs": n_pcs,
                            "region": region, "weighted": weighted,
                            "correlation": corr, "score": score,
                        })
                        rprint(
                            f"  subj {subject_idx} {region} n_pcs={n_pcs} "
                            f"weighted={weighted} {corr}: {score:.4f}",
                            style="info",
                        )
    return results


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--eigenvectors", required=True,
                        help=".npz with 'eigenvectors' (d, k) and 'mean' (d,)")
    parser.add_argument("--model", default="AlexNet")
    parser.add_argument("--pretrained", default="imagenet1k",
                        choices=["imagenet1k", "none"])
    parser.add_argument("--layer", default="fc2")
    parser.add_argument("--subjects", type=int, nargs="+", default=list(range(8)))
    parser.add_argument("--n-pcs", type=int, nargs="+", default=list(range(2, 21)))
    parser.add_argument("--correlations", nargs="+",
                        default=["spearman", "kendall"])
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--num-workers", type=int, default=8)
    parser.add_argument("--out", default="experiments/binary_pc_rsa/binary_pc_rsa.csv")
    args = parser.parse_args(argv)

    results = run_analysis(args)

    import csv

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(results[0].keys()))
        writer.writeheader()
        writer.writerows(results)
    rprint(f"Saved {len(results)} rows to {args.out}", style="success")
    return results


if __name__ == "__main__":
    main()
