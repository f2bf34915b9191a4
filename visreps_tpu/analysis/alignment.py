"""Stimulus-level alignment of activations with neural targets.

Reference parity: visreps/analysis/alignment.py — AlignmentData bundle,
ID-based alignment, train/test preparation, concept averaging, and the
rsa/encoding dispatch. Arrays are numpy on host by default (activations
stream in from the extractor); device-resident activation stores stay
on device (concept averaging then runs as one segment-sum program).
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class AlignmentData:
    """Bundled activations and neural data for one split."""

    activations: Dict[str, np.ndarray]  # {layer: (n_stimuli, features)}
    neural: np.ndarray                  # (n_stimuli, n_voxels)
    stimulus_ids: Optional[List[str]] = None
    concept_image_ids: Optional[Dict[str, List[str]]] = None


def align_stimulus_level(acts_raw: Dict[str, np.ndarray], targets: Dict[str, Any], keys):
    """Align activations with neural targets by stimulus ID.

    Reference: alignment.py:23-39. Returns (acts, neural, matched_ids).
    """
    idx = [i for i, k in enumerate(keys) if str(k) in targets]
    matched_ids = [str(keys[i]) for i in idx]
    if not matched_ids:
        return {l: a[:0] for l, a in acts_raw.items()}, np.empty((0,), np.float32), matched_ids
    neural = np.stack([np.asarray(targets[sid], np.float32) for sid in matched_ids])
    if neural.ndim > 2:
        neural = neural.squeeze()
    idx = np.asarray(idx)
    acts = {l: a[idx] for l, a in acts_raw.items()}
    return acts, neural, matched_ids


def prepare_traintest_alignment(cfg, acts_raw, neural_data_raw, keys):
    """(train, test) AlignmentData for stimulus-level datasets."""
    train_acts, train_neural, train_ids = align_stimulus_level(acts_raw, neural_data_raw["train"], keys)
    test_acts, test_neural, test_ids = align_stimulus_level(acts_raw, neural_data_raw["test"], keys)
    train = AlignmentData(train_acts, train_neural, stimulus_ids=train_ids)
    test = AlignmentData(test_acts, test_neural, stimulus_ids=test_ids)
    logger.info(
        "Prepared train/test alignment: %d train, %d test samples.",
        train.neural.shape[0], test.neural.shape[0],
    )
    return train, test


def prepare_concept_alignment(cfg, acts_raw, neural_data_raw, keys) -> AlignmentData:
    """Average activations per THINGS concept; pair with embeddings.

    Reference: alignment.py:117-162. Device-resident activations (the
    acts_store="device" bulk path) are averaged ON DEVICE with one
    segment-sum program over the whole tap dict — the host path would
    first fetch the full (N, k × taps) store across the device link.
    Device means are float32 (sum/count of the bf16 store); the host
    path keeps the reference's input-dtype contract.
    """
    key_to_idx = {k: i for i, k in enumerate(keys)}
    embeddings = neural_data_raw["embeddings"]
    image_ids = neural_data_raw["image_ids"]

    concepts: List[str] = []
    concept_image_ids: Dict[str, List[str]] = {}

    for concept, img_ids in image_ids.items():
        matched = [sid for sid in img_ids if sid in key_to_idx]
        if not matched:
            continue
        concepts.append(concept)
        concept_image_ids[concept] = matched

    import jax
    import jax.numpy as jnp

    if acts_raw and isinstance(next(iter(acts_raw.values())), jax.Array):
        n_stimuli = next(iter(acts_raw.values())).shape[0]
        seg = np.full(n_stimuli, len(concepts), np.int32)  # dump row
        counts = np.zeros(len(concepts), np.float32)
        for gi, c in enumerate(concepts):
            for sid in concept_image_ids[c]:
                seg[key_to_idx[sid]] = gi
            counts[gi] = len(concept_image_ids[c])
        acts = _concept_means_device(
            dict(acts_raw), jnp.asarray(seg), jnp.asarray(counts), len(concepts))
    else:
        per_layer: Dict[str, list] = {l: [] for l in acts_raw}
        for c in concepts:
            idx = np.asarray([key_to_idx[sid] for sid in concept_image_ids[c]])
            for l, a in acts_raw.items():
                per_layer[l].append(a[idx].astype(np.float32).mean(axis=0))
        acts = {l: np.stack(v).astype(acts_raw[l].dtype) for l, v in per_layer.items()}

    neural = np.stack([np.asarray(embeddings[c], np.float32) for c in concepts])
    logger.info("Prepared concept alignment: %d concepts.", len(concepts))
    return AlignmentData(acts, neural, stimulus_ids=concepts, concept_image_ids=concept_image_ids)


def _concept_means_device(acts, seg, counts, num: int):
    """One program: float32 segment-mean of every tap. Rows assigned to
    segment `num` (images in no matched concept) are discarded."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def _means(d, s, c, n):
        return {
            l: jax.ops.segment_sum(
                a.astype(jnp.float32), s, num_segments=n + 1)[:n] / c[:, None]
            for l, a in d.items()
        }

    return _means(acts, seg, counts, num)


def compute_traintest_alignment(cfg, train: AlignmentData, test: AlignmentData,
                                verbose: bool = False, re_extract_fn=None,
                                mesh=None) -> List[dict]:
    """Dispatch to RSA or encoding score. Reference: alignment.py:74-114."""
    from visreps_tpu.analysis.encoding import compute_encoding_score
    from visreps_tpu.analysis.rsa import compute_rsa

    analysis = cfg.get("analysis", "rsa").lower()
    bootstrap = cfg.get("bootstrap", True)
    n_bootstrap = cfg.get("n_bootstrap", 1000)

    if analysis == "encoding_score" and cfg.get("neural_dataset", "").lower() == "things-behavior":
        raise ValueError(
            "Encoding score is not supported for things-behavior (behavioral embeddings "
            "have no voxels to predict). Use analysis=rsa instead."
        )

    if analysis == "rsa":
        return compute_rsa(
            cfg, train, test,
            n_select=cfg.get("n_select", None), bootstrap=bootstrap,
            n_bootstrap=n_bootstrap, verbose=verbose, re_extract_fn=re_extract_fn,
            mesh=mesh,
        )
    if analysis == "encoding_score":
        pca_k = cfg.get("pca_k", 1) if cfg.get("reconstruct_from_pcs") else None
        return compute_encoding_score(
            train, test, bootstrap=bootstrap, n_bootstrap=n_bootstrap,
            verbose=verbose, reconstruct_pca_k=pca_k,
        )
    raise ValueError(f"Unknown analysis method: {analysis}")
