"""Train/test RSA protocol: layer selection → exact re-extraction →
bootstrap CIs — all correlation math on device.

Reference parity: visreps/analysis/rsa.py:132-305 (compute_rsa,
_concept_average_exact). Protocol constants preserved: Pearson RDMs
for selection and evaluation; spearman/kendall comparison; optional
n_select subsample (seed rng); bootstrap 1000 × 90% w/o replacement →
2.5/97.5 percentiles.

TPU speedup: when all layers share the SRP output dim, layer-selection
RDMs are built as ONE vmapped batch (L, n, n) and compared in a second
vmap — replacing the reference's per-layer torch+scipy loop.
"""
from __future__ import annotations

import logging
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from visreps_tpu.core.logging import rprint
from visreps_tpu.ops.bootstrap import bootstrap_rdm_correlation, percentile_ci
from visreps_tpu.ops.rdm import compute_rdm, compute_rdm_correlation, upper_triangle
from visreps_tpu.ops.stats import (
    kendall_tau_a,
    pearson_corr,
    spearman_corr,
    spearman_corr_dense,
)

logger = logging.getLogger(__name__)

_CORR = {"pearson": pearson_corr, "spearman": spearman_corr_dense,
         "spearman_exact": spearman_corr, "kendall": kendall_tau_a}

#: Wall-clock of the last compute_rsa call's steps (selection /
#: re-extraction / point score / bootstrap), for benchmark phase
#: attribution — the THINGS branch's scoring phase is otherwise one
#: opaque number.
LAST_RSA_TIMES: Dict[str, float] = {}


def _flat(a: np.ndarray) -> np.ndarray:
    return a.reshape(a.shape[0], -1) if a.ndim > 2 else a


from functools import partial


@partial(jax.jit, static_argnames=("method", "exact_ties"))
def _select_scores_batched(stacked, neural, method: str, exact_ties: bool = False):
    """(L, n, d) taps + (n, v) neural → (L,) RDM-comparison scores.

    All L rank transforms run as ONE batched double-argsort (XLA sorts
    the batch dimension in parallel — the serial per-layer version is
    sort-latency-bound on TPU). ``exact_ties`` switches Spearman to
    scipy's average-tie ranks (lax.map over rows — the vmapped
    average-rank graph is a remote-compile hazard).
    """
    n = stacked.shape[1]
    neural_rdm = compute_rdm(neural)
    iu, ju = jnp.triu_indices(n, k=1)
    tri_n = neural_rdm[iu, ju]
    rdms = jax.lax.map(compute_rdm, stacked)      # (L, n, n) — MXU-bound
    tri = rdms[:, iu, ju]                          # (L, M)

    if method == "pearson":
        xc = tri - tri.mean(axis=1, keepdims=True)
        yc = tri_n - tri_n.mean()
        denom = jnp.sqrt(jnp.sum(xc * xc, axis=1) * jnp.sum(yc * yc))
        return jnp.sum(xc * yc[None, :], axis=1) / denom
    if method == "spearman":
        if exact_ties:
            from visreps_tpu.ops.stats import rankdata_average

            rx = jax.lax.map(rankdata_average, tri)
            ry = rankdata_average(tri_n)
            return jax.lax.map(lambda r: pearson_corr(r, ry), rx)
        rx = jnp.argsort(jnp.argsort(tri, axis=1), axis=1).astype(jnp.float32)
        ry = jnp.argsort(jnp.argsort(tri_n)).astype(jnp.float32)
        d2 = jnp.sum((rx - ry[None, :]) ** 2, axis=1)
        m = jnp.float32(tri.shape[1])
        return 1.0 - 6.0 * d2 / (m * (m * m - 1.0))
    # kendall: O(n log² n) merge counting per layer, mapped
    return jax.lax.map(lambda t: kendall_tau_a(t, tri_n), tri)


@partial(jax.jit, static_argnames=("method", "exact_ties"))
def _select_scores_multipair_fused(acts_taps, rows, neural_targets,
                                   method: str, exact_ties: bool = False):
    """Whole-subject phase-1 selection as ONE device program.

    acts_taps: tuple of (N, k) device tap stores; rows: (n,) indices of
    the subject's selection subsample; neural_targets: tuple of (n, v_r)
    per-region responses. The subsample gathers, the R neural RDMs and
    the (R, L) score matrix all trace into a single program — the eager
    version dispatches ~23 programs per subject, and through a
    remote-dispatch relay the round-trips dwarf the compute.
    """
    stacked = jnp.stack([jnp.take(a, rows, axis=0) for a in acts_taps])
    neural_rdms = jnp.stack([compute_rdm(t) for t in neural_targets])
    return _select_scores_multipair(stacked, neural_rdms, method, exact_ties)


@partial(jax.jit, static_argnames=("method", "exact_ties"))
def _select_scores_multisubject_fused(acts_taps, rows_stack, neural_stacks,
                                      method: str, exact_ties: bool = False):
    """ALL subjects' phase-1 selection as ONE device program.

    acts_taps: tuple of (N, k) device tap stores (shared across
    subjects); rows_stack: (S, n) per-subject selection subsamples;
    neural_stacks: tuple of R per-region (S, n, v_r) response stacks.
    Returns (S, R, L) scores. lax.map over subjects of the per-subject
    fused body (_select_scores_multipair_fused): 8 dispatches + 3-deep
    pipelined fetches become ONE dispatch + ONE fetch — the per-subject
    program's relay round-trips were the dominant, high-variance cost
    of phase 1 (measured 7.4-29.9 s across runs for identical code;
    VERDICT r3 item 3). Requires subjects to share selection-row count
    and per-region voxel widths (true for the bench fixture and any
    homogeneous dataset; heterogeneous subjects fall back to the
    per-subject path).
    """
    def one_subject(args):
        rows, neural = args
        stacked = jnp.stack([jnp.take(a, rows, axis=0) for a in acts_taps])
        neural_rdms = jnp.stack([compute_rdm(t) for t in neural])
        return _select_scores_multipair(stacked, neural_rdms, method, exact_ties)

    return jax.lax.map(one_subject, (rows_stack, neural_stacks))


@partial(jax.jit, static_argnames=("method", "exact_ties"))
def _select_scores_multipair(stacked, neural_rdms, method: str,
                             exact_ties: bool = False):
    """(L, n, d) taps + (R, n, n) neural RDMs → (R, L) scores.

    A subject's train stimuli are shared across its regions in NSD/TVSD
    (same stimuli, different voxels), so the L model RDMs and their
    rank transforms — the sort-bound bulk of phase-1 selection — are
    computed ONCE and scored against all R neural targets
    (reference runs the full per-pair loop 48×, visreps/evals.py:237-273).
    """
    n = stacked.shape[1]
    iu, ju = jnp.triu_indices(n, k=1)
    rdms = jax.lax.map(compute_rdm, stacked)      # (L, n, n)
    tri = rdms[:, iu, ju]                          # (L, M)
    tri_n = neural_rdms[:, iu, ju]                 # (R, M)

    if method == "pearson":
        xc = tri - tri.mean(axis=1, keepdims=True)
        yc = tri_n - tri_n.mean(axis=1, keepdims=True)
        denom = jnp.sqrt(
            jnp.sum(yc * yc, axis=1)[:, None] * jnp.sum(xc * xc, axis=1)[None, :])
        num = jax.lax.dot(yc, xc.T, precision=jax.lax.Precision.HIGHEST)
        return num / denom
    if method == "spearman":
        if exact_ties:
            from visreps_tpu.ops.stats import rankdata_average

            rx = jax.lax.map(rankdata_average, tri)
            ry = jax.lax.map(rankdata_average, tri_n)
            return jax.lax.map(
                lambda r: jax.lax.map(lambda x: pearson_corr(x, r), rx), ry)
        rx = jnp.argsort(jnp.argsort(tri, axis=1), axis=1).astype(jnp.float32)
        ry = jnp.argsort(jnp.argsort(tri_n, axis=1), axis=1).astype(jnp.float32)
        m = jnp.float32(tri.shape[1])

        def one_region(r):
            d2 = jnp.sum((rx - r[None, :]) ** 2, axis=1)
            return 1.0 - 6.0 * d2 / (m * (m * m - 1.0))

        return jax.lax.map(one_region, ry)
    return jax.lax.map(
        lambda tn: jax.lax.map(lambda t: kendall_tau_a(t, tn), tri), tri_n)


def select_best_layer(acts: Dict[str, np.ndarray], neural: np.ndarray, method: str,
                      sel_idx: np.ndarray | None = None, batched: bool = True,
                      fetch: bool = True, exact_ties: bool = False):
    """Score every layer's RDM against the neural RDM; return scores.

    Same-width layers (the common case: every SRP tap is k-dim) run as
    one batched device program; mixed widths fall back to a pipelined
    per-layer loop with a single host fetch. ``fetch=False`` returns
    (names, device_values) without synchronizing so multi-pair callers
    can pipeline dispatches (finalize with ``scores_from_device``).
    ``exact_ties`` makes Spearman selection use scipy's average-tie
    ranks (default dense ranks — identical unless the RDM triangles
    contain exact ties, e.g. from clamping).
    """
    method = method.lower()
    if sel_idx is not None:
        neural = neural[sel_idx]

    names = list(acts.keys())
    mats = [_flat(acts[n])[sel_idx] if sel_idx is not None else _flat(acts[n]) for n in names]
    dims = {m.shape[1] for m in mats}

    scores: Dict[str, float] = {}
    if batched and len(dims) == 1 and len(names) > 1:
        # jnp.stack keeps device-resident activations on device;
        # np.stack would round-trip them through the host.
        stacker = jnp.stack if isinstance(mats[0], jax.Array) else np.stack
        vals = _select_scores_batched(
            jnp.asarray(stacker(mats)), jnp.asarray(neural), method,
            exact_ties=exact_ties,
        )
        if not fetch:
            return names, vals
        for name, v in zip(names, np.asarray(vals)):
            scores[name] = float(v)
    else:
        # Dispatch all layers before fetching: the device queue
        # pipelines the per-layer programs and one device_get avoids
        # L host round trips (expensive through a remote relay).
        neural_rdm = compute_rdm(jnp.asarray(neural))
        tri_neural = upper_triangle(neural_rdm)
        corr_fn = _CORR["spearman_exact"] if (
            method == "spearman" and exact_ties) else _CORR[method]
        pending = [corr_fn(upper_triangle(compute_rdm(jnp.asarray(m))), tri_neural)
                   for m in mats]
        if not fetch:
            return names, pending
        for name, v in zip(names, jax.device_get(pending)):
            scores[name] = float(v)
    return scores


def scores_from_device(names, vals) -> Dict[str, float]:
    """Finalize a ``select_best_layer(..., fetch=False)`` result."""
    host = jax.device_get(vals)
    return {name: float(v) for name, v in zip(names, np.asarray(host))}


def compute_rsa(
    cfg: Dict,
    selection,
    evaluation,
    n_select: int | None = None,
    bootstrap: bool = True,
    n_bootstrap: int = 1000,
    seed: int = 42,
    verbose: bool = False,
    re_extract_fn=None,
    mesh=None,
) -> List[Dict]:
    """Select best layer on train, evaluate on test (+ bootstrap CIs).

    Reference: visreps/analysis/rsa.py:132-281 — same return contract:
    single-element list with layer, compare_method, score, ci_low/high,
    analysis, layer_selection_scores, bootstrap_scores.
    """
    method = cfg.get("compare_method", "spearman").lower()
    rng = np.random.RandomState(seed)

    n_train = selection.neural.shape[0]
    n_test = evaluation.neural.shape[0]

    if n_select is not None and n_select < n_train:
        sel_idx = rng.choice(n_train, size=n_select, replace=False)
        sel_label = f"subsampling {n_select}"
    else:
        sel_idx = np.arange(n_train)
        sel_label = f"using all {n_train}"

    if verbose:
        rprint(
            f"Train/test RSA: {n_train} train, {n_test} test, {sel_label} for layer selection",
            style="info",
        )

    # ── 1. Layer selection ─────────────────────────────────────
    import time as _time

    LAST_RSA_TIMES.clear()
    _t = _time.perf_counter()
    scores = select_best_layer(selection.activations, selection.neural, method, sel_idx,
                               exact_ties=bool(cfg.get("selection_exact_ties", False)))
    LAST_RSA_TIMES["selection_s"] = round(_time.perf_counter() - _t, 1)
    selection_scores = [{"layer": l, "score": s} for l, s in scores.items()]
    best_layer = max(scores, key=lambda l: scores[l] if scores[l] == scores[l] else -np.inf)
    if verbose:
        for l, s in scores.items():
            rprint(f"  [select] {l:<15} RSA = {s:.4f}", style="info")
        rprint(f"  Best layer: {best_layer} (score={scores[best_layer]:.4f})", style="highlight")

    # ── 2. Test evaluation (optional exact re-extraction) ──────
    _t = _time.perf_counter()
    if re_extract_fn is not None:
        rprint(f"  Re-extracting {best_layer} without SRP for exact test RDMs...", style="info")
        exact_acts, _ = re_extract_fn(best_layer, evaluation.stimulus_ids)
        LAST_RSA_TIMES["re_extract_s"] = round(_time.perf_counter() - _t, 1)
        _t = _time.perf_counter()
        # Device-resident re-extractions (e.g. device-averaged concept
        # means) stay on device — np.asarray would fetch the matrix
        # across the link only for compute_rdm to re-upload it.
        test_acts_flat = _flat(exact_acts if isinstance(exact_acts, jax.Array)
                               else np.asarray(exact_acts))
    else:
        test_acts_flat = _flat(evaluation.activations[best_layer])

    ci_low = ci_high = None
    bootstrap_scores_list = None
    boot_exact = False
    fused = (bootstrap and method == "spearman"
             and cfg.get("bootstrap_exact_ties", "auto") is not False)
    if fused:
        # Model RDM + neural RDM + average-tie point score + bootstrap
        # as ONE device program (VERDICT r4 item 6 — the r4 capture
        # shows 26.9 s of separate point-score + 4.2 s of bootstrap
        # dispatches on the THINGS branch). The grouped kernel is
        # always average-tie exact, so no tie-detection round-trip.
        from visreps_tpu.ops.bootstrap import single_pair_scoring

        # Same rng-stream position as the unfused path: the reference
        # CONTINUES the selection RandomState into the bootstrap draws
        # (visreps/analysis/rsa.py:166-171, 239-246).
        n_sub = int(n_test * 0.9)
        indices = np.stack(
            [rng.choice(n_test, size=n_sub, replace=False)
             for _ in range(n_bootstrap)]).astype(np.int32)
        boot, point_estimate = single_pair_scoring(
            jnp.asarray(test_acts_flat), np.asarray(evaluation.neural),
            indices, mesh=mesh)
        boot_exact = True
        ci_low, ci_high = percentile_ci(boot)
        bootstrap_scores_list = boot.tolist()
        LAST_RSA_TIMES["point_score_s"] = round(_time.perf_counter() - _t, 1)
        LAST_RSA_TIMES["bootstrap_s"] = 0.0  # fused into point_score_s
        LAST_RSA_TIMES["fused"] = 1.0
    else:
        test_neural_rdm = compute_rdm(jnp.asarray(evaluation.neural))
        test_model_rdm = compute_rdm(jnp.asarray(test_acts_flat))
        point_estimate = compute_rdm_correlation(test_model_rdm, test_neural_rdm, correlation=method)
        LAST_RSA_TIMES["point_score_s"] = round(_time.perf_counter() - _t, 1)
        _t = _time.perf_counter()
        if verbose:
            rprint(f"  Test RSA = {point_estimate:.4f}", style="highlight")

        # ── 3. Bootstrap CIs ────────────────────────────────────────
        if bootstrap:
            # The Spearman point score above is average-tie exact; keep the
            # CI drawn from the SAME statistic when the triangles actually
            # contain ties (else the sort-free dense-rank fast path is
            # already identical).
            if method == "spearman":
                mode = cfg.get("bootstrap_exact_ties", "auto")
                if mode == "auto":
                    from visreps_tpu.ops.rdm import triangle_tie_count

                    boot_exact = int(triangle_tie_count(test_model_rdm)
                                     + triangle_tie_count(test_neural_rdm)) > 0
                else:
                    boot_exact = bool(mode)
            # The reference CONTINUES the selection RandomState into the
            # bootstrap draws (visreps/analysis/rsa.py:166-171, 239-246) —
            # generate the index sets from the same `rng` so the streams
            # are bit-identical even when an n_select draw was consumed.
            n_sub = int(n_test * 0.9)
            indices = np.stack(
                [rng.choice(n_test, size=n_sub, replace=False)
                 for _ in range(n_bootstrap)]).astype(np.int32)
            boot = bootstrap_rdm_correlation(
                test_model_rdm, test_neural_rdm,
                n_bootstrap=n_bootstrap, seed=seed, method=method, mesh=mesh,
                exact_ties=boot_exact, indices=indices,
            )
            ci_low, ci_high = percentile_ci(boot)
            bootstrap_scores_list = boot.tolist()
        LAST_RSA_TIMES["bootstrap_s"] = round(_time.perf_counter() - _t, 1)

    msg = f"  {method.capitalize():<10}| {best_layer} = {point_estimate:.4f}"
    if bootstrap:
        msg += f"  [95% CI: {ci_low:.4f}, {ci_high:.4f}]"
    rprint(msg, style="highlight")

    result = {
        "layer": best_layer,
        "compare_method": method,
        "score": point_estimate,
        "ci_low": ci_low,
        "ci_high": ci_high,
        "analysis": "rsa",
        "layer_selection_scores": selection_scores,
    }
    if bootstrap_scores_list is not None:
        result["bootstrap_scores"] = bootstrap_scores_list
        result["bootstrap_exact_ties"] = boot_exact
    return [result]


def concept_average_exact(raw_acts: np.ndarray, raw_ids, data) -> np.ndarray:
    """Concept-average exact per-image activations in AlignmentData's
    concept order. Reference: rsa.py:284-305."""
    raw_acts = np.asarray(raw_acts)
    id_to_idx = {str(k): i for i, k in enumerate(raw_ids)}
    out = []
    for concept in data.stimulus_ids:
        img_ids = data.concept_image_ids[concept]
        idx = [id_to_idx[sid] for sid in img_ids if sid in id_to_idx]
        if idx:
            out.append(raw_acts[np.asarray(idx)].astype(np.float32).mean(axis=0))
        else:
            out.append(np.zeros(raw_acts.shape[1], np.float32))
    return np.stack(out).astype(raw_acts.dtype)
