"""Unified evaluation orchestration: THINGS / NSD-Synthetic / NSD+TVSD.

Reference parity: visreps/evals.py — same three branches, the same
two-phase RSA protocol (Phase 1: per-(region, subject) layer selection
on SRP activations, 1000 subsampled train stimuli seed 42; Phase 2:
exact re-extraction of unique best layers on shared test stimuli,
optional PC reconstruction, per-subject score + 1000×90% bootstrap),
the same NSD-Synthetic layer reuse via results.db run_id lookup, and
the same save_results persistence.

TPU redesign: one jitted extraction program computes all taps + SRP per
batch; selection RDMs for all 14 taps are one vmapped device call;
bootstrap is a batched device program instead of 1000 scipy calls.
"""
from __future__ import annotations

import json
import sqlite3
from typing import Dict, List

import numpy as np

from visreps_tpu.analysis.alignment import (
    AlignmentData,
    align_stimulus_level,
    compute_traintest_alignment,
    prepare_concept_alignment,
    prepare_traintest_alignment,
)
from visreps_tpu.analysis.rsa import concept_average_exact, select_best_layer
from visreps_tpu.core.config import Config, get_seed_letter
from visreps_tpu.core.db import RESULTS_DB_PATH, compute_run_id, save_results
from visreps_tpu.core.logging import rprint
from visreps_tpu.data.loader import make_stimuli_loader
from visreps_tpu.data.neural import (
    get_neural_loader,
    load_all_nsd_data,
    load_all_tvsd_data,
    load_nsd_synthetic_test_data,
)
from visreps_tpu.data.transforms import get_transform
from visreps_tpu.models.extractor import configure_feature_extractor
from visreps_tpu.models.zoo import TORCHVISION_RETURN_NODES, load_model
from visreps_tpu.ops.bootstrap import bootstrap_rdm_correlation, percentile_ci
from visreps_tpu.ops.pca import reconstruct_from_pcs
from visreps_tpu.ops.rdm import compute_rdm
from visreps_tpu.parallel.auto import default_mesh
from visreps_tpu.parallel.shard import rdm_sharded

import jax.numpy as jnp


# ──────────────────────── helpers ────────────────────────
def _load_cfg(cfg: Config) -> Config:
    """Merge runtime cfg with the checkpoint's training config.

    Reference: evals.py:31-40.
    """
    seed_letter = get_seed_letter(cfg.seed)
    path = f"{cfg.checkpoint_dir}/cfg{cfg.cfg_id}{seed_letter}/config.json"
    with open(path) as f:
        base = Config(json.load(f))
    base.epoch = int(cfg.checkpoint_model.split("_")[-1].split(".")[0])
    for k in ("mode", "exp_name", "lr_scheduler", "n_classes"):
        base.pop(k, None)
    return base.merge(cfg)


def _listify(val) -> list:
    return list(val) if isinstance(val, list) else [val]


def _build_header(cfg) -> str:
    analysis = cfg.get("analysis", "rsa").upper()
    seed = cfg.get("seed", "?")
    seed_letter = get_seed_letter(seed) if isinstance(seed, int) else "?"
    parts = [f"{analysis} eval", f"cfg{cfg.get('cfg_id', '?')}{seed_letter} epoch {cfg.get('epoch', '?')}"]
    region = cfg.get("region", "")
    if region and str(region).upper() != "N/A":
        parts.append(f"{cfg.get('neural_dataset', '?').upper()} {region}")
    else:
        parts.append(cfg.get("neural_dataset", "?").upper())
    subj = cfg.get("subject_idx", "")
    if subj != "" and str(subj).upper() != "N/A":
        parts.append(f"subj {subj}")
    parts.append(f"seed {seed}")
    return " | ".join(parts)


def _neural_tensor(test_neural_dict: dict, ids) -> np.ndarray:
    responses = [test_neural_dict[sid] for sid in ids if sid in test_neural_dict]
    arr = np.stack(responses).astype(np.float32)
    return arr.squeeze() if arr.ndim > 2 else arr


def _selection_plan(neural, subjects, regions, stimuli, n_select):
    """Pre-extraction seed-42 phase-1 subsample per (region, subject).

    Replicates the in-pipeline draw exactly: extraction order is the
    StimuliDataset's sorted-key order (data/loader.py:104), matched is
    that order filtered to the pair's train ids, and the subsample is
    RandomState(42) over the matched length (reference protocol:
    evals.py:237-262). Knowing the subsample BEFORE extraction lets
    `get_activations(retain_ids=...)` drop the ~90% of SRP rows that
    phase 1 never reads. Returns ({(region, subj): [ids in draw
    order]}, union set).
    """
    order = [str(k) for k in sorted(stimuli.keys())]
    plan, union = {}, set()
    for region in regions:
        for subj in subjects:
            targets = neural[region][subj]["train"]
            matched = [k for k in order if k in targets]
            n_train = len(matched)
            if n_select is not None and n_select < n_train:
                sel = np.random.RandomState(42).choice(
                    n_train, size=n_select, replace=False)
            else:
                sel = np.arange(n_train)
            ids_sel = [matched[i] for i in sel]
            plan[(region, subj)] = ids_sel
            union.update(ids_sel)
    return plan, union


def _rdm(x, mesh, cfg) -> jnp.ndarray:
    """compute_rdm, routed through the stimulus-axis-sharded kernel
    when the matrix is big enough to amortize the all-gather."""
    x = jnp.asarray(x)
    if mesh is not None and x.shape[0] >= cfg.get("rdm_shard_threshold", 4096):
        return rdm_sharded(x, mesh)
    return compute_rdm(x)


# Wall-clock of the last eval's phases (model_load / data_load /
# extraction / phase1_selection / phase2_extract / scoring), populated
# by every NSD/TVSD RSA run — the bench surfaces it so regressions in
# any one phase are visible without instrumenting anew.
LAST_PHASE_TIMES: Dict[str, float] = {}


# ───────────────────────── eval ──────────────────────────
def eval(cfg: Config, mesh=None):
    """One forward pass, per-(subject, region) results. Reference: evals.py:74-218.

    When >1 device is visible a ('data', 'model') mesh is built by
    default: extraction batches shard over 'data', large RDMs route
    through the stimulus-axis-sharded kernel, and bootstrap iterations
    spread over chips (disable with use_mesh=false).
    """
    verbose = cfg.get("verbose", False)
    import time as _time

    _t_init = _time.perf_counter()
    if mesh is None:
        mesh = default_mesh(cfg)
    # First device contact initializes the backend (on relay-attached
    # terminals: tunnel handshake + device attach, tens of seconds after
    # an idle window) — surface it or it shows up as an unattributable
    # gap between the e2e wall and the phase sum (measured 71 s).
    _backend_init_s = _time.perf_counter() - _t_init
    LAST_PHASE_TIMES.clear()
    LAST_PHASE_TIMES["backend_init_s"] = round(_backend_init_s, 1)

    if cfg.load_model_from == "checkpoint":
        cfg = _load_cfg(cfg)
    elif cfg.load_model_from == "torchvision":
        cfg.epoch = -1
        cfg.cfg_id = "pretrained" if cfg.get("pretrained_dataset") == "imagenet1k" else "untrained"
        cfg.return_nodes = TORCHVISION_RETURN_NODES[cfg.model_name]

    dataset = cfg.neural_dataset.lower()

    if dataset == "things-behavior":
        return _eval_things(cfg, verbose, mesh)

    if dataset == "nsd_synthetic":
        subjects = _listify(cfg.subject_idx)
        regions = _listify(cfg.region)
        seed_letter = get_seed_letter(cfg.seed) if isinstance(cfg.seed, int) else "?"
        rprint(
            f"\n  RSA eval (NSD Synthetic) | cfg{cfg.get('cfg_id', '?')}{seed_letter} "
            f"epoch {cfg.get('epoch', '?')} | {len(subjects)} subjects x {len(regions)} regions | "
            f"seed {cfg.seed}\n",
            style="info",
        )
        return _eval_rsa_nsd_synthetic(cfg, subjects, regions, verbose, mesh)

    # ── NSD / TVSD unified multi-subject path ──
    subjects = _listify(cfg.subject_idx)
    regions = _listify(cfg.region)
    seed_letter = get_seed_letter(cfg.seed) if isinstance(cfg.seed, int) else "?"
    rprint(
        f"\n  {cfg.get('analysis', 'rsa').upper()} eval | cfg{cfg.get('cfg_id', '?')}{seed_letter} "
        f"epoch {cfg.get('epoch', '?')} | {cfg.neural_dataset.upper()} | "
        f"{len(subjects)} subjects x {len(regions)} regions | seed {cfg.seed}\n",
        style="info",
    )

    from visreps_tpu.core.logging import Timer

    timer = Timer()

    state = load_model(cfg, verbose=verbose)
    extractor = configure_feature_extractor(cfg, state, verbose=verbose, mesh=mesh)
    LAST_PHASE_TIMES["model_load_s"] = timer.mark("model_load")

    if dataset == "nsd":
        all_data = load_all_nsd_data(cfg, subjects=subjects, regions=regions)
    elif dataset == "tvsd":
        all_data = load_all_tvsd_data(cfg, subjects=subjects, regions=regions)
    else:
        raise ValueError(f"Unsupported neural_dataset='{dataset}' for multi-subject eval")
    LAST_PHASE_TIMES["data_load_s"] = timer.mark("data_load")

    stimuli = all_data["stimuli"]
    rprint(
        f"  {len(subjects)} subjects x {len(regions)} regions, "
        f"{len(stimuli)} stimuli, {len(all_data['shared_test_ids'])} shared test IDs",
        style="success",
    )

    transform = get_transform("imgnet", normalize=not cfg.get("uint8_transfer", False))
    dl = make_stimuli_loader(stimuli, transform, cfg.batchsize, cfg.get("num_workers", 16))

    analysis = cfg.get("analysis", "rsa").lower()
    # RSA phase 1 only ever reads the n_select seed-42 subsample per
    # (region, subject); computing that plan up front lets extraction
    # discard every other row at accumulation time (all stimuli still
    # run the full all-tap forward). Encoding needs every train row, so
    # retention stays off there. acts_retain: "auto" (default) retains
    # only when the FULL bf16 store would NOT fit on device — retention
    # is what rescues device residency then. When the full store fits,
    # retention is a pure loss single-process: its per-batch kept-row
    # gathers add ~2k dispatches through the relay (measured: extraction
    # 216 s → 311 s at 73k scale). True forces it (subject-sharded
    # workers splitting one chip's HBM); False disables.
    sel_plan = retain = None
    if analysis == "rsa":
        import jax as _jax

        sel_plan, retain_union = _selection_plan(
            all_data["neural"], subjects, regions, stimuli, cfg.get("n_select", 1000))
        mode = cfg.get("acts_retain", "auto")
        if mode == "auto":
            est_full = 2 * len(stimuli) * sum(extractor.out_dims().values())
            retain = retain_union if (
                _jax.default_backend() != "cpu" and est_full >= 9e9) else None
        elif mode:
            retain = retain_union
        if retain is not None and len(retain) >= len(stimuli):
            retain = None  # nothing to drop

    store = cfg.get("acts_store", "auto")
    if store == "auto":
        # Keep activations HBM-resident (bf16) when they fit — selection
        # then runs without host round trips. ~2 bytes × N × k × taps.
        import jax as _jax

        n_store = len(retain) if retain is not None else len(stimuli)
        est_bytes = 2 * n_store * sum(extractor.out_dims().values())
        store = "device" if (_jax.default_backend() != "cpu" and est_bytes < 9e9) else "host"
    # Phase-2 test-row retention (VERDICT r4 item 3): keep the shared
    # test stimuli's exact bf16 taps during the bulk pass so phase 2
    # never re-reads / re-uploads / re-forwards them (~0.9 GB at NSD
    # scale, beside the 8.4 GB SRP store). reconstruct_from_pcs needs
    # raw f32 taps on host, and HBM-tight configs can force it off
    # with phase2_retain=false; both fall back to re-extraction.
    exact_ids = None
    if analysis == "rsa" and store == "device" and retain is None \
            and not cfg.get("reconstruct_from_pcs"):
        mode = cfg.get("phase2_retain", "auto")
        test_order = [sid for sid in all_data["shared_test_ids"]
                      if sid in stimuli]
        est_exact = 2 * len(test_order) * sum(extractor.tap_dims.values())
        if (mode if mode != "auto" else est_exact < 2e9) and test_order:
            exact_ids = test_order
    acts, ids = extractor.get_activations(
        dl, store=store, retain_ids=retain, exact_retain_ids=exact_ids)
    # SRP matrices are no longer needed (phase 2 re-extracts exact
    # single layers); at 73k device-store scale their ~3.7 GB of HBM is
    # the difference between fitting and OOM on a 16 GB chip.
    extractor.free_projection_cache()
    LAST_PHASE_TIMES["extraction_s"] = timer.mark("extraction")
    for k, v in getattr(extractor, "last_extract_times", {}).items():
        LAST_PHASE_TIMES[f"extraction_{k}"] = v
    rprint("  Activations extracted once for all subjects/regions", style="success")

    if analysis == "rsa":
        # Box the store and drop THIS frame's binding: `del acts` inside
        # _eval_rsa frees nothing while the caller still references the
        # dict — the 73k bf16 device store (~8.4 GB) then coexists with
        # phase 2's ~4 GB of exact f32 taps, a measured intermittent
        # HBM OOM on a 15.75 GB chip (e2e run 2026-08-19, RESOURCE_
        # EXHAUSTED at the one-program RDM build).
        acts_box = [acts]
        del acts
        return _eval_rsa(cfg, extractor, acts_box, ids, all_data, subjects, regions,
                         verbose, mesh, sel_plan=sel_plan)
    if analysis == "encoding_score":
        return _eval_encoding(cfg, acts, ids, all_data, subjects, regions, verbose, mesh)
    raise ValueError(f"Unknown analysis method: {analysis}")


# ──────────────────── THINGS branch ──────────────────────
def _eval_things(cfg, verbose, mesh=None):
    """Concept-level 20/80 train/test RSA. Reference: evals.py:94-155."""
    from visreps_tpu.core.logging import Timer

    timer = Timer()
    rprint(f"\n  {_build_header(cfg)}\n", style="info")
    state = load_model(cfg, verbose=verbose)
    extractor = configure_feature_extractor(cfg, state, verbose=verbose, mesh=mesh)
    LAST_PHASE_TIMES["model_load_s"] = timer.mark("model_load")

    neural_data, dl = get_neural_loader(cfg)
    rprint("  THINGS data loaded", style="success")
    LAST_PHASE_TIMES["data_load_s"] = timer.mark("data_load")

    # Same HBM-residency policy as the NSD/TVSD branch: keep the bf16
    # SRP store on device when it fits, so concept averaging (one
    # segment-sum program) and layer selection run without fetching the
    # (26k, 4096 × 14) store across the device link.
    store = cfg.get("acts_store", "auto")
    if store == "auto":
        import jax as _jax

        n_est = len(getattr(dl, "dataset", ()) or ())
        est_bytes = 2 * n_est * sum(extractor.out_dims().values())
        store = ("device"
                 if (_jax.default_backend() != "cpu" and 0 < est_bytes < 9e9)
                 else "host")
    acts, ids = extractor.get_activations(dl, store=store)
    extractor.free_projection_cache()
    LAST_PHASE_TIMES["extraction_s"] = timer.mark("extraction")
    for k, v in getattr(extractor, "last_extract_times", {}).items():
        LAST_PHASE_TIMES[f"extraction_{k}"] = v
    all_concepts = prepare_concept_alignment(cfg, acts, neural_data, ids)
    del acts, neural_data
    LAST_PHASE_TIMES["concept_avg_s"] = timer.mark("concept_avg")

    rng = np.random.RandomState(42)
    n_concepts = all_concepts.neural.shape[0]
    perm = rng.permutation(n_concepts)
    n_sel = int(n_concepts * 0.2)
    sel_idx, eval_idx = perm[:n_sel], perm[n_sel:]

    selection = AlignmentData(
        activations={l: a[sel_idx] for l, a in all_concepts.activations.items()},
        neural=all_concepts.neural[sel_idx],
        stimulus_ids=[all_concepts.stimulus_ids[i] for i in sel_idx],
    )
    evaluation = AlignmentData(
        activations={l: a[eval_idx] for l, a in all_concepts.activations.items()},
        neural=all_concepts.neural[eval_idx],
        stimulus_ids=[all_concepts.stimulus_ids[i] for i in eval_idx],
        concept_image_ids={
            all_concepts.stimulus_ids[i]: all_concepts.concept_image_ids[all_concepts.stimulus_ids[i]]
            for i in eval_idx
        },
    )
    del all_concepts
    rprint(f"  {n_sel} selection concepts, {len(eval_idx)} evaluation concepts", style="success")

    # PC reconstruction needs the raw per-image matrix on host, so it
    # keeps the fetch-then-average path; otherwise the exact per-image
    # activations are concept-averaged ON DEVICE during the
    # re-extraction forward (a scatter-add epilogue) — only the
    # (1484, D) means ever leave the device instead of the raw
    # (26k, D) float32 matrix (~6.7 GB at conv3 resolution).
    device_avg = store == "device" and not cfg.get("reconstruct_from_pcs")

    def re_extract_fn(layer, sids=None):
        if device_avg:
            return extractor.extract_single_layer_mean(
                dl, layer, evaluation.concept_image_ids, evaluation.stimulus_ids)
        raw_acts, raw_ids = extractor.extract_single_layer(dl, layer)
        if cfg.get("reconstruct_from_pcs"):
            raw_acts = np.asarray(reconstruct_from_pcs({layer: raw_acts}, cfg.pca_k)[layer])
            rprint(f"    Reconstructed from {cfg.pca_k} PCs", style="info")
        return concept_average_exact(raw_acts, raw_ids, evaluation), evaluation.stimulus_ids

    scores = compute_traintest_alignment(
        cfg, selection, evaluation, verbose=verbose, re_extract_fn=re_extract_fn, mesh=mesh
    )
    LAST_PHASE_TIMES["scoring_s"] = timer.mark("scoring")
    from visreps_tpu.analysis.rsa import LAST_RSA_TIMES

    for k, v in LAST_RSA_TIMES.items():
        LAST_PHASE_TIMES[f"scoring_{k}"] = v
    if cfg.get("log_expdata"):
        save_results(scores, cfg)
    return scores


# ──────────────────── RSA branch ─────────────────────────
def _eval_rsa(cfg, extractor, acts, ids, all_data, subjects, regions, verbose,
              mesh=None, sel_plan=None) -> List[Dict]:
    """Two-phase RSA. Reference: evals.py:222-400.

    ``acts``: the bulk SRP store, either the dict itself or a
    single-element list boxing it (the caller empties its own binding
    so the post-phase-1 ``del acts`` genuinely frees the device store
    before phase 2's exact taps allocate).
    """
    if isinstance(acts, list):
        acts = acts.pop()
    method = cfg.get("compare_method", "spearman").lower()
    bootstrap = cfg.get("bootstrap", False)
    n_bootstrap = cfg.get("n_bootstrap", 1000)
    n_select = cfg.get("n_select", 1000)

    neural = all_data["neural"]
    shared_test_ids = all_data["shared_test_ids"]
    stimuli = all_data["stimuli"]

    import time as _time

    _t0 = _time.perf_counter()

    # ── Phase 1: per-(region, subject) layer selection (SRP) ──
    # The reference scores one pair at a time with a host sync each
    # (evals.py:237-273). Here pairs are grouped BY SUBJECT: a subject's
    # train stimuli are identical across regions (same stimuli,
    # different voxels), so the 14 model RDMs + rank transforms — the
    # sort-bound bulk of selection — are computed once per subject and
    # scored against all of its regions in ONE dispatch
    # (_select_scores_multipair: 8 programs instead of 48, 6× fewer
    # big sorts). Subjects whose matched rows differ across regions
    # fall back to the pipelined per-pair path. Only the ≤ n_select
    # subsampled rows are gathered, not the full train set.
    from collections import deque

    import jax

    rprint("\n  Phase 1: Per-subject layer selection", style="info")
    per_region_layers: Dict = {}
    per_region_scores: Dict = {}
    for region in regions:
        per_region_layers[region] = {}
        per_region_scores[region] = {}

    from visreps_tpu.analysis.rsa import (
        _select_scores_multipair,
        _select_scores_multipair_fused,
        _select_scores_multisubject_fused,
    )

    exact_sel = bool(cfg.get("selection_exact_ties", False))
    tap_names = list(acts.keys())
    on_device = isinstance(next(iter(acts.values())), jax.Array)
    same_width = len({a.shape[1] for a in acts.values()}) == 1

    id_pos = {str(k): i for i, k in enumerate(ids)}

    def _pair_rows(region, subj):
        targets = neural[region][subj]["train"]
        if sel_plan is not None:
            # Pre-extraction plan: same ids, same draw order as the
            # in-pipeline path below (see _selection_plan) — required
            # when extraction retained only the planned rows.
            sel_ids = sel_plan[(region, subj)]
            missing = [k for k in sel_ids if k not in id_pos]
            if missing:
                raise RuntimeError(
                    f"{len(missing)} planned selection stimuli missing from "
                    f"extraction output (e.g. {missing[:3]})")
            rows = np.asarray([id_pos[k] for k in sel_ids])
            sel_neural = np.stack(
                [np.asarray(targets[k], np.float32) for k in sel_ids])
        else:
            idx = [i for i, k in enumerate(ids) if str(k) in targets]
            matched = [str(ids[i]) for i in idx]
            n_train = len(matched)
            if n_select is not None and n_select < n_train:
                sel = np.random.RandomState(42).choice(n_train, size=n_select,
                                                       replace=False)
            else:
                sel = np.arange(n_train)
            rows = np.asarray(idx)[sel]
            sel_neural = np.stack(
                [np.asarray(targets[matched[i]], np.float32) for i in sel])
        if sel_neural.ndim > 2:
            sel_neural = sel_neural.squeeze()
        return rows, sel_neural

    sel_pending: deque = deque()

    def _drain_selection():
        regs, subj, n_sel_used, vals = sel_pending.popleft()
        arr = np.asarray(jax.device_get(vals), dtype=np.float64)
        if arr.ndim == 1:
            arr = arr[None, :]
        for region, row in zip(regs, arr):
            scores = {l: float(v) for l, v in zip(tap_names, row)}
            best = max(scores, key=lambda l: scores[l] if scores[l] == scores[l] else -np.inf)
            per_region_layers[region][subj] = best
            per_region_scores[region][subj] = [
                {"layer": l, "score": s} for l, s in scores.items()
            ]
            if verbose:
                rprint(
                    f"    {region} subj {subj}: {best} ({scores[best]:.4f}), "
                    f"{n_sel_used} stimuli for selection",
                    style="info",
                )

    # Stage every subject's rows + responses first; subjects that share
    # selection-row count and per-region voxel widths CAN run as one
    # multi-subject program (see below for why that is opt-in);
    # otherwise each subject dispatches its own fused program with
    # 3-deep pipelined fetches.
    staged = {}
    for subj in subjects:
        rows_by_region, neural_by_region = {}, {}
        for region in regions:
            rows_by_region[region], neural_by_region[region] = _pair_rows(region, subj)
        rows0 = rows_by_region[regions[0]]
        grouped = same_width and len(regions) > 1 and all(
            np.array_equal(rows_by_region[r], rows0) for r in regions[1:])
        staged[subj] = (rows_by_region, neural_by_region, rows0, grouped)
    # Sub-phase split (observability: phase-1 wall = host staging of the
    # 48 (rows, responses) pairs + device dispatch/fetch of the fused
    # selection programs — the two move independently on a relay host).
    LAST_PHASE_TIMES["phase1_staging_s"] = _time.perf_counter() - _t0

    # Opt-in (phase1_multisubject=true): the all-subjects program runs
    # in 0.5 s but COMPILES for 60-135 s, and that compile does not
    # reliably persist across processes on the relay toolchain
    # (measured: the per-process e2e recompiled it while the grouped
    # scoring program cache-hit fine) — whereas the per-subject fused
    # program compiles in ~2.5 s and its 8 pipelined dispatches cost a
    # few seconds. Worth enabling only where compiles are local/cheap.
    multisubj: Dict = {}
    if on_device and cfg.get("phase1_multisubject", False):
        for subj, (_, nbr, rows0, grouped) in staged.items():
            if grouped:
                key = (len(rows0), tuple(nbr[r].shape for r in regions))
                multisubj.setdefault(key, []).append(subj)
    batched_subjects = {s for subs in multisubj.values() if len(subs) > 1
                        for s in subs}

    for subs in multisubj.values():
        if len(subs) < 2:
            continue
        rows_stack = jnp.asarray(
            np.stack([staged[s][2] for s in subs]), jnp.int32)
        neural_stacks = tuple(
            jnp.asarray(np.stack([staged[s][1][r] for s in subs]))
            for r in regions)
        vals = _select_scores_multisubject_fused(
            tuple(acts[l] for l in tap_names), rows_stack, neural_stacks,
            method, exact_sel)  # (S, R, L)
        arr = np.asarray(jax.device_get(vals), dtype=np.float64)
        for s_i, subj in enumerate(subs):
            sel_pending.append(
                (list(regions), subj, rows_stack.shape[1], arr[s_i]))
        del neural_stacks

    for subj in subjects:
        if subj in batched_subjects:
            continue
        rows_by_region, neural_by_region, rows0, grouped = staged[subj]
        if grouped and on_device:
            # Whole subject in ONE program: subsample gathers + R neural
            # RDMs + (R, L) scores (see _select_scores_multipair_fused).
            vals = _select_scores_multipair_fused(
                tuple(acts[l] for l in tap_names),
                jnp.asarray(rows0, jnp.int32),
                tuple(jnp.asarray(neural_by_region[r]) for r in regions),
                method, exact_sel)
            sel_pending.append((list(regions), subj, len(rows0), vals))
        elif grouped:
            stacked = np.stack([acts[l][rows0] for l in tap_names])
            neural_rdms = jnp.stack([
                compute_rdm(jnp.asarray(neural_by_region[r])) for r in regions])
            vals = _select_scores_multipair(
                jnp.asarray(stacked), neural_rdms, method, exact_sel)
            sel_pending.append((list(regions), subj, len(rows0), vals))
            del stacked
        else:
            for region in regions:
                rows = rows_by_region[region]
                sel_acts = {l: a[rows] for l, a in acts.items()}
                names_r, vals = select_best_layer(
                    sel_acts, neural_by_region[region], method, fetch=False,
                    exact_ties=exact_sel)
                assert names_r == tap_names
                sel_pending.append(([region], subj, len(rows), vals))
                del sel_acts
        if len(sel_pending) >= 3:
            _drain_selection()
    while sel_pending:
        _drain_selection()
    del staged

    del acts
    LAST_PHASE_TIMES["phase1_selection_s"] = _time.perf_counter() - _t0
    _t0 = _time.perf_counter()
    rprint("  Freed bulk SRP activations", style="success")

    # The grouped scoring program's full signature is fixed the moment
    # phase-1 picks the layers — AOT-compile it NOW in a background
    # thread so its cold-compile wall (~75 s through the remote-compile
    # relay) overlaps phase-2 re-extraction instead of serializing
    # after it. Joined (with the phase-2 wall already paid) at scoring.
    boot_indices = None
    if bootstrap and shared_test_ids:
        from visreps_tpu.ops.bootstrap import bootstrap_indices

        boot_indices = bootstrap_indices(len(shared_test_ids), n_bootstrap, seed=42)
    pair_list = [(r, s) for r in regions for s in subjects]
    # The grouped one-program path runs under a multi-device mesh too:
    # grouped_scoring shards the bootstrap-iteration axis over 'data'
    # (VERDICT r4 item 2 — the v5e-8 target machine must not fall back
    # to the ~50-dispatch per-pair path the one-chip build eliminated).
    use_grouped = (bootstrap and method == "spearman"
                   and boot_indices is not None
                   and cfg.get("bootstrap_exact_ties", "auto") is not False)
    single_dev = mesh is None or mesh.shape.get("data", 1) == 1
    scoring_plan: list = [None]
    plan_thread = None
    if use_grouped and single_dev:
        import threading

        n_layers_sel = len({per_region_layers[r][s] for r, s in pair_list})
        widths = []
        for r, s in pair_list:
            first = next(iter(neural[r][s]["test"].values()))
            widths.append(int(np.asarray(first, np.float32).reshape(-1).size))
        n_test = len(shared_test_ids)
        bi_shape = boot_indices.shape

        def _precompile():
            try:
                from visreps_tpu.ops.bootstrap import grouped_scoring_plan

                scoring_plan[0] = grouped_scoring_plan(
                    n_layers_sel, widths, n_test, bi_shape[0], bi_shape[1])
            except Exception:  # plan is an optimization, never a failure
                scoring_plan[0] = None

        plan_thread = threading.Thread(target=_precompile, daemon=True)
        plan_thread.start()

    # ── Phase 2: exact taps on shared test stimuli ─────────────
    rprint("\n  Phase 2: Test evaluation", style="info")
    import jax as _jax

    unique_layers = sorted({l for rl in per_region_layers.values() for l in rl.values()})
    pca_k = cfg.get("pca_k", 1)
    sharded_rdm = (mesh is not None and
                   len(shared_test_ids) >= cfg.get("rdm_shard_threshold", 4096))

    test_order = [sid for sid in shared_test_ids if sid in stimuli]
    retained = getattr(extractor, "exact_store", None)
    retained_ok = (retained is not None
                   and not cfg.get("reconstruct_from_pcs")
                   and extractor.exact_ids == test_order)
    # Retention is BUDGETED (the largest taps — conv1-scale — are not
    # kept; VISREPS_EXACT_RETAIN_MB), so the retained store may cover
    # only some of the selected layers: build those RDMs straight from
    # it and re-extract only the missing ones.
    covered = [l for l in unique_layers if retained_ok and l in retained]
    missing = [l for l in unique_layers if l not in covered]
    exact_all = {l: retained[l] for l in covered}
    extractor.exact_store = None  # free the unselected retained taps
    del retained
    if covered:
        rprint(
            f"  Using retained exact taps for {len(covered)}/"
            f"{len(unique_layers)} selected layers "
            f"({len(test_order)} test stimuli)", style="success")

    if missing:
        test_stimuli = {sid: stimuli[sid] for sid in shared_test_ids if sid in stimuli}
        transform = get_transform("imgnet")
        # Phase 2 runs full-resolution (no SRP) taps: at batch 512 the
        # live f32 tap set is ~2 GB per program and the fused
        # concat/trim tails slow ~4x (measured 70 s vs 15 s on a 16 GB
        # chip). H2D is not the bottleneck here (1k stimuli), so cap
        # the re-extraction batch.
        dl_test = make_stimuli_loader(test_stimuli, transform,
                                      min(int(cfg.batchsize), 256),
                                      cfg.get("num_workers", 16))
        rprint(f"  Test dataloader: {len(test_stimuli)} stimuli", style="success")
        # One pass over the test stimuli computes every missing selected
        # layer (reference re-extracts per layer, evals.py:286-301 — that
        # multiplies the host decode + H2D cost by the layer count).
        rprint(f"  Re-extracting {len(missing)} unique layers (one pass)...",
               style="info")
        exact_store_kind = "device" if _jax.default_backend() != "cpu" else "host"
        fetched, _ = extractor.extract_layers_exact(
            dl_test, missing, shared_test_ids, store=exact_store_kind,
            batch_size=min(int(cfg.batchsize), 256), stable_signature=True)
        exact_all.update(fetched)

    if not cfg.get("reconstruct_from_pcs") and not sharded_rdm:
        # All per-layer RDMs in ONE program: each is a trivial matmul
        # (N² × D on the MXU), so the per-layer dispatch round-trips —
        # not the FLOPs — dominate through a relay-attached host.
        # (No donation: the (n, n) outputs cannot alias the big f32
        # inputs, so XLA rejects it — freeing happens at exact_all={}.)
        model_rdms = _jax.jit(
            lambda d: {k: compute_rdm(v) for k, v in d.items()})(exact_all)
        exact_all = {}
    else:
        model_rdms = {}
        for layer in unique_layers:
            exact_acts = exact_all.pop(layer)
            if cfg.get("reconstruct_from_pcs"):
                exact_acts = np.asarray(reconstruct_from_pcs({layer: exact_acts}, pca_k)[layer])
                rprint(f"    Reconstructed from {pca_k} PCs", style="info")
            model_rdms[layer] = _rdm(exact_acts, mesh, cfg)
            del exact_acts
    LAST_PHASE_TIMES["phase2_extract_s"] = _time.perf_counter() - _t0
    LAST_PHASE_TIMES["phase2_retained"] = (
        len(covered) / len(unique_layers) if unique_layers else 0.0)
    _t0 = _time.perf_counter()

    # ── Per-(region, subject) scoring + save ───────────────────
    # Same pipelining as Phase 1: every pair's point score + bootstrap
    # distribution is dispatched ahead (device handles only) and
    # fetched a few pairs behind — 48 pairs' device time is seconds,
    # but 48 serialized host syncs dominate on relay-attached hosts.
    # Bootstrap index sets are identical across pairs (same n, seed 42
    # per the protocol), so they are generated once.
    # The common case — Spearman bootstrap with the shared protocol
    # index sets — runs the WHOLE scoring phase in ONE device program
    # (ops/bootstrap.grouped_scoring; under a multi-device mesh the
    # iteration axis shards over 'data'): per-pair neural RDM
    # triangles, full-triangle average-tie point scores, and the
    # grouped bootstrap (per-iteration selection masks shared across
    # pairs, per-layer rank passes shared across the pairs that
    # selected the same layer) — one dispatch + one fetch instead of
    # ~50 kernel round-trips through the relay, no (P, n, n) RDM
    # stacks, and no tie detection. (use_grouped/boot_indices computed
    # before phase 2; the program itself may already be AOT-compiled by
    # the background plan thread.)
    # An explicit bootstrap_exact_ties=false forces the per-pair
    # dense-rank path (the grouped kernel is always average-tie exact,
    # which would silently ignore that override).
    boot_by_pair = None
    neural_rdms = None
    if use_grouped:
        from visreps_tpu.ops.bootstrap import grouped_scoring

        if plan_thread is not None:
            plan_thread.join()
        neural_mats = {
            (r, s): _neural_tensor(neural[r][s]["test"], shared_test_ids)
            for r, s in pair_list
        }
        boot_by_pair, point_of_pair = grouped_scoring(
            model_rdms, neural_mats,
            {(r, s): per_region_layers[r][s] for r, s in pair_list},
            boot_indices, plan=scoring_plan[0], mesh=mesh)
        del neural_mats
    else:
        # Fallback (other methods, sharded bootstrap, forced dense
        # ranks): batched neural RDMs + point scores, per-pair
        # bootstraps pipelined below.
        neural_tensors = {
            f"{region}|{subj}": _neural_tensor(neural[region][subj]["test"],
                                               shared_test_ids)
            for region, subj in pair_list
        }
        if mesh is None or mesh.shape.get("data", 1) == 1:
            # One program for all neural RDMs (mixed voxel widths are
            # fine — each entry is its own matmul inside the jit).
            rdm_dict = jax.jit(lambda d: {k: compute_rdm(v) for k, v in d.items()})(
                {k: jnp.asarray(v) for k, v in neural_tensors.items()})
            neural_rdms = {(r, s): rdm_dict[f"{r}|{s}"] for r, s in pair_list}
        else:
            neural_rdms = {
                (r, s): _rdm(neural_tensors[f"{r}|{s}"], mesh, cfg)
                for r, s in pair_list
            }
        del neural_tensors
        from visreps_tpu.ops.rdm import compute_rdm_correlation_batched

        model_stack = jnp.stack(
            [model_rdms[per_region_layers[r][s]] for r, s in pair_list])
        neural_stack = jnp.stack([neural_rdms[k] for k in pair_list])
        point_scores = np.asarray(
            compute_rdm_correlation_batched(model_stack, neural_stack, method))
        del model_stack, neural_stack
        point_of_pair = {k: float(v) for k, v in zip(pair_list, point_scores)}

    # Per-pair fallback (other methods, sharded bootstrap): point
    # scores use average-tie Spearman; the bootstrap fast path uses
    # dense ranks (identical on tie-free triangles). Detect ties per
    # pair and route tied pairs through the exact average-tie bootstrap
    # so the CI always brackets the reported statistic.
    exact_by_pair = {k: False for k in pair_list}
    if bootstrap and method == "spearman" and not use_grouped:
        mode = cfg.get("bootstrap_exact_ties", "auto")
        if mode == "auto":
            from visreps_tpu.ops.rdm import triangle_tie_count

            lt = {l: triangle_tie_count(model_rdms[l]) for l in unique_layers}
            pt = {k: triangle_tie_count(neural_rdms[k]) for k in pair_list}
            lt = dict(zip(lt, (int(v) for v in jax.device_get(list(lt.values())))))
            pt = dict(zip(pt, (int(v) for v in jax.device_get(list(pt.values())))))
            exact_by_pair = {
                (r, s): (lt[per_region_layers[r][s]] + pt[(r, s)]) > 0
                for r, s in pair_list
            }
        elif mode:
            exact_by_pair = {k: True for k in pair_list}
        n_exact = sum(exact_by_pair.values())
        if n_exact:
            rprint(f"  {n_exact}/{len(pair_list)} pairs have tied RDM values "
                   "-> exact average-tie bootstrap", style="info")

    score_pending: deque = deque()
    all_results = []

    def _drain_score():
        region, subj, best_layer, point, boot_dev = score_pending.popleft()
        ci_low = ci_high = None
        bootstrap_scores_list = None
        if boot_dev is not None:
            boot = np.asarray(boot_dev, dtype=np.float64)
            ci_low, ci_high = percentile_ci(boot)
            bootstrap_scores_list = boot.tolist()

        msg = f"    {region} subj {subj} | {method.capitalize():<10}| {best_layer} = {point:.4f}"
        if boot_dev is not None:
            msg += f"  [95% CI: {ci_low:.4f}, {ci_high:.4f}]"
        rprint(msg, style="highlight")

        result = {
            "layer": best_layer,
            "compare_method": method,
            "score": point,
            "ci_low": ci_low,
            "ci_high": ci_high,
            "analysis": "rsa",
            "layer_selection_scores": per_region_scores[region][subj],
        }
        if bootstrap_scores_list is not None:
            result["bootstrap_scores"] = bootstrap_scores_list
        if cfg.get("log_expdata"):
            save_cfg = cfg.merge({"subject_idx": subj, "region": region})
            save_results([result], save_cfg)
        all_results.append(result)

    last_region = None
    for region, subj in pair_list:
        if region != last_region:
            rprint(f"\n  -- Region: {region} --", style="info")
            last_region = region
        best_layer = per_region_layers[region][subj]
        boot_dev = None
        if boot_by_pair is not None:
            boot_dev = boot_by_pair[(region, subj)]
        elif bootstrap:
            boot_dev = bootstrap_rdm_correlation(
                model_rdms[best_layer], neural_rdms[(region, subj)],
                n_bootstrap=n_bootstrap, seed=42, method=method, mesh=mesh,
                indices=boot_indices, fetch=False,
                exact_ties=exact_by_pair[(region, subj)],
            )
        score_pending.append(
            (region, subj, best_layer, point_of_pair[(region, subj)], boot_dev))
        if len(score_pending) >= 8:
            _drain_score()
    while score_pending:
        _drain_score()

    LAST_PHASE_TIMES["scoring_bootstrap_s"] = _time.perf_counter() - _t0
    return all_results


# ───────────── NSD Synthetic branch ──────────────────────
def _lookup_nsd_best_layers(cfg, subjects, regions) -> Dict:
    """Query results.db for each (subject, region)'s NSD-selected layer.

    Reference: evals.py:404-439.
    """
    method = cfg.get("compare_method", "spearman").lower()
    conn = sqlite3.connect(str(RESULTS_DB_PATH))
    layers: Dict = {}
    for region in regions:
        layers[region] = {}
        for subj in subjects:
            nsd_cfg = cfg.merge({
                "neural_dataset": "nsd", "analysis": "rsa",
                "subject_idx": subj, "region": region, "compare_method": method,
            })
            run_id = compute_run_id(nsd_cfg)
            try:
                row = conn.execute(
                    "SELECT layer FROM results WHERE run_id=? AND compare_method=?",
                    (run_id, method),
                ).fetchone()
            except sqlite3.OperationalError:  # fresh/empty DB
                row = None
            if row is None:
                conn.close()
                raise ValueError(
                    f"No NSD RSA result found (run_id={run_id}) for seed={cfg.seed}, "
                    f"region={region}, subj={subj}, cfg_id={cfg.get('cfg_id')}. Run NSD eval first."
                )
            layers[region][subj] = row[0]
    conn.close()
    return layers


def _eval_rsa_nsd_synthetic(cfg, subjects, regions, verbose, mesh=None) -> List[Dict]:
    """RSA on 220 synthetic stimuli with NSD-inherited layers.

    Reference: evals.py:442-548.
    """
    method = cfg.get("compare_method", "spearman").lower()
    bootstrap = cfg.get("bootstrap", False)
    n_bootstrap = cfg.get("n_bootstrap", 1000)

    best_layers = _lookup_nsd_best_layers(cfg, subjects, regions)
    test_data = load_nsd_synthetic_test_data(cfg, subjects=subjects, regions=regions)
    test_ids = test_data["test_ids"]
    rprint(f"  Loaded {len(test_ids)} synthetic test stimuli", style="success")

    state = load_model(cfg, verbose=verbose)
    extractor = configure_feature_extractor(cfg, state, verbose=verbose, mesh=mesh)
    transform = get_transform("imgnet")
    dl_test = make_stimuli_loader(
        test_data["stimuli"], transform, cfg.batchsize, cfg.get("num_workers", 16)
    )

    unique_layers = sorted({l for rl in best_layers.values() for l in rl.values()})
    pca_k = cfg.get("pca_k", 1)
    rprint(f"  Extracting {len(unique_layers)} unique layers (one pass)...",
           style="info")
    import jax as _jax

    exact_store = "device" if _jax.default_backend() != "cpu" else "host"
    exact_all, _ = extractor.extract_layers_exact(
        dl_test, unique_layers, test_ids, store=exact_store,
        stable_signature=True)
    sharded_rdm = (mesh is not None and
                   len(test_ids) >= cfg.get("rdm_shard_threshold", 4096))
    if not cfg.get("reconstruct_from_pcs") and not sharded_rdm:
        # One program for all per-layer RDMs (see _eval_rsa phase 2).
        model_rdms = _jax.jit(
            lambda d: {k: compute_rdm(v) for k, v in d.items()})(exact_all)
        exact_all = {}
    else:
        model_rdms = {}
        for layer in unique_layers:
            exact_acts = exact_all.pop(layer)
            if cfg.get("reconstruct_from_pcs"):
                exact_acts = np.asarray(reconstruct_from_pcs({layer: exact_acts}, pca_k)[layer])
            model_rdms[layer] = _rdm(exact_acts, mesh, cfg)
            del exact_acts

    # Scoring, same structure as _eval_rsa: the grouped one-program
    # path (neural RDMs + point scores + bootstrap fused) when it
    # applies, else batched point scores + tie-aware per-pair
    # bootstraps pipelined below.
    from collections import deque

    import jax

    from visreps_tpu.ops.bootstrap import bootstrap_indices

    pair_list = [(r, s) for r in regions for s in subjects]
    boot_indices = (bootstrap_indices(len(test_ids), n_bootstrap, seed=42)
                    if bootstrap and test_ids else None)

    use_grouped = (bootstrap and method == "spearman"
                   and boot_indices is not None
                   and cfg.get("bootstrap_exact_ties", "auto") is not False)
    boot_by_pair = None
    neural_rdms = None
    if use_grouped:
        from visreps_tpu.ops.bootstrap import grouped_scoring

        neural_mats = {
            (r, s): _neural_tensor(test_data["neural"][r][s], test_ids)
            for r, s in pair_list
        }
        boot_by_pair, point_of_pair = grouped_scoring(
            model_rdms, neural_mats,
            {(r, s): best_layers[r][s] for r, s in pair_list},
            boot_indices, mesh=mesh)
        del neural_mats
    else:
        from visreps_tpu.ops.rdm import compute_rdm_correlation_batched

        neural_rdms = {}
        for region, subj in pair_list:
            neural_tensor = _neural_tensor(test_data["neural"][region][subj], test_ids)
            neural_rdms[(region, subj)] = _rdm(neural_tensor, mesh, cfg)
        model_stack = jnp.stack([model_rdms[best_layers[r][s]] for r, s in pair_list])
        neural_stack = jnp.stack([neural_rdms[k] for k in pair_list])
        point_scores = np.asarray(
            compute_rdm_correlation_batched(model_stack, neural_stack, method))
        del model_stack, neural_stack
        point_of_pair = {k: float(v) for k, v in zip(pair_list, point_scores)}

    exact_by_pair = {k: False for k in pair_list}
    if bootstrap and method == "spearman" and not use_grouped:
        mode = cfg.get("bootstrap_exact_ties", "auto")
        if mode == "auto":
            from visreps_tpu.ops.rdm import triangle_tie_count

            lt = {l: triangle_tie_count(model_rdms[l]) for l in unique_layers}
            pt = {k: triangle_tie_count(neural_rdms[k]) for k in pair_list}
            lt = dict(zip(lt, (int(v) for v in jax.device_get(list(lt.values())))))
            pt = dict(zip(pt, (int(v) for v in jax.device_get(list(pt.values())))))
            exact_by_pair = {
                (r, s): (lt[best_layers[r][s]] + pt[(r, s)]) > 0
                for r, s in pair_list
            }
        elif mode:
            exact_by_pair = {k: True for k in pair_list}

    all_results = []
    pending: deque = deque()

    def _drain():
        region, subj, best_layer, point, boot_dev = pending.popleft()
        ci_low = ci_high = None
        bootstrap_scores_list = None
        if boot_dev is not None:
            boot = np.asarray(boot_dev, dtype=np.float64)
            ci_low, ci_high = percentile_ci(boot)
            bootstrap_scores_list = boot.tolist()

        msg = f"    {region} subj {subj} | {method.capitalize():<10}| {best_layer} = {point:.4f}"
        if boot_dev is not None:
            msg += f"  [95% CI: {ci_low:.4f}, {ci_high:.4f}]"
        rprint(msg, style="highlight")

        result = {
            "layer": best_layer,
            "compare_method": method,
            "score": point,
            "ci_low": ci_low,
            "ci_high": ci_high,
            "analysis": "rsa",
            "layer_selection_scores": [],
        }
        if bootstrap_scores_list is not None:
            result["bootstrap_scores"] = bootstrap_scores_list
        if cfg.get("log_expdata"):
            save_cfg = cfg.merge({"subject_idx": subj, "region": region})
            save_results([result], save_cfg)
        all_results.append(result)

    last_region = None
    for region, subj in pair_list:
        if region != last_region:
            rprint(f"\n  -- Region: {region} --", style="info")
            last_region = region
        best_layer = best_layers[region][subj]
        boot_dev = None
        if boot_by_pair is not None:
            boot_dev = boot_by_pair[(region, subj)]
        elif bootstrap:
            boot_dev = bootstrap_rdm_correlation(
                model_rdms[best_layer], neural_rdms[(region, subj)],
                n_bootstrap=n_bootstrap, seed=42, method=method, mesh=mesh,
                indices=boot_indices, fetch=False,
                exact_ties=exact_by_pair[(region, subj)],
            )
        pending.append((region, subj, best_layer, point_of_pair[(region, subj)], boot_dev))
        if len(pending) >= 8:
            _drain()
    while pending:
        _drain()

    return all_results


# ──────────────── encoding branch ────────────────────────
def _eval_encoding(cfg, acts, ids, all_data, subjects, regions, verbose,
                   mesh=None) -> List[Dict]:
    """Encoding score, batched per SUBJECT across regions and layers.

    Reference: evals.py:552-590 loops 48 (region, subject) RidgeCV
    pipelines serially; within a subject X is identical across regions
    (same stimuli, different voxels), so regions' voxel blocks fit as
    one concatenated Y and the 14 layer selections run as one stacked
    program (analysis/encoding.compute_encoding_scores_subject).
    Falls back to the per-pair path when regions don't share stimulus
    sets or encoding_batched=false.
    """
    from visreps_tpu.analysis.encoding import compute_encoding_scores_subjects

    neural = all_data["neural"]
    all_results = []
    batched = cfg.get("encoding_batched", True)
    pca_k = cfg.get("pca_k", 1) if cfg.get("reconstruct_from_pcs") else None

    if batched:
        for subj in subjects:
            key_sets = {
                split: [frozenset(neural[r][subj][split].keys()) for r in regions]
                for split in ("train", "test")
            }
            if any(ks != key_sets[split][0] for split, lst in key_sets.items() for ks in lst):
                batched = False
                break
        if batched:
            # Stimulus-axis mesh sharding (VERDICT r4 item 4): row-shard
            # every (n, d) design matrix and (n, v) target block over
            # 'data' — GSPMD then partitions the Gram/eigh/CV programs
            # in ops/ridge.py and inserts the psums over ICI; numbers
            # are identical (the dryrun proves row-sharded ridge_cv
            # parity, __graft_entry__.py). Reference equivalent:
            # himalaya torch_cuda ridge on one GPU
            # (visreps/analysis/encoding_score.py:105).
            shard_rows = None
            if mesh is not None and mesh.shape.get("data", 1) > 1:
                import jax as _jax
                from jax.sharding import NamedSharding, PartitionSpec as P

                row = NamedSharding(mesh, P("data", None))
                ndev = mesh.shape["data"]

                def shard_rows(x):
                    # device_put rejects uneven shardings; arrays whose
                    # stimulus axis doesn't divide the mesh replicate
                    # (at NSD scale 9k/1k rows divide a v5e-8 evenly).
                    x = jnp.asarray(x, jnp.float32)
                    if x.shape[0] % ndev:
                        return x
                    return _jax.device_put(x, row)

            subject_inputs = {}
            for subj in subjects:
                train_acts, _, train_ids = align_stimulus_level(
                    acts, neural[regions[0]][subj]["train"], ids
                )
                test_acts, _, test_ids = align_stimulus_level(
                    acts, neural[regions[0]][subj]["test"], ids
                )
                y_train = {
                    r: np.stack([np.asarray(neural[r][subj]["train"][sid], np.float32).reshape(-1)
                                 for sid in train_ids])
                    for r in regions
                }
                y_test = {
                    r: np.stack([np.asarray(neural[r][subj]["test"][sid], np.float32).reshape(-1)
                                 for sid in test_ids])
                    for r in regions
                }
                if shard_rows is not None:
                    train_acts = {l: shard_rows(a) for l, a in train_acts.items()}
                    test_acts = {l: shard_rows(a) for l, a in test_acts.items()}
                    y_train = {r: shard_rows(y) for r, y in y_train.items()}
                    y_test = {r: shard_rows(y) for r, y in y_test.items()}
                subject_inputs[subj] = (train_acts, test_acts, y_train, y_test)
            # Shipping default cv_precision="high": the CV sweep's
            # per-alpha matmuls only RANK alphas — scores at "high"
            # match "highest" to 5 decimals on chip at full NSD voxel
            # scale incl. the 7,604-voxel ventral ROI, with identical
            # selected layers (BENCH_r03 encoding_high_vs_highest_
            # score_delta=0.0), while the 48-pair full-NSD eval lands
            # ~2× faster (~297 s vs ~560 s extrapolated). The Woodbury
            # small system and the refit stay HIGHEST regardless
            # (ops/ridge.py). Override encoding_cv_precision=highest to
            # force full precision everywhere.
            per_subject = compute_encoding_scores_subjects(
                subject_inputs,
                bootstrap=cfg.get("bootstrap", True),
                n_bootstrap=cfg.get("n_bootstrap", 1000),
                verbose=verbose, reconstruct_pca_k=pca_k,
                cv_precision=cfg.get("encoding_cv_precision", "high"),
            )
            for subj in subjects:
                for region in regions:
                    scores = per_subject[subj][region]
                    if cfg.get("log_expdata"):
                        save_cfg = cfg.merge({"subject_idx": subj, "region": region})
                        save_results(scores, save_cfg)
                    all_results.extend(scores)
            return all_results

    for region in regions:
        rprint(f"\n  -- Region: {region} --", style="info")
        for subj in subjects:
            train_data, test_data = prepare_traintest_alignment(cfg, acts, neural[region][subj], ids)
            scores = compute_traintest_alignment(cfg, train_data, test_data, verbose=verbose, mesh=mesh)
            del train_data, test_data
            if cfg.get("log_expdata"):
                save_cfg = cfg.merge({"subject_idx": subj, "region": region})
                save_results(scores, save_cfg)
            all_results.extend(scores)
    return all_results
