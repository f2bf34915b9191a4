"""CLI entry point: python -m visreps_tpu.run --mode {train,eval} ...

Reference parity: visreps/run.py — same flags (--mode, --config,
--override k=v ..., --verbose), default config at
configs/{mode}/base.json, validation before dispatch. TPU addition:
--procs K subject-shards a multi-subject eval across K concurrent
processes (each runs the unchanged eval over a disjoint subject
subset into the one shared WAL results.db); workers stay
protocol-exact by intersecting shared-test ids over the FULL subject
list (shared_test_subjects). Use --procs only on directly-attached
(PCIe-fed) or multi-host TPU deployments, where subject sharding
parallelizes decode + H2D per host. On a remote-compile RELAY
terminal it is a large LOSS: the relay serializes dispatch
round-trips across clients, so per-op latency multiplies (measured
3-proc e2e 1759 s vs ~290 s single-process — see bench.py and
CLAUDE.md).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

from visreps_tpu.core.config import load_config
from visreps_tpu.core.validate import validate_config


def _shard_worker_argvs(args, cfg) -> list[list[str]] | None:
    """argv for each subject-shard worker, or None when sharding
    doesn't apply (single subject, non-eval, or --procs 1).

    Each worker re-invokes this CLI with subject_idx overridden to its
    shard and shared_test_subjects pinned to the full subject list so
    NSD's shared-test intersection (data/neural.load_all_nsd_data)
    matches the unsharded run exactly.
    """
    if args.procs <= 1 or args.mode != "eval":
        return None
    subjects = cfg.get("subject_idx")
    if not isinstance(subjects, list) or len(subjects) <= 1:
        return None
    n = min(args.procs, len(subjects))
    test_subjects = cfg.get("shared_test_subjects") or subjects
    full = json.dumps(list(test_subjects), separators=(",", ":"))
    argvs = []
    for i in range(n):
        shard = json.dumps(subjects[i::n], separators=(",", ":"))
        # Workers split one chip's HBM K ways: force phase-1 row
        # retention so each worker's device store stays ~1/K-sized
        # (user --override acts_retain=... still wins, appended later).
        ov = ["acts_retain=true"] + list(args.override) + [
            f"subject_idx={shard}", f"shared_test_subjects={full}"]
        argv = ["--mode", "eval", "--procs", "1", "--override", *ov]
        if args.config:
            argv += ["--config", args.config]
        if args.verbose:
            argv += ["--verbose"]
        argvs.append(argv)
    return argvs


def _run_sharded(argvs: list[list[str]]) -> int:
    import subprocess

    procs = [subprocess.Popen([sys.executable, "-m", "visreps_tpu.run", *a])
             for a in argvs]
    rc = 0
    for a, p in zip(argvs, procs):
        if p.wait() != 0:
            print(f"subject-shard worker failed (rc={p.returncode}): {a}",
                  file=sys.stderr)
            rc = 1
    return rc


def main(argv=None):
    parser = argparse.ArgumentParser(description="Training and evaluation script")
    parser.add_argument("--mode", choices=["train", "eval"], default="eval")
    parser.add_argument("--config", default=None)
    parser.add_argument("--override", nargs="*", default=[])
    parser.add_argument("--verbose", "-v", action="store_true")
    parser.add_argument(
        "--procs", type=int, default=1,
        help="subject-shard an eval across K concurrent processes "
             "(disjoint subject subsets, one shared results.db)")
    args = parser.parse_args(argv)

    # The TPU terminal's sitecustomize pins jax_platforms="axon,cpu" and
    # ignores the JAX_PLATFORMS env var; this hook lets subprocess
    # workers (and CI) force a platform before any backend init.
    plat = os.environ.get("VISREPS_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    overrides = list(args.override)
    if args.verbose:
        overrides.append("verbose=true")
    overrides.append(f"mode={args.mode}")

    cfg = load_config(args.config or f"configs/{args.mode}/base.json", overrides)
    cfg = validate_config(cfg)

    worker_argvs = _shard_worker_argvs(args, cfg)
    if worker_argvs:
        raise SystemExit(_run_sharded(worker_argvs))

    # Multi-chip by default: one ('data', 'model') mesh over every
    # visible device (None single-chip; --override use_mesh=false).
    from visreps_tpu.parallel.auto import default_mesh

    mesh = default_mesh(cfg)

    if cfg.mode == "train":
        from visreps_tpu.train.trainer import Trainer

        Trainer(cfg, mesh=mesh).train()
    else:
        from visreps_tpu import evals

        evals.eval(cfg, mesh=mesh)


if __name__ == "__main__":
    main()
