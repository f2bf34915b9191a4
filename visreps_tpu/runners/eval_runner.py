"""Eval sweep CLI.

Reference parity: scripts/runners/eval_runner.py — injects
``log_expdata=True load_model_from=checkpoint`` and maps
``eval_checkpoint_at_epoch`` → ``checkpoint_model``.
"""
from __future__ import annotations

import argparse

from visreps_tpu.runners.base_runner import ExperimentRunner


def main(argv=None):
    parser = argparse.ArgumentParser(description="Run evaluation sweeps from a grid JSON")
    parser.add_argument("--grid", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--jobs", type=int, default=1)
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args(argv)

    runner = ExperimentRunner(
        mode="eval", grid_path=args.grid, config=args.config,
        extra_overrides={"log_expdata": True, "load_model_from": "checkpoint"},
        jobs=args.jobs, dry_run=args.dry_run,
    )
    # Map eval_checkpoint_at_epoch → checkpoint_model filename
    for combo in runner.combos:
        if "eval_checkpoint_at_epoch" in combo:
            epoch = combo.pop("eval_checkpoint_at_epoch")
            combo["checkpoint_model"] = f"checkpoint_epoch_{epoch}.pth"
    codes = runner.run_all()
    raise SystemExit(max(codes) if codes else 0)


if __name__ == "__main__":
    main()
