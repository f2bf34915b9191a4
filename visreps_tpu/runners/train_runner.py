"""Train sweep CLI. Reference parity: scripts/runners/train_runner.py."""
from __future__ import annotations

import argparse

from visreps_tpu.runners.base_runner import ExperimentRunner


def main(argv=None):
    parser = argparse.ArgumentParser(description="Run training sweeps from a grid JSON")
    parser.add_argument("--grid", required=True, help="Path to grid JSON (configs/grids/...)")
    parser.add_argument("--config", default=None, help="Base config (default configs/train/base.json)")
    parser.add_argument("--jobs", type=int, default=1)
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args(argv)

    runner = ExperimentRunner(
        mode="train", grid_path=args.grid, config=args.config,
        jobs=args.jobs, dry_run=args.dry_run,
    )
    codes = runner.run_all()
    raise SystemExit(max(codes) if codes else 0)


if __name__ == "__main__":
    main()
