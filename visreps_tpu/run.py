"""CLI entry point: python -m visreps_tpu.run --mode {train,eval} ...

Reference parity: visreps/run.py — same flags (--mode, --config,
--override k=v ..., --verbose), default config at
configs/{mode}/base.json, validation before dispatch.
"""
from __future__ import annotations

import argparse

from visreps_tpu.core.config import load_config
from visreps_tpu.core.validate import validate_config


def main(argv=None):
    parser = argparse.ArgumentParser(description="Training and evaluation script")
    parser.add_argument("--mode", choices=["train", "eval"], default="eval")
    parser.add_argument("--config", default=None)
    parser.add_argument("--override", nargs="*", default=[])
    parser.add_argument("--verbose", "-v", action="store_true")
    args = parser.parse_args(argv)

    overrides = list(args.override)
    if args.verbose:
        overrides.append("verbose=true")
    overrides.append(f"mode={args.mode}")

    cfg = load_config(args.config or f"configs/{args.mode}/base.json", overrides)
    cfg = validate_config(cfg)

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
