"""Sweep schedulers: the 87-model training matrix + eval fan-out.

Reference parity: scripts/slurm/train_scheduler.py:13-111 and
eval_scheduler.py — hardcoded PARAM_GRID (seeds × granularities ×
label sources), checkpoint_dir derived from pca_labels_folder, one job
per combo. Two backends:

  * ``--backend slurm``: emit + submit sbatch scripts (TPU partition);
  * ``--backend local``: fan out subprocesses on this host, one per
    TPU slice, setting TPU_VISIBLE_DEVICES per job.
"""
from __future__ import annotations

import argparse
import itertools
import os
import subprocess
import sys
from pathlib import Path

from visreps_tpu.core.logging import rprint

TRAIN_PARAM_GRID = {
    "seed": [1, 2, 3],
    "pca_n_classes": [2, 4, 8, 16, 32, 64],
    "pca_labels_folder": [
        "pca_labels_alexnet",
        "pca_labels_clip",
        "pca_labels_dino",
        "pca_labels_vit",
    ],
}

EVAL_PARAM_GRID = {
    "seed": [1, 2, 3],
    "cfg_id": [2, 4, 8, 16, 32, 64],
    "analysis": ["rsa"],
    "compare_method": ["spearman"],
}


def expand_grid(grid: dict) -> list[dict]:
    keys = list(grid)
    return [dict(zip(keys, vals)) for vals in itertools.product(*(grid[k] for k in keys))]


def train_overrides(combo: dict) -> dict:
    """checkpoint_dir derives from the label source (reference:
    train_scheduler.py:37-48)."""
    source = combo["pca_labels_folder"].replace("pca_labels_", "")
    return {
        "seed": combo["seed"],
        "pca_labels": True,
        "pca_n_classes": combo["pca_n_classes"],
        "pca_labels_folder": combo["pca_labels_folder"],
        "checkpoint_dir": f"pca_{source}",
        "log_checkpoints": True,
    }


def generate_slurm_script(job_name: str, command: str, out_dir: Path,
                          partition: str = "tpu", time_limit: str = "08:00:00",
                          cpus: int = 32) -> Path:
    script = f"""#!/bin/bash
#SBATCH --job-name={job_name}
#SBATCH --partition={partition}
#SBATCH --time={time_limit}
#SBATCH --cpus-per-task={cpus}
#SBATCH --output={out_dir}/{job_name}.%j.out

{command}
"""
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"{job_name}.sh"
    path.write_text(script)
    return path


def _command(mode: str, overrides: dict, config: str | None) -> str:
    parts = [sys.executable, "-m", "visreps_tpu.run", "--mode", mode]
    if config:
        parts += ["--config", config]
    parts += ["--override"] + [f"{k}={v}" for k, v in overrides.items()]
    return " ".join(str(p) for p in parts)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Submit the training/eval sweep matrix")
    parser.add_argument("--mode", choices=["train", "eval"], default="train")
    parser.add_argument("--backend", choices=["slurm", "local", "print"], default="print")
    parser.add_argument("--config", default=None)
    parser.add_argument("--partition", default="tpu")
    parser.add_argument("--jobs", type=int, default=1, help="local backend concurrency")
    parser.add_argument("--out-dir", default="slurm_scripts")
    args = parser.parse_args(argv)

    grid = TRAIN_PARAM_GRID if args.mode == "train" else EVAL_PARAM_GRID
    combos = expand_grid(grid)
    rprint(f"{len(combos)} jobs in the {args.mode} matrix", style="info")

    procs = []
    for i, combo in enumerate(combos):
        overrides = train_overrides(combo) if args.mode == "train" else dict(combo)
        cmd = _command(args.mode, overrides, args.config)
        name = f"{args.mode}_{i:03d}"
        if args.backend == "print":
            print(cmd)
        elif args.backend == "slurm":
            script = generate_slurm_script(name, cmd, Path(args.out_dir), args.partition)
            subprocess.run(["sbatch", str(script)], check=False)
        else:  # local
            env = dict(os.environ)
            procs.append(subprocess.Popen(cmd.split(), env=env))
            if len(procs) >= args.jobs:
                procs.pop(0).wait()
    for p in procs:
        p.wait()


if __name__ == "__main__":
    main()
