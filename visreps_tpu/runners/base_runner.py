"""Grid sweep runner: Cartesian product of list-valued params.

Reference parity: scripts/runners/base_runner.py:7-108 — grid JSON is
a list of param-dict groups; LIST values are swept (itertools.product),
scalars are fixed; nested dicts flatten to dot-notation overrides; each
combo launches ``python -m visreps_tpu.run`` via subprocess.

TPU addition: ``jobs > 1`` fans combos out across concurrent
subprocesses (each pinned to its own TPU slice via env), replacing the
reference's SLURM-only parallelism for single-host multi-chip boxes.
"""
from __future__ import annotations

import itertools
import json
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from visreps_tpu.core.logging import rprint


def _flatten(d: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def load_param_grid(grid_path: str | Path) -> list[dict]:
    """Expand a grid JSON into a list of override dicts."""
    with open(grid_path) as f:
        groups = json.load(f)
    if isinstance(groups, dict):
        groups = [groups]

    combos: list[dict] = []
    for group in groups:
        flat = _flatten(group)
        sweep_keys = [k for k, v in flat.items() if isinstance(v, list)]
        fixed = {k: v for k, v in flat.items() if not isinstance(v, list)}
        if sweep_keys:
            for values in itertools.product(*(flat[k] for k in sweep_keys)):
                combo = dict(fixed)
                combo.update(dict(zip(sweep_keys, values)))
                combos.append(combo)
        else:
            combos.append(fixed)
    return combos


def _fmt_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return json.dumps(v) if isinstance(v, (list, dict)) else str(v)


class ExperimentRunner:
    """Run every grid combo as a subprocess of visreps_tpu.run."""

    def __init__(self, mode: str, grid_path: str | Path | None = None,
                 config: str | None = None, extra_overrides: dict | None = None,
                 jobs: int = 1, dry_run: bool = False, env_per_job=None,
                 retries: int = 0):
        self.mode = mode
        self.config = config
        self.combos = load_param_grid(grid_path) if grid_path else [{}]
        self.extra_overrides = extra_overrides or {}
        self.jobs = jobs
        self.dry_run = dry_run
        self.env_per_job = env_per_job  # callable(job_idx) -> env dict update
        # Failure handling: re-runs are idempotent (results.db INSERT OR
        # REPLACE), so retrying a failed combo is always safe.
        self.retries = retries

    def _command(self, combo: dict) -> list[str]:
        overrides = {**combo, **self.extra_overrides}
        cmd = [sys.executable, "-m", "visreps_tpu.run", "--mode", self.mode]
        if self.config:
            cmd += ["--config", self.config]
        if overrides:
            cmd += ["--override"] + [f"{k}={_fmt_value(v)}" for k, v in overrides.items()]
        return cmd

    def _run_one(self, idx_combo):
        import os

        idx, combo = idx_combo
        cmd = self._command(combo)
        rprint(f"[{idx + 1}/{len(self.combos)}] {' '.join(cmd)}", style="setup")
        if self.dry_run:
            return 0
        env = dict(os.environ)
        if self.env_per_job:
            env.update(self.env_per_job(idx))
        rc = subprocess.run(cmd, env=env).returncode
        for attempt in range(self.retries):
            if rc == 0:
                break
            rprint(f"combo {idx} failed (rc={rc}); retry {attempt + 1}/{self.retries}",
                   style="warning")
            rc = subprocess.run(cmd, env=env).returncode
        return rc

    def run_all(self) -> list[int]:
        if self.jobs <= 1:
            return [self._run_one(x) for x in enumerate(self.combos)]
        with ThreadPoolExecutor(max_workers=self.jobs) as pool:
            return list(pool.map(self._run_one, enumerate(self.combos)))
