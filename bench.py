"""Benchmark: the BASELINE.json north-star workload on one TPU chip.

Orchestrates isolated stage subprocesses (visreps_tpu/benchmarks/
stages.py) so a device fault in one stage can't kill the benchmark,
then prints ONE JSON line:

  {"metric": "nsd_e2e_73k_extract_plus_8subj_bootstrap_rsa",
   "value": <projected seconds>, "unit": "s", "vs_baseline": 300/value}

Projection = 73k-image 14-tap AlexNet extraction + 48 (region,subject)
layer selections + exact re-extraction + 48×1000-iter Spearman
bootstraps, from measured stage throughputs. vs_baseline > 1 beats the
driver's <5 min target. Stages use device-resident synthetic data (the
TPU compute pipeline, not host JPEG decode).
"""
from __future__ import annotations

import json
import subprocess
import sys

STAGE_TIMEOUT = 1200  # first compile on a cold remote-compile service is slow


def run_stage(name: str, timeout: int = STAGE_TIMEOUT):
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "visreps_tpu.benchmarks.stages", name],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print(f"# stage {name}: TIMEOUT", file=sys.stderr)
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    print(f"# stage {name}: failed rc={proc.returncode}: {proc.stderr[-300:]}", file=sys.stderr)
    return None


def main():
    extract = run_stage("extract")
    rdm = run_stage("rdm")
    boot = run_stage("bootstrap")
    select = run_stage("selection_device")
    pallas = run_stage("rdm_pallas")

    extras = {}
    ips = extract["images_per_sec"] if extract else float("nan")
    extras["extract_images_per_sec_per_chip"] = round(ips, 1) if extract else None
    extras["rdm_10kx10k_ms"] = round(rdm["rdm_ms"], 1) if rdm else None
    bps = boot["bootstraps_per_sec"] if boot else float("nan")
    extras["rsa_bootstraps_per_sec"] = round(bps, 1) if boot else None
    t_sel = select["selection_s"] if select else float("nan")
    extras["layer_selection_s_per_subject"] = round(t_sel, 3) if select else None
    if pallas:
        extras["rdm_pallas_bf16_ms"] = round(pallas["rdm_pallas_bf16_ms"], 1)
        extras["rdm_pallas_f32_ms"] = round(pallas["rdm_pallas_f32_ms"], 1)

    n_stimuli, n_pairs, n_boot = 73000, 48, 1000
    e2e = (
        n_stimuli / ips            # one SRP extraction pass over all stimuli
        + n_pairs * t_sel          # phase-1 selection per (region, subject)
        + 5 * 1000 / ips           # exact re-extraction, ~5 unique layers
        + n_pairs * n_boot / bps   # phase-2 bootstrap CIs
    )

    ok = e2e == e2e  # NaN check
    out = {
        "metric": "nsd_e2e_73k_extract_plus_8subj_bootstrap_rsa",
        "value": round(e2e, 2) if ok else -1,
        "unit": "s",
        "vs_baseline": round(300.0 / e2e, 3) if ok and e2e > 0 else 0.0,
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
