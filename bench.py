"""Benchmark: the BASELINE.json north-star workload on one TPU chip.

Workload (AlexNet flagship eval path):
  1. 14-tap feature extraction + fused SRP (images/sec/chip)
  2. RDM construction (10k x 10k Pearson from 4096 features, ms)
  3. RSA bootstrap throughput (1000 iters x 90% of a 1000-RDM, Spearman)
  4. Layer-selection phase (14-tap vmapped RDM + Spearman scoring)

Prints ONE JSON line:
  {"metric": ..., "value": <projected e2e seconds for 73k-image NSD
   8-subject bootstrap RSA>, "unit": "s", "vs_baseline": 300/value}
(vs_baseline > 1 beats the driver's < 5 min target on v5e-8; this runs
on a single chip.)

Batches are PRNG-generated on device: the bench measures the TPU
compute pipeline (forward + SRP + analysis kernels), not host JPEG
decode.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_extraction(batch_size=128, n_batches=8):
    from visreps_tpu.models.extractor import FeatureExtractor
    from visreps_tpu.models.zoo import init_model

    state = init_model("AlexNet", 1000, seed=0)
    ex = FeatureExtractor(
        state,
        ["conv1", "conv2", "conv3", "conv4", "conv5", "fc1", "fc2"],
        extract_pre_and_post=True,
        srp_k=4096,
        batch_size=batch_size,
    )
    proj = ex._proj_dict()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch_size, 224, 224, 3), jnp.float32)

    def step(v, p, xx):
        return ex._srp_step(v, p, xx)

    t = _timeit(step, state.variables, proj, x, warmup=2, iters=n_batches)
    ips = batch_size / t
    return ips, ex, state, proj


def bench_rdm(n=10000, d=4096):
    from visreps_tpu.ops.rdm import compute_rdm

    x = jax.random.normal(jax.random.PRNGKey(1), (n, d), jnp.float32)
    t = _timeit(compute_rdm, x, warmup=1, iters=2)
    return t * 1000.0  # ms


def bench_bootstrap(n=1000, n_bootstrap=1000):
    from visreps_tpu.ops.bootstrap import bootstrap_indices, _bootstrap_scores
    from visreps_tpu.ops.rdm import compute_rdm

    key = jax.random.PRNGKey(2)
    a = jax.random.normal(key, (n, 512), jnp.float32)
    b = a + 0.5 * jax.random.normal(jax.random.PRNGKey(3), (n, 512), jnp.float32)
    rdm_a = compute_rdm(a)
    rdm_b = compute_rdm(b)
    idx = jnp.asarray(bootstrap_indices(n, n_bootstrap))

    def run(r1, r2, ix):
        return _bootstrap_scores(r1, r2, ix, "spearman", 16)

    t = _timeit(run, rdm_a, rdm_b, idx, warmup=1, iters=2)
    return n_bootstrap / t  # bootstraps/sec


def bench_layer_selection(n_sel=1000, k=4096, n_taps=14):
    """Phase-1 cost per (region, subject): 14 RDMs + Spearman scoring."""
    from visreps_tpu.analysis.rsa import select_best_layer

    rng = np.random.RandomState(0)
    acts = {f"tap{i}": rng.randn(n_sel, k).astype(np.float32) for i in range(n_taps)}
    neural = rng.randn(n_sel, 512).astype(np.float32)

    def run():
        return select_best_layer(acts, neural, "spearman")

    run()  # warmup/compile
    t0 = time.perf_counter()
    run()
    return time.perf_counter() - t0


def main():
    ips, ex, state, proj = bench_extraction()
    rdm_ms = bench_rdm()
    boots_per_sec = bench_bootstrap()
    t_select = bench_layer_selection()

    # Projected end-to-end NSD flagship eval (73k stimuli, 8 subjects x
    # 6 regions, two-phase RSA with 1000-iter bootstrap):
    n_stimuli, n_pairs, n_boot = 73000, 48, 1000
    t_extract = n_stimuli / ips
    t_phase1 = n_pairs * t_select
    t_reextract = 5 * 1000 / ips  # ~5 unique best layers x 1000 test stimuli
    t_boot = n_pairs * n_boot / boots_per_sec
    e2e = t_extract + t_phase1 + t_reextract + t_boot

    out = {
        "metric": "nsd_e2e_73k_extract_plus_8subj_bootstrap_rsa",
        "value": round(e2e, 2),
        "unit": "s",
        "vs_baseline": round(300.0 / e2e, 3),
        "extract_images_per_sec_per_chip": round(ips, 1),
        "rdm_10kx10k_ms": round(rdm_ms, 1),
        "rsa_bootstraps_per_sec": round(boots_per_sec, 1),
        "layer_selection_s_per_subject": round(t_select, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
