"""visreps_tpu — a TPU-native rebuild of the visreps framework.

Re-implements the full capability surface of yashsmehta/visreps
(training CNNs on coarsened ImageNet labels; RSA + encoding-score
brain/behavior alignment against NSD, NSD-Synthetic, TVSD and THINGS;
SQLite results store; sweep runners; plotting) as an idiomatic
JAX/XLA/Pallas framework designed for TPU meshes.

Design principles (vs the PyTorch reference):
  * All analysis math (RDMs, rank correlations, Kendall tau-a,
    bootstrap resampling, multi-alpha ridge CV) runs ON DEVICE as
    jit/vmap-able jnp or Pallas kernels — the reference loops scipy
    on CPU (reference: visreps/analysis/rsa.py:96-129,
    visreps/evals.py:355-373).
  * Feature extraction taps are explicit module outputs, not forward
    hooks (reference: visreps/models/utils.py:33-260).
  * Random projection is a seeded, regenerable on-device transform,
    not a cached scipy sparse matrix (reference:
    visreps/analysis/sparse_random_projection.py).
  * Scale-out is a jax.sharding.Mesh (data / model / stimulus axes),
    not SLURM-only process fan-out (reference: scripts/slurm/).
"""

__version__ = "0.1.0"
