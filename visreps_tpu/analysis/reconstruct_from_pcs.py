"""Low-rank PCA reconstruction control (API-parity re-export).

Reference: visreps/analysis/reconstruct_from_pcs.py.
"""
from visreps_tpu.ops.pca import reconstruct_from_pcs

__all__ = ["reconstruct_from_pcs"]
