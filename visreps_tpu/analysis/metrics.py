"""Metric library (API-parity re-export of ops.metrics).

Reference: visreps/analysis/metrics/{_corrcoef,_r2_score,_cka}.py.
"""
from visreps_tpu.ops.metrics import cka, covariance, hsic, pearson_r, r2_score, spearman_r

__all__ = ["pearson_r", "spearman_r", "covariance", "r2_score", "cka", "hsic"]
