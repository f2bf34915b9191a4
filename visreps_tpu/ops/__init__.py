from visreps_tpu.ops.stats import (
    rankdata_average,
    rankdata_dense,
    pearson_corr,
    spearman_corr,
    kendall_tau_a,
)
from visreps_tpu.ops.rdm import compute_rdm, compute_rdm_correlation, upper_triangle
from visreps_tpu.ops.bootstrap import bootstrap_rdm_correlation, bootstrap_indices
from visreps_tpu.ops.ridge import ridge_cv, RidgeCVResult
from visreps_tpu.ops.srp import SRPTransform, srht_project
from visreps_tpu.ops.pca import PCATransform, fit_pca, reconstruct_from_pcs
from visreps_tpu.ops.metrics import pearson_r, spearman_r, covariance, r2_score, cka, hsic
from visreps_tpu.ops.znorm import znorm, znorm_fit

__all__ = [
    "rankdata_average",
    "rankdata_dense",
    "pearson_corr",
    "spearman_corr",
    "kendall_tau_a",
    "compute_rdm",
    "compute_rdm_correlation",
    "upper_triangle",
    "bootstrap_rdm_correlation",
    "bootstrap_indices",
    "ridge_cv",
    "RidgeCVResult",
    "SRPTransform",
    "srht_project",
    "PCATransform",
    "fit_pca",
    "reconstruct_from_pcs",
    "pearson_r",
    "spearman_r",
    "covariance",
    "r2_score",
    "cka",
    "hsic",
    "znorm",
    "znorm_fit",
]
