"""Pallas TPU kernel: fused correlation-RDM construction.

Computes rdm = 1 − clip(corr(x_i, x_j)) for all row pairs with the
Gram product tiled onto the MXU and the epilogue (clamp to [−1, 1],
unit diagonal → zero dissimilarity) fused into the output tile — the
(n, n) matrix is written to HBM exactly once, already in RDM form.
Rows are centered and variance-normalized BEFORE the kernel (folding
1/(std·√d) into the rows keeps the kernel free of 1-D operands, whose
Mosaic layouts clash with XLA's). Optionally takes bf16 rows (2× MXU
throughput) with f32 accumulation.

Semantics match ops.rdm.compute_rdm (reference:
visreps/analysis/rsa.py:59-93) up to the epsilon in the denominator
(std_i·std_j + eps vs exact normalization — negligible for
non-degenerate rows; the zero-variance guard is preserved).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from visreps_tpu.ops.stats import rankdata_dense


def _rdm_kernel(xi_ref, xj_ref, out_ref, acc_ref):
    """Grid (i, j, k): accumulate xi·xjᵀ over k, epilogue on last k."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        xi_ref[:], xj_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        corr = jnp.clip(acc_ref[:], -1.0, 1.0)
        bm, bn = out_ref.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0) + i * bm
        cols = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1) + j * bn
        corr = jnp.where(rows == cols, 1.0, corr)
        out_ref[:] = 1.0 - corr


def _pad_to(x, m, axis):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@partial(jax.jit, static_argnames=("correlation", "block_n", "block_k", "bf16", "interpret"))
def compute_rdm_pallas(
    representations: jnp.ndarray,
    correlation: str = "pearson",
    correction: float = 1e-12,
    block_n: int = 256,
    block_k: int = 512,
    bf16: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """(n, d) → (n, n) RDM via the fused Pallas kernel."""
    x = representations.astype(jnp.float32)
    if correlation.lower() == "spearman":
        x = rankdata_dense(x, axis=1)
    elif correlation.lower() != "pearson":
        raise ValueError("correlation must be 'Pearson' or 'Spearman'")

    n, d = x.shape
    x = x - x.mean(axis=1, keepdims=True)
    std = jnp.sqrt(jnp.mean(x * x, axis=1) + correction)
    std = jnp.where(std < correction * 10, 1.0, std)  # zero-variance guard
    # Fold normalization into the rows: xi·xjᵀ then IS the correlation.
    x = x / (std[:, None] * jnp.sqrt(jnp.float32(d)))

    xp = _pad_to(_pad_to(x, block_n, 0), block_k, 1)
    np_, dp = xp.shape
    if bf16:
        xp = xp.astype(jnp.bfloat16)

    grid = (np_ // block_n, np_ // block_n, dp // block_k)
    out = pl.pallas_call(
        _rdm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_n, block_k), lambda i, j, k: (j, k)),
        ],
        out_specs=pl.BlockSpec((block_n, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((np_, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_n, block_n), jnp.float32)],
        interpret=interpret,
    )(xp, xp)
    return out[:n, :n]
