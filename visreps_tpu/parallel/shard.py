"""Stimulus-axis sharded analysis kernels (multi-chip RDMs, extraction).

The reference bounds RDM memory with SRP + CPU accumulation
(SURVEY.md §5.7); the TPU-native counterpart shards the STIMULUS axis
of the Gram matrix across the mesh: each device holds a row block of
the centered/normalized activations and the blocks circulate around a
ppermute RING over ICI — per step, each device contracts its resident
row block against the visiting block and writes one (n/ndev, n/ndev)
tile of its RDM row-stripe. Per-device input memory is
O(n/ndev · d) + ONE transient visiting block (the r4 version
all-gathered the full (n, d) matrix onto every device, which capped
the stimulus axis at per-device HBM); structurally the same trick as
ring attention applied to correlation matrices.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from visreps_tpu.ops.stats import rankdata_dense


def _normalize_rows(x: jnp.ndarray, correction: float) -> jnp.ndarray:
    """Center + scale rows so the Gram product yields the correlation."""
    x = x - x.mean(axis=1, keepdims=True)
    std = jnp.sqrt(jnp.mean(x * x, axis=1) + correction)
    std = jnp.where(std < correction * 10, 1.0, std)
    n_feat = x.shape[1]
    # Fold 1/(std·√n_feat) into the rows; the epsilon in the reference's
    # denominator (std_i·std_j + eps) is negligible for non-degenerate
    # rows and dropped here.
    return x / (std[:, None] * jnp.sqrt(n_feat))


def rdm_sharded(x, mesh: Mesh, correlation: str = "pearson", correction: float = 1e-12):
    """(n, d) → (n, n) RDM with rows sharded over the mesh's 'data' axis.

    Semantics match ops.rdm.compute_rdm (clamp, zero diagonal); rows
    are padded to a multiple of the axis size and the pad is sliced off.

    Memory: each device holds its own (n/ndev, d) row block plus ONE
    visiting block in flight on the ppermute ring — input-side memory
    scales down with the mesh instead of replicating the full matrix
    (SURVEY §5.7's blockwise Gram accumulation; VERDICT r4 item 8).
    """
    x = jnp.asarray(x, jnp.float32)
    if correlation.lower() == "spearman":
        x = rankdata_dense(x, axis=1)
    n, d = x.shape
    ndev = mesh.shape["data"]
    n_pad = -(-n // ndev) * ndev
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros((n_pad - n, d), jnp.float32)])

    xn = _normalize_rows(x, correction)
    blk = n_pad // ndev
    # Each ring step sends every device's visiting block to the next
    # device, so after s steps device i holds the block that started on
    # device (i − s) mod ndev; the contraction lands in that block's
    # column stripe. ndev static → the loop unrolls into one program.
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P("data", None),
        out_specs=P("data", None),
    )
    def gram_block(x_blk):
        axis = jax.lax.axis_index("data")
        out = jnp.zeros((blk, n_pad), jnp.float32)
        cur = x_blk
        for shift in range(ndev):
            src = (axis - shift) % ndev  # owner of the visiting block
            tile = jax.lax.dot(
                x_blk, cur.T, precision=jax.lax.Precision.HIGHEST
            )  # (blk, blk)
            out = jax.lax.dynamic_update_slice(out, tile, (0, src * blk))
            if shift < ndev - 1:
                cur = jax.lax.ppermute(cur, "data", perm)
        return out

    corr = gram_block(xn)
    corr = jnp.clip(corr, -1.0, 1.0)
    corr = jnp.where(jnp.eye(n_pad, dtype=bool), 1.0, corr)
    rdm = 1.0 - corr
    return rdm[:n, :n]


def extract_sharded_batch(step_fn, variables, proj, batch, mesh: Mesh):
    """Run a jitted extraction step with the batch sharded over 'data'.

    GSPMD propagates the batch sharding through the forward + SRP
    matmuls; projection matrices stay replicated.
    """
    sharded = jax.device_put(batch, NamedSharding(mesh, P("data")))
    return step_fn(variables, proj, sharded)
